package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Semantics and plan shape of the curation-report rows added in round
  * 10: leakage-safe group split, shingle containment, the funnel
  * report, and the cross-source duplication matrix.
  */
class CurationOpsSpec extends SparkSpec {

  private def tmpTables(write: String => Unit): String = {
    val dir = Files.createTempDirectory("graft_curation").toFile.getAbsolutePath
    write(dir)
    dir
  }

  // Ten docs: 1/2/3 verbatim twins (one near-dup group), 4/5 twins,
  // 6..10 unique. Enough shingles that twins share all band buckets.
  private lazy val corpus = {
    import spark.implicits._
    val twin = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    val twin2 = "one two three four five six seven eight nine ten " * 3
    val uniq = (6 to 10).map(i =>
      (i.toLong, s"unique$i " + (1 to 25).map(j => s"w${i}_$j").mkString(" "), "en", s"src${i % 3}"))
    val rows = Seq(
      (1L, twin, "en", "src0"), (2L, twin, "en", "src1"), (3L, twin, "en", "src1"),
      (4L, twin2, "de", "src2"), (5L, twin2, "de", "src0")) ++ uniq
    tmpTables(d => rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.parquet(s"$d/documents.parquet"))
  }

  test("group split: every member of a near-dup group lands in the same fold") {
    val rows = SparkEntry.queries("llm_group_split")(spark, corpus).collect()
    val byId = rows.map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(byId(1L)._1 === byId(2L)._1 && byId(2L)._1 === byId(3L)._1,
      "twins 1/2/3 must share a group")
    assert(byId(1L)._2 === byId(2L)._2 && byId(2L)._2 === byId(3L)._2,
      "twins 1/2/3 must share a fold")
    assert(byId(4L)._2 === byId(5L)._2, "twins 4/5 must share a fold")
    assert(rows.length === 10, "every doc gets exactly one fold row")
    assert(rows.map(_.getString(2)).toSet.subsetOf(Set("train", "val", "test")))
  }

  test("containment: verbatim twins score 1.0 both ways and flag contained") {
    val rows = SparkEntry.queries("llm_containment")(spark, corpus).collect()
    val twinRow = rows.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(twinRow.isDefined, "twin pair (1,2) must be a candidate")
    val t = twinRow.get
    assert(t.getDouble(2) === 1.0 && t.getDouble(3) === 1.0 && t.getBoolean(4))
  }

  test("containment: a subset document scores 1.0 on its own side only") {
    import spark.implicits._
    // doc 2 is a strict prefix of doc 1 — Jaccard < 1 but containment_b = 1.
    val big = (1 to 40).map(i => s"tok$i").mkString(" ")
    val small = (1 to 20).map(i => s"tok$i").mkString(" ")
    val dir = tmpTables(d => Seq(
      (1L, big, "en", "s0"), (2L, small, "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.parquet(s"$d/documents.parquet"))
    val rows = SparkEntry.queries("llm_containment")(spark, dir).collect()
    // The pair is only a candidate if a band collides (min over a subset
    // can differ); if it does, the asymmetry must be exact.
    rows.filter(r => r.getLong(0) == 1L && r.getLong(1) == 2L).foreach { r =>
      assert(r.getDouble(3) === 1.0, "subset side containment must be 1.0")
      assert(r.getDouble(2) < 1.0, "superset side must be < 1.0")
      assert(r.getBoolean(4))
    }
  }

  test("curation funnel: stages are cumulative and match the pipeline row") {
    val f = SparkEntry.queries("llm_curation_funnel")(spark, corpus).collect()
    assert(f.map(_.getInt(0)).toSeq === Seq(0, 1, 2, 3))
    val nDocs = f.map(_.getLong(2))
    val toks = f.map(_.getLong(3))
    assert(nDocs.sliding(2).forall(w => w(0) >= w(1)), "doc counts must be monotone")
    assert(toks.sliding(2).forall(w => w(0) >= w(1)), "token counts must be monotone")
    // Stage 3 survivors == llm_curation_pipeline's output rows.
    val pipeline = SparkEntry.queries("llm_curation_pipeline")(spark, corpus).count()
    assert(nDocs(3) === pipeline, "funnel tail must equal the pipeline row count")
  }

  test("source overlap: twin pairs land in the ordered source cells") {
    val rows = SparkEntry.queries("llm_source_overlap")(spark, corpus).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // docs 1(src0) ~ 2,3(src1) → (src0,src1) twice; 2~3 both src1 → (src1,src1)
    assert(rows.getOrElse(("src0", "src1"), 0L) >= 2L)
    assert(rows.getOrElse(("src1", "src1"), 0L) >= 1L)
    // ordering invariant: no cell with x > y
    assert(rows.keys.forall { case (x, y) => x <= y })
  }

  test("shingle novelty: first owner scores 1.0, a later verbatim twin 0.0") {
    val rows = SparkEntry.queries("llm_shingle_novelty")(spark, corpus).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(rows(1L) === 1.0, "doc 1 is the first owner of all its shingles")
    assert(rows(2L) === 0.0 && rows(3L) === 0.0,
      "verbatim twins of an earlier doc add nothing")
    assert(rows(6L) === 1.0, "unique doc is all-novel")
  }

  test("rolling median: a single spike moves the mean but not the median") {
    import spark.implicits._
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = (1 to 30).map { i =>
      (7L, i.toLong, new java.sql.Timestamp(ts0.getTime + i * 60000L),
        if (i == 25) 1e6 else 10.0, "click")
    }
    val dir = tmpTables(d => rows.toDF("user_id", "event_id", "ts", "value", "event_type")
      .write.parquet(s"$d/events.parquet"))
    val out = SparkEntry.queries("ts8_rolling_median")(spark, dir).collect()
      .map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(out(24L) === 10.0 && out(26L) === 10.0 && out(30L) === 10.0,
      "median must ignore the lone spike")
    assert(out(25L) === 10.0, "spike row's own frame median is still 10")
  }

  test("plan shape: funnel aggregates the corpus once; split has no cartesian") {
    Seq("llm_curation_funnel", "llm_group_split", "llm_source_overlap").foreach { q =>
      val plan = SparkEntry.queries(q)(spark, corpus).queryExecution.executedPlan
      val cartesian = plan.collect {
        case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
        case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
      }
      assert(cartesian.isEmpty, s"$q must not plan a cartesian/nested-loop join")
    }
  }
}
