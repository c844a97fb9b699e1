package graft

import org.apache.spark.sql.functions._

import graft.engine.DagRunner
import graft.llm.{CorpusOps, SimilarityOps}
import graft.sources.Artifacts

/** The generation-dir + pointer-file publish discipline for persisted
  * index artifacts (VERDICT r8 ask #2) and the crash-replay repair of
  * incremental index maintenance (ADVICE r8 #1): a publish writes a NEW
  * generation dir and atomically flips a pointer file, so a crash
  * anywhere before the flip leaves the previous complete artifact live;
  * and a crash BETWEEN an index's corpus merge and its derived-table
  * republish is repaired by replaying the batch, because the derived
  * tables are re-computed from the batch's touched set — not from the
  * (now empty) set of unseen rows.
  */
class GenerationPublishSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString

  private def writeNums(dir: String, v: Long): Unit =
    Seq(v).toDF("v").coalesce(1).write.mode("overwrite").parquet(dir)

  test("publishGeneration: monotonic generations, pointer flip, prune keeps current+prev") {
    val root = tmpDir("genpub")
    Artifacts.publishGeneration(spark, root, "t")(writeNums(_, 1L))
    val g1 = Artifacts.generationPath(spark, root, "t")
    assert(g1.endsWith("t-g000001"))
    assert(spark.read.parquet(g1).head().getLong(0) === 1L)
    Artifacts.publishGeneration(spark, root, "t")(writeNums(_, 2L))
    Artifacts.publishGeneration(spark, root, "t")(writeNums(_, 3L))
    val g3 = Artifacts.generationPath(spark, root, "t")
    assert(g3.endsWith("t-g000003"))
    assert(spark.read.parquet(g3).head().getLong(0) === 3L)
    val dirs = new java.io.File(root).listFiles().map(_.getName).filter(_.startsWith("t-g")).sorted
    assert(dirs.toSeq === Seq("t-g000002", "t-g000003"),
      "prune must keep the live generation plus its predecessor (in-flight readers) only")
  }

  test("a crash between generation write and pointer flip leaves the live artifact intact") {
    val root = tmpDir("gencrash")
    Artifacts.publishGeneration(spark, root, "t")(writeNums(_, 10L))
    // Simulate the crashed publish: the next generation dir is fully
    // written, but the process dies before the pointer flips.
    writeNums(s"$root/t-g000002", 99L)
    val live = Artifacts.generationPath(spark, root, "t")
    assert(live.endsWith("t-g000001"), "an unflipped generation must be invisible to readers")
    assert(spark.read.parquet(live).head().getLong(0) === 10L)
    // The next successful publish claims the same index and clobbers the
    // stale partial.
    Artifacts.publishGeneration(spark, root, "t")(writeNums(_, 11L))
    val after = Artifacts.generationPath(spark, root, "t")
    assert(after.endsWith("t-g000002"))
    assert(spark.read.parquet(after).head().getLong(0) === 11L)
  }

  test("legacy fixed-dir artifacts resolve until the first pointer publish replaces them") {
    val root = tmpDir("genlegacy")
    writeNums(s"$root/t", 7L) // pre-generation layout
    assert(Artifacts.generationPath(spark, root, "t") === s"$root/t")
    Artifacts.publishGeneration(spark, root, "t")(writeNums(_, 8L))
    val live = Artifacts.generationPath(spark, root, "t")
    assert(live.endsWith("t-g000001"))
    assert(spark.read.parquet(live).head().getLong(0) === 8L)
    // The legacy dir is the PREVIOUS generation of this publish: a
    // cross-process reader that resolved generationPath just before the
    // flip may still be scanning it, so it survives one more cycle —
    // the same keep-current-plus-previous rule as generation dirs
    // (ADVICE r9).
    assert(new java.io.File(s"$root/t").exists(),
      "first pointer publish must retain the legacy dir for in-flight readers")
    assert(spark.read.parquet(s"$root/t").head().getLong(0) === 7L)
    Artifacts.publishGeneration(spark, root, "t")(writeNums(_, 9L))
    assert(!new java.io.File(s"$root/t").exists(),
      "the second publish prunes the now two-generations-stale legacy dir")
    assert(new java.io.File(s"$root/t-g000001").exists(),
      "keep-current-plus-previous still holds for generation dirs")
  }

  // --- crash-replay repair of the incremental indexes (ADVICE r8 #1) ---

  private def emb(rows: (Long, Int, Seq[Float])*) =
    rows.toDF("vec_id", "label", "embedding")

  test("IVF: a crash after the corpus merge but before the centroid publish is repaired by replay") {
    val root = tmpDir("ivfcrash") + "/idx"
    val base = emb((0L, 0, Seq(1f, 0f)), (1L, 0, Seq(0.9f, 0.1f)), (2L, 1, Seq(0f, 1f)))
    val delta = emb((3L, 0, Seq(0.5f, 0.5f)), (4L, 2, Seq(-1f, 0f)))
    SimilarityOps.IvfIndex.buildInto(spark, base, root)
    // Crash simulation: the delta's corpus merge committed, centroids did
    // not. A replayed batch now has ZERO unseen vec_ids — the old code
    // returned early and left centroids stale forever.
    DagRunner.writeMerge(spark, delta, s"$root/corpus", Seq("vec_id"), "label")
    SimilarityOps.IvfIndex.addVectors(spark, delta, root)
    val got = spark.read.parquet(SimilarityOps.IvfIndex.centroidsPath(spark, root))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val refRoot = tmpDir("ivfref") + "/idx"
    SimilarityOps.IvfIndex.buildInto(spark, base.unionAll(delta), refRoot)
    val want = spark.read.parquet(SimilarityOps.IvfIndex.centroidsPath(spark, refRoot))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(got.keySet === want.keySet, "replaying the crashed batch must cover every cell")
    got.foreach { case (label, c) =>
      c.zip(want(label)).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-12,
          s"cell $label centroid drifted after crash-replay: $a vs $b")
      }
    }
  }

  test("BM25: a crash after the postings/doclens merges but before df/stats is repaired by replay") {
    val root = tmpDir("bm25crash") + "/idx"
    val base = Seq((10L, "alpha beta"), (11L, "beta gamma")).toDF("doc_id", "text")
    CorpusOps.Bm25Index.buildInto(spark, base, root)
    // Crash simulation: replicate addDocuments' postings + doclens merges
    // for a new batch, then "die" before the df recompute and stats
    // republish. The replayed batch has zero unseen doc_ids.
    val batch = Seq((12L, "beta delta")).toDF("doc_id", "text")
    val dw = batch
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val dlen = dw.groupBy("doc_id").agg(sum("tf").as("dl"))
    DagRunner.writeMerge(spark,
      dw.join(dlen, "doc_id")
        .select(col("doc_id"), col("word"), col("tf"), col("dl"))
        .withColumn("wb", expr("substring(md5(word), 1, 2)")),
      s"$root/postings", Seq("doc_id", "word"), "wb")
    DagRunner.writeMerge(spark,
      dlen.withColumn("db", expr("substring(md5(cast(doc_id as string)), 1, 2)")),
      s"$root/doclens", Seq("doc_id"), "db")
    val dfStale = spark.read.parquet(s"$root/df").collect()
      .map(r => r.getAs[String]("word") -> r.getAs[Long]("dfreq")).toMap
    assert(dfStale("beta") === 2L, "precondition: df really is stale after the simulated crash")
    CorpusOps.Bm25Index.addDocuments(spark, batch, root)
    val df = spark.read.parquet(s"$root/df").collect()
      .map(r => r.getAs[String]("word") -> r.getAs[Long]("dfreq")).toMap
    assert(df("beta") === 3L, "replay must re-derive dfreq for the batch's touched buckets")
    assert(df("delta") === 1L)
    val stats = spark.read.parquet(CorpusOps.Bm25Index.statsPath(spark, root)).head()
    assert(stats.getAs[Long]("n_docs") === 3L, "replay must republish stats")
  }
}
