package graft

import org.apache.spark.sql.functions._

/** Property tests for the round-7 pipeline operators on constructed
  * corpora — the fixture tables never exercise these edges:
  *
  *  - `llm_mixture_sample`'s SATURATED branch (a source whose √share
  *    budget exceeds its own tokens must keep everything through the
  *    explicit th = 65536 short-circuit — the %04x hex compare would
  *    be wrong there) and the budget adherence of the non-saturated
  *    keep rate;
  *  - `llm_line_dedup`'s segmentation→reassembly round trip (identity
  *    when nothing repeats; exact boilerplate excision when a shared
  *    prefix crosses the corpus-frequency threshold).
  */
class PipelineOpsSpec extends SparkSpec {

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pipeops").toString
    rows.toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("mixture sampling keeps ALL docs of a saturated source and ~budget share of a huge one") {
    val tiny = (0L until 2L).map(i => (i, "tiny", "a b c d e"))
    val huge = (100L until 300L).map(i =>
      (i, "huge", (0 until 50).map(j => s"w${i}_$j").mkString(" ")))
    val dir = writeDocs(tiny ++ huge)
    val out = SparkEntry.queries("llm_mixture_sample")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))

    // tiny: tok=10, total=10010, budget=4004, w=(3,100), sumw=103 →
    // budget_tiny=116 ≥ 10 tokens → saturated, everything kept.
    val tinyKept = out.filter(_._2 == "tiny")
    assert(tinyKept.length === 2, "saturated source must keep every doc")
    assert(tinyKept.forall(_._3 === 65536L), "saturated threshold must be 65536")

    // huge: budget_huge=3887 of 10000 tokens → th=25473/65536 ≈ 0.389.
    val hugeKept = out.count(_._2 == "huge")
    val thHuge = out.filter(_._2 == "huge").map(_._3).distinct
    assert(thHuge === Array(3887L * 65536L / 10000L),
      "non-saturated threshold must follow the exact integer rate derivation")
    assert(hugeKept > 50 && hugeKept < 110,
      s"keep count $hugeKept must track the ~38.9% budget share of 200 docs")
  }

  test("k-anonymity ladder generalizes to the corpus level when even the lang group is < k") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pipeops").toString
    val rows = (0L until 20L).map(i => (i, "en", "s1")) ++      // n1 = 20 ≥ 8: level 0
      (20L until 25L).map(i => (i, "de", s"s${i - 19}")) ++      // n1 = 1, n2 = 5: level 2
      Seq((25L, "fr", "s9"))                                     // n1 = n2 = 1: level 2
    rows.toDF("doc_id", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("llm_k_anonymity")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    for ((id, al, as_, kg) <- out)
      if (id < 20) assert((al, as_, kg) === ("en", "s1", 20L))
      else assert((al, as_, kg) === ("*", "*", 26L),
        s"doc $id must fall through both ladder levels to the corpus group")
  }

  test("line dedup is the identity on a repeat-free corpus and excises shared boilerplate exactly") {
    // 10-word boilerplate prefix shared by 5 docs (+ unique 10-word
    // tails), plus 20 repeat-free docs.
    val banner = (0 until 10).map(i => s"cookie$i").mkString(" ")
    val withBanner = (0L until 5L).map { i =>
      val tail = (0 until 10).map(j => s"tail${i}_$j").mkString(" ")
      (i, "s", s"$banner $tail")
    }
    val unique = (10L until 30L).map(i =>
      (i, "s", (0 until 25).map(j => s"u${i}_$j").mkString(" ")))
    val dir = writeDocs(withBanner ++ unique)
    val out = SparkEntry.queries("llm_line_dedup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq

    val byId = out.map(t => t._1 -> t).toMap
    // Repeat-free docs come back byte-identical, nothing dropped —
    // the ordered reassembly is an exact round trip.
    for ((id, _, text) <- unique) {
      assert(byId(id)._2 === text, s"doc $id must reassemble to its original text")
      assert(byId(id)._3 === 0L)
    }
    // Banner docs lose EXACTLY the shared first segment (freq 5 > 2)
    // and keep their unique tail.
    for ((id, _, text) <- withBanner) {
      assert(byId(id)._2 === text.split(" ").drop(10).mkString(" "),
        s"doc $id must keep only its unique tail")
      assert(byId(id)._3 === 1L, "exactly one boilerplate segment dropped")
    }
  }

  test("substr spans recover the exact bounds of a cross-doc repeated run and merge one island") {
    // A 12-word run shared by docs 0 and 1 at different offsets. With
    // k=8, the in-run gram starts are exactly [blockStart, blockStart+4]
    // and the merged island must be the block itself — boundary grams
    // straddling unique context must not extend it.
    val shared = (0 until 12).map(i => s"dup$i").mkString(" ")
    val docA = (0 until 5).map(i => s"a$i").mkString(" ") + " " + shared +
      " " + (0 until 7).map(i => s"za$i").mkString(" ")
    val docB = shared + " " + (0 until 9).map(i => s"zb$i").mkString(" ")
    val unique = (2L until 10L).map(i =>
      (i, "s", (0 until 30).map(j => s"u${i}_$j").mkString(" ")))
    val dir = writeDocs(Seq((0L, "s", docA), (1L, "s", docB),
      (10L, "s", "too short doc")) ++ unique)
    val out = SparkEntry.queries("llm_substr_spans")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq((0L, 6L, 17L, 5L), (1L, 1L, 12L, 5L)),
      "spans must cover exactly the shared 12-word block in both docs")
  }

  test("substr spans split repeats separated by more than k words into distinct islands") {
    val run1 = (0 until 8).map(i => s"r$i").mkString(" ")
    val run2 = (0 until 8).map(i => s"q$i").mkString(" ")
    val gapA = (0 until 12).map(i => s"ga$i").mkString(" ")
    val gapB = (0 until 15).map(i => s"gb$i").mkString(" ")
    val dir = writeDocs(Seq(
      (0L, "s", s"$run1 $gapA $run2"),
      (1L, "s", s"$run1 $gapB $run2")))
    val out = SparkEntry.queries("llm_substr_spans")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq((0L, 1L, 8L, 1L), (0L, 21L, 28L, 1L),
      (1L, 1L, 8L, 1L), (1L, 24L, 31L, 1L)),
      "each repeated run must form its own island across the unshared gap")
  }

  test("bm25 retrieves the unique corpus doc holding a query's rare term, and only it") {
    val q = (0L, "s", "zebra zebra zebra")
    val hit = (10L, "s", "zebra " + (0 until 20).map(i => s"f$i").mkString(" "))
    val misses = (11L until 30L).map(i =>
      (i, "s", (0 until 21).map(j => s"m${i}_$j").mkString(" ")))
    val dir = writeDocs(Seq(q, hit) ++ misses)
    val out = SparkEntry.queries("llm_bm25_topk")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(out.length === 1, "only the zebra doc shares a term with the query")
    val (qid, rank, docId, score) = out.head
    assert((qid, rank, docId) === (0L, 1, 10L))
    assert(score > 0.0, "a matched rare term must contribute positive BM25 mass")
  }

  test("rep signals flag a degenerate looped doc and pass a diverse one; top gram ties break lexicographically") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pipeops").toString
    val loop = (0 until 20).map(_ => "spam ham").mkString(" ")  // "spam ham" x20
    val fresh = (0 until 40).map(i => s"u$i").mkString(" ")
    // two words: both 2-grams ("a b", "b a") tie at 1 — lex smaller wins
    val rows = Seq((0L, loop), (1L, fresh), (2L, "b a b"))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("llm_rep_signals")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getString(2), r.getDouble(3), r.getDouble(4), r.getBoolean(5))).toMap
    assert(!out(0L)._5, "a 2-word loop must fail the keep rule")
    assert(out(0L)._1 > 0.9, "38/40 word occurrences in the loop are repeats")
    assert(out(0L)._4 > 0.9, "every 5-gram in the loop repeats")
    assert(out(1L)._5, "an all-distinct doc must pass")
    assert(out(1L)._1 === 0.0 && out(1L)._4 === 0.0)
    assert(out(2L)._2 === "a b", "tied top grams must break to the lexicographically smallest")
  }

  test("rrf fusion: any item ranked by BOTH retrievers outranks every single-retriever item") {
    // With k=5 lists, min dual score 2/(60+5) > max single score 1/(60+1):
    // the fused ordering must therefore place all dual-listed items first.
    val dir = "/root/testdata/sf0.001"
    val bm = SparkEntry.queries("llm_bm25_topk")(spark, dir)
      .filter(col("query_id") < 8)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val cs = SparkEntry.queries("llm_cosine_topk")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val fused = SparkEntry.queries("llm_hybrid_rrf")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(fused.nonEmpty)
    for ((q, rank, item) <- fused) {
      assert(bm((q, item)) || cs((q, item)),
        "fused items must come from the union of the two top-k lists")
      if (bm((q, item)) && cs((q, item)))
        for ((q2, r2, i2) <- fused if q2 == q && r2 < rank)
          assert(bm((q2, i2)) && cs((q2, i2)),
            s"dual-listed ($q,$item) at rank $rank must not trail single-listed ($q2,$i2)")
    }
  }

  test("indexed bm25 returns exactly the index-free path's rankings and scores") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-bm25root").toString
    spark.conf.set("spark.graft.bm25Root", tmp)
    try {
      val dir = "/root/testdata/sf0.001"
      val free = SparkEntry.queries("llm_bm25_topk")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      val idx = SparkEntry.queries("llm_bm25_indexed")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      assert(free.nonEmpty, "fixture corpus must produce retrievals")
      assert(idx.toSeq === free.toSeq,
        "the persisted-postings path must reproduce the index-free BM25 exactly")
    } finally spark.conf.unset("spark.graft.bm25Root")
  }

  test("bm25 incremental add rewrites only touched wb partitions; replay is a no-op") {
    import spark.implicits._
    import graft.llm.CorpusOps.Bm25Index
    val root = java.nio.file.Files.createTempDirectory("graft-bm25delta").toString + "/idx"
    val base = Seq((10L, "alpha beta gamma"), (11L, "beta delta")).toDF("doc_id", "text")
    Bm25Index.buildInto(spark, base, root)

    def partFiles(sub: String): Map[String, Seq[(String, Long)]] = {
      val d = new java.io.File(s"$root/$sub")
      d.listFiles().filter(f => f.isDirectory && f.getName.startsWith("wb="))
        .map(p => p.getName -> p.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getName, f.lastModified())).toSeq.sortBy(_._1)).toMap
    }
    val before = partFiles("postings")
    Thread.sleep(1100) // mtime granularity

    // 'epsilon' shares no wb bucket with... well, it may; assert on the
    // UNION of the batch's buckets instead of a hand-picked word.
    val batch = Seq((12L, "beta epsilon")).toDF("doc_id", "text")
    Bm25Index.addDocuments(spark, batch, root)
    val after = partFiles("postings")
    val touched = Seq("beta", "epsilon")
      .map(w => "wb=" + java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8")).take(1).map("%02x".format(_)).mkString).toSet
    after.foreach { case (p, files) =>
      if (!touched(p))
        assert(files === before(p), s"untouched partition $p must keep its files byte-identical")
    }
    // the merged index answers from both generations
    val df = spark.read.parquet(s"$root/df").collect()
      .map(r => r.getAs[String]("word") -> r.getAs[Long]("dfreq")).toMap
    assert(df("beta") === 3L, "df of a word in old AND new docs counts both")
    assert(df("epsilon") === 1L && df("alpha") === 1L)
    val stats = spark.read.parquet(Bm25Index.statsPath(spark, root)).head()
    assert(stats.getAs[Long]("n_docs") === 3L)

    // replay: already-indexed docs are filtered out -> byte-stable index
    val snap = partFiles("postings")
    Bm25Index.addDocuments(spark, batch, root)
    assert(partFiles("postings") === snap, "replaying the same batch must not rewrite anything")
    assert(spark.read.parquet(Bm25Index.statsPath(spark, root)).head().getAs[Long]("n_docs") === 3L)
  }

  test("dsir weights rank target-distribution content above off-target regardless of its label") {
    import spark.implicits._
    val vocabA = (0 until 30).map(i => s"en$i")
    val vocabB = (0 until 30).map(i => s"xx$i")
    def textOf(v: Seq[String], seed: Int): String =
      (0 until 20).map(i => v((seed * 7 + i * 3) % v.size)).mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graft-pipeops").toString
    val rows = (0L until 10L).map(i => (i, "en", textOf(vocabA, i.toInt))) ++
      (10L until 20L).map(i => (i, "zh", textOf(vocabB, i.toInt))) ++
      Seq((20L, "zh", textOf(vocabA, 20)))   // target-like content, off-target label
    rows.toDF("doc_id", "lang", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val w = SparkEntry.queries("llm_dsir_weights")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val pureTarget = (0L until 10L).map(w)
    val offTarget = (10L until 20L).map(w)
    assert(pureTarget.min > offTarget.max,
      "every target-vocab doc must outweigh every off-target-vocab doc")
    assert(w(20L) > offTarget.max,
      "importance weighting must follow CONTENT: the mislabeled doc scores like the target")
  }
}
