package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.StreamingOps

/** End-to-end file-based streaming: readStream over the driver parquet
  * testdata → watermarked windowed aggregation → parquet sink with
  * checkpointing — the full readStream/writeStream loop a production
  * deployment runs, and recovery semantics via the checkpoint.
  */
class StreamingFileSpec extends SparkSpec {

  test("readStream parquet -> windowed agg -> parquet sink with checkpoint") {
    val dir = Files.createTempDirectory("graft_stream").toFile.getAbsolutePath
    val out = s"$dir/out"
    val ckpt = s"$dir/ckpt"

    // Batch copy of sf0.001 events (ts normalized by Tables.load) acts as
    // the landing zone a streaming job would watch.
    val landing = s"$dir/landing"
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select("ts", "event_type", "value")
    events.write.parquet(landing)

    val stream = spark.readStream.schema(
      events.schema).parquet(landing)
    val q = StreamingOps.windowedPlayCounts(stream, windowLen = "1 hour",
      watermark = "2 hours")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.read.parquet(out)
    // Append mode only emits windows the watermark has closed; the final
    // windows stay open, so compare against the batch run minus the tail
    // beyond the watermark frontier (max ts - 2h).
    val frontier = events.agg(max(col("ts"))).head().getTimestamp(0).getTime - 2 * 3600 * 1000
    val closed = StreamingOps.windowedPlayCounts(events, "1 hour", "2 hours")
      .filter(col("window_end").cast("long") * 1000 <= frontier)
    assert(got.count() === closed.count())
    assert(got.count() > 100) // a real month of hourly windows × event types
    // Value-level agreement on a sample window.
    val k = closed.orderBy("window_start", "event_type").limit(1).collect().head
    val g = got.filter(col("window_start") === k.getTimestamp(0) &&
      col("event_type") === k.getString(2)).collect()
    assert(g.length === 1)
    assert(g.head.getAs[Long]("n_events") === k.getAs[Long]("n_events"))
    assert(g.head.getAs[Double]("total_value") === k.getAs[Double]("total_value"))
  }

  test("Trigger.AvailableNow ingest processes only new files per run, exactly once") {
    // The scheduled-batch ingestion pattern for a landing zone: each run
    // drains what's there and exits; the checkpoint's file log guarantees
    // a file is processed exactly once across runs — no external
    // bookkeeping of which files were loaded, no reprocessing of a
    // 100 TB history to pick up today's drop.
    val dir = Files.createTempDirectory("graft_avnow").toFile.getAbsolutePath
    val landing = s"$dir/landing"
    val out = s"$dir/out"
    val ckpt = s"$dir/ckpt"
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "ts", "event_type", "value")
    val first = events.filter(col("event_id") < 500)
    val second = events.filter(col("event_id") >= 500)

    import org.apache.spark.sql.streaming.Trigger
    def runOnce(): Unit = {
      val q = spark.readStream.schema(events.schema).parquet(landing)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    first.write.mode("append").parquet(landing)
    runOnce()
    assert(spark.read.parquet(out).count() === first.count())

    second.write.mode("append").parquet(landing)
    runOnce()
    val sink = spark.read.parquet(out)
    assert(sink.count() === events.count())
    assert(sink.select("event_id").distinct().count() === events.count(),
      "exactly once: the second run must not reprocess the first drop")
  }

  test("streaming micro-batch upsert via mergeSink equals a from-scratch writeMerge build") {
    // A stream of key-level updates maintained as a MERGED table: drop 1
    // inserts, drop 2 updates half the keys and adds new ones. The final
    // table must equal the batch writeMerge composition of the same two
    // frames — last writer wins per key, untouched partitions preserved.
    val dir = Files.createTempDirectory("graft_mergesink").toFile.getAbsolutePath
    val landing = s"$dir/landing"
    val table = s"$dir/table"
    val ckpt = s"$dir/ckpt"
    import spark.implicits._
    val drop1 = (1L to 100L).map(k => (k, s"v1_$k", s"p${k % 3}"))
      .toDF("id", "payload", "part")
    val drop2 = (50L to 150L).map(k => (k, s"v2_$k", s"p${k % 3}"))
      .toDF("id", "payload", "part")

    def runOnce(): Unit = {
      val q = StreamingOps.mergeSink(
        spark.readStream.schema(drop1.schema).parquet(landing),
        table, ckpt, uniqueKey = "id", partitionCol = "part")
      q.awaitTermination()
    }

    drop1.write.mode("append").parquet(landing)
    runOnce()
    assert(spark.read.parquet(table).count() === 100)

    drop2.write.mode("append").parquet(landing)
    runOnce()

    val got = spark.read.parquet(table).select("id", "payload", "part")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val expected = ((1L to 49L).map(k => (k, s"v1_$k", s"p${k % 3}")) ++
      (50L to 150L).map(k => (k, s"v2_$k", s"p${k % 3}"))).toSet
    assert(got === expected,
      "streamed upsert state must equal last-writer-wins over both drops")
  }

  test("streaming IVF ingest equals the from-scratch index (search-result equality)") {
    // Landing-zone vector lake: the index is full-built on the oldest
    // 90% of vec_ids, then the newest 10% arrives as streamed files.
    // Search over the streamed index must equal search over a
    // from-scratch build of the whole corpus.
    val dir = Files.createTempDirectory("graft_ivfstream").toFile.getAbsolutePath
    val sf = "/root/testdata/sf0.01"
    val emb = Tables.load(spark, sf, "embeddings")
    val cut = emb.agg(expr("(max(vec_id) * 9) div 10").as("c")).head().getLong(0)
    val root = s"$dir/index"
    graft.llm.SimilarityOps.IvfIndex.buildInto(spark, emb.filter(col("vec_id") < cut), root)

    val landing = s"$dir/landing"
    emb.filter(col("vec_id") >= cut).write.mode("append").parquet(landing)
    val q = StreamingOps.ivfIngestSink(
      spark.readStream.schema(emb.schema).parquet(landing), root, s"$dir/ckpt")
    q.awaitTermination()

    val queries = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    def res(paths: (String, String)) =
      graft.llm.SimilarityOps.ivfSearchAt(spark, paths, queries, k = 5, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
          r.getDouble(4))).toSeq
    val streamed = res((s"$root/corpus",
      graft.llm.SimilarityOps.IvfIndex.centroidsPath(spark, root)))
    val scratch = res(graft.llm.SimilarityOps.IvfIndex.ensure(spark, sf))
    assert(streamed === scratch,
      "streamed index must answer exactly like a from-scratch build")
  }

  test("streaming BM25 ingest equals the from-scratch index, table by table") {
    val dir = Files.createTempDirectory("graft_bm25stream").toFile.getAbsolutePath
    val sf = "/root/testdata/sf0.01"
    val docs = Tables.load(spark, sf, "documents").filter(col("doc_id") >= 10)
      .select("doc_id", "text")
    val cut = docs.agg(expr("10 + ((max(doc_id) - 10) * 9) div 10").as("c"))
      .head().getLong(0)
    val root = s"$dir/index"
    graft.llm.CorpusOps.Bm25Index.buildInto(spark, docs.filter(col("doc_id") < cut), root)
    val landing = s"$dir/landing"
    docs.filter(col("doc_id") >= cut).write.mode("append").parquet(landing)
    StreamingOps.bm25IngestSink(
      spark.readStream.schema(docs.schema).parquet(landing), root, s"$dir/ckpt")
      .awaitTermination()
    // Full-build twin on the whole corpus; every index table must agree
    // row for row (the ensure root indexes the same doc set).
    val full = graft.llm.CorpusOps.Bm25Index.ensure(spark, sf)
    def rows(path: String, cols: String*): Set[String] =
      spark.read.parquet(path).select(cols.map(col): _*)
        .collect().map(_.mkString("|")).toSet
    assert(rows(s"$root/postings", "doc_id", "word", "tf", "dl") ===
      rows(s"$full/postings", "doc_id", "word", "tf", "dl"))
    assert(rows(s"$root/df", "word", "dfreq") === rows(s"$full/df", "word", "dfreq"))
    assert(rows(s"$root/doclens", "doc_id", "dl") === rows(s"$full/doclens", "doc_id", "dl"))
    assert(rows(graft.llm.CorpusOps.Bm25Index.statsPath(spark, root), "n_docs", "total_len") ===
      rows(graft.llm.CorpusOps.Bm25Index.statsPath(spark, full), "n_docs", "total_len"))
  }

  test("streaming dedup-group ingest equals a full recompute over everything ingested") {
    val dir = Files.createTempDirectory("graft_dedupstream").toFile.getAbsolutePath
    val sf = "/root/testdata/sf0.01"
    val docs = Tables.load(spark, sf, "documents").select("doc_id", "text")
    val cut = docs.agg(expr("(max(doc_id) * 8) div 10").as("c")).head().getLong(0)
    val root = s"$dir/state"
    // Backfill the lake on the oldest 80%, then stream the rest in as
    // TWO files so the sink folds more than one micro-batch shape.
    graft.llm.DedupOps.DedupState.buildInto(spark,
      graft.llm.DedupOps.bandsOfDocs(docs.filter(col("doc_id") < cut)), root)
    val landing = s"$dir/landing"
    val cut2 = docs.agg(expr("(max(doc_id) * 9) div 10").as("c")).head().getLong(0)
    docs.filter(col("doc_id") >= cut && col("doc_id") < cut2)
      .write.mode("append").parquet(landing)
    docs.filter(col("doc_id") >= cut2).write.mode("append").parquet(landing)
    StreamingOps.dedupIngestSink(
      spark.readStream.schema(docs.schema).parquet(landing), root, s"$dir/ckpt")
      .awaitTermination()
    def assigns(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val streamed = assigns(graft.llm.DedupOps.DedupState
      .assignment(spark, root).select("doc_id", "canonical_id"))
    val scratch = assigns(graft.llm.DedupOps.connectedComponents(
      graft.llm.DedupOps.bandSelfPairs(graft.llm.DedupOps.bandsOfDocs(docs)))
      .select("doc_id", "canonical_id"))
    assert(streamed === scratch,
      "streamed star state must equal connected components over the full corpus")
  }

  test("streaming vector dedup ingest equals a full-build over everything ingested") {
    val dir = Files.createTempDirectory("graft_vecdedupstream").toFile.getAbsolutePath
    val sf = "/root/testdata/sf0.01"
    val emb = Tables.load(spark, sf, "embeddings")
    val bpb = graft.llm.SimilarityOps.autoLshBpb(emb.count())
    val cut = emb.agg(expr("(max(vec_id) * 8) div 10").as("c")).head().getLong(0)
    val root = s"$dir/state"
    graft.llm.SimilarityOps.VecDedupState.buildInto(spark,
      emb.filter(col("vec_id") < cut), root, Some(bpb))
    val landing = s"$dir/landing"
    emb.filter(col("vec_id") >= cut).write.mode("append").parquet(landing)
    StreamingOps.vecDedupIngestSink(
      spark.readStream.schema(emb.schema).parquet(landing), root, s"$dir/ckpt")
      .awaitTermination()
    def assigns(root: String): Set[(Long, Long)] =
      graft.llm.SimilarityOps.VecDedupState.assignment(spark, root)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = s"$dir/full"
    graft.llm.SimilarityOps.VecDedupState.buildInto(spark, emb, full, Some(bpb))
    assert(assigns(root) === assigns(full),
      "streamed star state must equal a from-scratch build of the whole corpus")
  }

  test("streaming PQ ingest encodes deltas identically to the batch incremental build") {
    val dir = Files.createTempDirectory("graft_pqstream").toFile.getAbsolutePath
    val sf = "/root/testdata/sf0.01"
    val emb = Tables.load(spark, sf, "embeddings")
    val cut = emb.agg(expr("(max(vec_id) * 9) div 10").as("c")).head().getLong(0)
    val root = s"$dir/index"
    graft.llm.SimilarityOps.PqIndex.buildInto(spark, emb.filter(col("vec_id") < cut), root)
    val landing = s"$dir/landing"
    emb.filter(col("vec_id") >= cut).write.mode("append").parquet(landing)
    StreamingOps.pqIngestSink(
      spark.readStream.schema(emb.schema).parquet(landing), root, s"$dir/ckpt")
      .awaitTermination()
    val batchRoot = graft.llm.SimilarityOps.PqIndex.ensureIncremental(spark, sf)
    def codes(path: String): Set[(Long, Int, Int)] =
      spark.read.parquet(s"$path/codes").select("vec_id", "m", "cluster")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(codes(root) === codes(batchRoot),
      "streamed delta encoding must equal the batch incremental build's codes")
  }

  test("streaming profile monitor equals the one-batch profile over everything ingested") {
    import graft.operators.ProfileOps.ProfileState
    val dir = Files.createTempDirectory("graft_profstream").toFile.getAbsolutePath
    val sf = "/root/testdata/sf0.01"
    val ev = Tables.load(spark, sf, "events")
      .select("event_id", "user_id", "event_type", "value", "ts")
    val cut = 5000L
    val landing = s"$dir/landing"
    val root = s"$dir/state"

    // First run: one file; second run: the rest. Two distinct batch ids.
    ev.filter(col("event_id") < cut).write.mode("append").parquet(landing)
    val q1 = StreamingOps.profileIngestSink(
      spark.readStream.schema(ev.schema).parquet(landing), root, s"$dir/ckpt")
    q1.awaitTermination()
    ev.filter(col("event_id") >= cut).write.mode("append").parquet(landing)
    val q2 = StreamingOps.profileIngestSink(
      spark.readStream.schema(ev.schema).parquet(landing), root, s"$dir/ckpt")
    q2.awaitTermination()

    // Batch control: the SAME rows as ONE batch into a fresh root. The
    // exact metrics (counts, min/max) are order-insensitive mergeables
    // and must be IDENTICAL. The HLL estimates agree only to sketch
    // accuracy: a DataSketches union takes the out-of-order estimator
    // path, so a split corpus may estimate a few counts off the
    // one-batch sketch — that's the documented sketch contract, not
    // state drift.
    ProfileState.applyBatch(spark, ev, s"$dir/control", 0L)
    val streamed = ProfileState.read(spark, root).collect().map(_.toSeq)
    val control = ProfileState.read(spark, s"$dir/control").collect().map(_.toSeq)
    assert(streamed.map(_.dropRight(1)).toSeq === control.map(_.dropRight(1)).toSeq,
      "two streamed batches must merge to the one-batch profile exactly on all exact metrics")
    streamed.zip(control).foreach { case (sr, cr) =>
      val (se, ce) = (sr.last.asInstanceOf[Long], cr.last.asInstanceOf[Long])
      assert(math.abs(se - ce) <= (ce * 5 * 0.0163).toLong.max(2L),
        s"${sr.head}: split-estimate $se vs one-batch $ce outside the lgK=12 5x-rsd band")
    }

    // Spot-check absolutes against the raw data.
    val m = ProfileState.read(spark, root).collect()
      .map(r => r.getString(0) -> r).toMap
    val n = ev.count()
    assert(m("event_id").getLong(1) === n && m("event_id").getLong(2) === 0L)
    val exactUsers = ev.agg(countDistinct("user_id")).head().getLong(0)
    val est = m("user_id").getLong(7)
    assert(math.abs(est - exactUsers) <= (exactUsers * 5 * 0.0163).toLong.max(2L),
      s"HLL estimate $est vs exact $exactUsers outside the lgK=12 5x-rsd band")
    assert(m("value").getDouble(3) === ev.agg(min("value")).head().getDouble(0))
    assert(m("event_type").getString(5) === ev.agg(min("event_type")).head().getString(0))

    // Replay: re-applying an already-published batch id is a no-op.
    ProfileState.applyBatch(spark, ev.limit(3), root, 0L)
    val after = ProfileState.read(spark, root).collect().map(_.toSeq)
    assert(after.toSeq === streamed.toSeq, "replayed batch id must not change state")
  }
}
