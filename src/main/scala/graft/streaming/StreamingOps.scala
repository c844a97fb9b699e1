package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Structured Streaming variants of the engine's batch semantics
  * (SURVEY.md §2.9): the reference reprocesses a rolling 9-day window in
  * batch; these operators compute the same aggregates continuously so a
  * 100 TB/day event feed never needs the batch rewind.
  *
  *  - `windowedPlayCounts` is the streaming analog of the streams-daily
  *    per-date aggregation (`/root/reference/models/datamarts/npo-data-hub/
  *    intermediary/atinternet_smarttag_streams_daily_v4.sql:139-161`):
  *    event-time tumbling windows + watermark for late data, qualified
  *    (>= 30s) counts per event type.
  *  - `sessionize` tracks per-user sessions with `mapGroupsWithState` —
  *    the custom-state shape (session gap 30 min) the DataFrame API can't
  *    express declaratively.
  *
  * Scale notes: both partition by key (window+type / user) so state is
  * sharded across executors; watermarks bound state size; output mode
  * `update` keeps sinks incremental.
  */
object StreamingOps {

  /** Native `session_window` gap sessions — ONE declarative groupBy
    * that runs identically batch (the `a12b_session_window` oracle row
    * calls this) and streaming (merging session state; with the
    * watermark, closed sessions emit in append mode and state is
    * bounded by gap + watermark delay). Expects (user_id, ts); session
    * end = last event + gap, end-exclusive.
    */
  def sessionWindowCounts(events: DataFrame, gap: String = "30 minutes",
                          watermark: String = "1 hour"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src.groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"))
  }

  /** Tumbling event-time aggregation with late-data watermark. Works on
    * any frame with (ts TIMESTAMP, event_type STRING, value DOUBLE) —
    * batch or streaming (same plan shape, which is the point).
    */
  def windowedPlayCounts(events: DataFrame, windowLen: String = "10 minutes",
                         watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("value") >= 30.0, 1L).otherwise(0L)).as("n_qualified"),
        round(sum("value"), 2).as("total_value"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("n_events"), col("n_qualified"), col("total_value"))

  /** Streaming exact dedup — the streaming face of `llm_exact_dedup`:
    * first arrival per content key (md5 of the payload) survives,
    * duplicates within the watermark horizon are dropped. Works on any
    * frame with (ts TIMESTAMP, text STRING). State discipline for a
    * 100 TB/day feed: a plain `dropDuplicates` keeps every key seen
    * FOREVER (state grows with the corpus);
    * `dropDuplicatesWithinWatermark` expires a key once the watermark
    * passes its event time, so state is bounded by the duplicate-arrival
    * horizon — the right contract for ingest dedup, where duplicates
    * are retries/replays clustered in time, while global historical
    * dedup stays the batch `llm_exact_dedup` job. Keyed state shards by
    * content hash across executors (skew-free by construction).
    */
  def streamingExactDedup(docs: DataFrame, watermark: String = "1 hour"): DataFrame = {
    val keyed = docs.withColumn("content_key", md5(col("text")))
    if (docs.isStreaming)
      keyed.withWatermark("ts", watermark).dropDuplicatesWithinWatermark("content_key")
    else {
      // Batch sees the whole input at once, so the watermark horizon is
      // vacuous — but the contract stays FIRST ARRIVAL WINS, which plain
      // dropDuplicates does NOT honor (it keeps an arbitrary partition-
      // order row); the min-ts window keeps the earliest row per key,
      // matching what the streaming path would have emitted. Ties on ts
      // (same content, same arrival instant) break on the full row's
      // hash so the survivor is deterministic, not partition-order luck.
      import org.apache.spark.sql.expressions.Window
      keyed
        .withColumn("__rn", row_number().over(
          Window.partitionBy("content_key")
            .orderBy(col("ts"), xxhash64(keyed.columns.map(col): _*))))
        .filter(col("__rn") === 1)
        .drop("__rn")
    }
  }

  /** Map-side MinHash-LSH band hashes for a frame carrying (doc_id,
    * text, ...): word 3-shingles → 8 min-hashes → 4 banded hashes, all
    * inside ONE higher-order-function projection — no groupBy, so the
    * same expression runs on a STREAM (where the batch formulation's
    * signature aggregate would be a stateful op) and on a static frame.
    * The hash family is identical to the batch LSH pipeline
    * (`llm_minhash_lsh_pairs`): md5("<seed>:" + shingle) minima, bands
    * = md5(mh[2b] ‖ mh[2b+1]) — the streaming-vs-batch agreement test
    * pins that equivalence through the DuckDB-oracled incremental-dedup
    * row. Docs with fewer than 3 words have no shingles: their band
    * hashes are NULL (array_min of empty), which can never match a
    * probe — drop them with `band_hash IS NOT NULL` when building an
    * index. Extra input columns (ts, source) pass through untouched.
    */
  def bandHashes(docs: DataFrame): DataFrame = {
    val passThrough = docs.columns.map(col).toSeq
    docs
      .withColumn("__words", graft.dialect.Dialect.splitLit(col("text"), " "))
      .withColumn("__shingles", expr(
        """CASE WHEN size(__words) < 3 THEN array()
          |     ELSE transform(sequence(1, size(__words) - 2),
          |            i -> concat_ws(' ', __words[i-1], __words[i], __words[i+1])) END""".stripMargin))
      .withColumn("__mhs", expr(
        "transform(sequence(0, 7), s -> array_min(transform(__shingles, " +
          "x -> md5(concat(cast(s AS string), ':', x)))))"))
      .withColumn("__b", explode(expr(
        "transform(sequence(0, 3), b -> struct(b AS band_idx, " +
          "md5(concat(__mhs[2*b], __mhs[2*b+1])) AS band_hash))")))
      .select(passThrough :+ col("__b.band_idx") :+ col("__b.band_hash"): _*)
  }

  /** Streaming near-duplicate probe — the continuous face of
    * `llm_incremental_dedup`: each arriving document's band hashes are
    * checked against the STATIC lake band index (the table the batch
    * engine maintains incrementally), and the document is flagged
    * `is_dup` when any band bucket already exists on the lake side.
    *
    * Plan shape: band hashing is a narrow map; the index probe is a
    * stream-static equi-join (no streaming state — the static side is
    * a bounded build per micro-batch); the only STATEFUL op is the
    * per-document any-band-hit fold, keyed by (day window, doc_id) so
    * the watermark expires state after the duplicate-arrival horizon.
    * Runs identically on a batch frame (the agreement test's oracle
    * path).
    */
  def streamingNearDupProbe(docs: DataFrame, lakeIndex: DataFrame,
      watermark: String = "1 hour"): DataFrame = {
    val probes = bandHashes(docs)
    val marked = probes.join(
      lakeIndex.select(col("band_idx"), col("band_hash"), lit(true).as("hit")),
      Seq("band_idx", "band_hash"), "left_outer")
    val wm = if (docs.isStreaming) marked.withWatermark("ts", watermark) else marked
    wm.groupBy(window(col("ts"), "1 day"), col("doc_id"))
      .agg(max(coalesce(col("hit"), lit(false))).as("is_dup"))
      .select(col("window.start").as("day"), col("doc_id"), col("is_dup"))
  }

  /** Streaming analog of the streams-daily DAILY rollup over the raw NPO
    * event feed (`atinternet_smarttag_streams_daily_v4.sql:139-161`
    * collapsed to the date grain): same inclusion rules as the batch
    * model — drop Animations, keep only the reprocessing window, and for
    * livestream events require a mapped channel (the model's INNER join,
    * here a stream-static broadcast join + filter so non-live events pass
    * untouched). Emits per-day playback seconds and event counts with a
    * 1-day tumbling event-time window.
    *
    * Batch/stream parity is asserted in `StreamingSpec`: this over the
    * fixture feed equals the materialized DAG model's per-date sums —
    * the continuous path a 100 TB/day feed would take instead of the
    * 9-day batch rewind.
    */
  def npoDailyPlayback(events: DataFrame, channelMapping: DataFrame,
                       partitions: Seq[String], watermark: String = "1 day"): DataFrame = {
    import graft.dialect.Dialect._
    val mapped = events
      .filter(col("d_rm_type") =!= "Animations" &&
        col("d_date_hour_event").cast("date").cast("string").isin(partitions: _*))
      .join(broadcast(channelMapping.select(col("channel_id"), col("channel"))),
        col("channel_id") === nullifEmpty(
          safeOffset(splitLit(col("d_rm_content"), "_||_"), 1)), "left")
      .filter(col("d_rm_theme1").isNull || col("d_rm_theme1") =!= "livetvzender" ||
        col("channel").isNotNull)
    mapped
      .withWatermark("d_date_hour_event", watermark)
      .groupBy(window(col("d_date_hour_event"), "1 day").as("w"))
      .agg(sum("d_rm_playback_time").as("playback_sec"),
        count(lit(1)).as("n_events"))
      .select(col("w.start").cast("date").as("evt_date"),
        col("playback_sec"), col("n_events"))
  }

  /** Stream-stream interval join: every click paired with the views it
    * followed within `windowMinutes`, same user — the continuous face
    * of the batch `j15_click_attribution` query (parity asserted in
    * `StreamingSpec`). Both sides are watermarked, so the join state is
    * BOUNDED: the time-range condition lets Spark prove a buffered view
    * older than watermark + window can never match a future click, and
    * evict it. Without the interval bound a stream-stream inner join
    * buffers both streams forever — the unbounded-state trap at
    * 100 TB/day. On a batch frame the watermarks are no-ops and the
    * plan is the same sort-merge join as the batch query.
    */
  def attributeClicks(events: DataFrame, windowMinutes: Int = 10,
                      watermark: String = "30 minutes"): DataFrame = {
    import graft.dialect.Dialect.timestampDiffSeconds
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
      .withWatermark("view_ts", watermark)
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    views.join(clicks,
        col("user_id") === col("cu") &&
          col("click_ts") >= col("view_ts") &&
          col("click_ts") < col("view_ts") + expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(col("user_id"), col("view_id"), col("click_id"),
        timestampDiffSeconds(col("click_ts"), col("view_ts")).as("gap_s"))
  }

  final case class Event(user_id: Long, ts: Timestamp, value: Double)
  final case class SessionState(start: Long, lastSeen: Long, nEvents: Long, total: Double)
  final case class SessionOut(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, total_value: Double, closed: Boolean)

  private val gapMs = 30L * 60 * 1000

  /** Per-user sessionization with a 30-minute inactivity gap via
    * `mapGroupsWithState` + processing-time timeout. Emits the running
    * session on every update and a closed session after the gap.
    *
    * `withTimeout = false` disables the processing-time timeout (state
    * then only closes by gap logic on the next event) — needed where
    * `processAllAvailable` must terminate, e.g. bounded replays and
    * tests: timeout-triggered empty batches otherwise keep the query
    * busy forever.
    */
  def sessionize(events: Dataset[Event], withTimeout: Boolean = true): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, SessionOut](
        if (withTimeout) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            SessionOut(user, new Timestamp(s.start), new Timestamp(s.lastSeen),
              s.nEvents, s.total, closed = true)
          } else {
            val evs = batch.toSeq.sortBy(_.ts.getTime)
            val prev = state.getOption
            // Start fresh if the batch begins after the gap, else extend.
            val init = prev.filter(p =>
              evs.headOption.forall(_.ts.getTime - p.lastSeen <= gapMs))
            val s0 = init.getOrElse(SessionState(
              evs.head.ts.getTime, evs.head.ts.getTime, 0L, 0.0))
            val s = evs.foldLeft(s0) { (acc, e) =>
              SessionState(acc.start, math.max(acc.lastSeen, e.ts.getTime),
                acc.nEvents + 1, acc.total + e.value)
            }
            state.update(s)
            if (withTimeout) state.setTimeoutDuration(gapMs)
            SessionOut(user, new Timestamp(s.start), new Timestamp(s.lastSeen),
              s.nEvents, s.total, closed = false)
          }
      }
  }

  /** Micro-batch UPSERT sink: every micro-batch lands through
    * `DagRunner.writeMerge` — dbt's merge incremental strategy — so a
    * stream of key-level updates maintains a queryable merged table
    * instead of an append log. `foreachBatch` is the documented bridge
    * from Structured Streaming to batch-only materializations, and the
    * semantics compose: writeMerge's partition-scoped rewrite is
    * idempotent for a replayed batch (upserting the same rows again
    * converges to the same table), so checkpoint + replay yields
    * effectively-once TABLE state even though foreachBatch itself is
    * at-least-once. Default trigger is `AvailableNow` — the
    * scheduled-drain landing-zone pattern (each run processes only new
    * files, exactly once, per the checkpoint file log).
    *
    * Scale: each micro-batch pays one writeMerge — a key-pruned
    * anti-join + dynamic overwrite of HIT partitions only; a day of
    * updates against a 100 TB table rewrites one day.
    */
  def mergeSink(updates: DataFrame, path: String, checkpoint: String,
      uniqueKey: String, partitionCol: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val upsert: (DataFrame, Long) => Unit = (batch, _) =>
      graft.engine.DagRunner.writeMerge(batch.sparkSession, batch, path,
        uniqueKey, partitionCol)
    updates.writeStream
      .foreachBatch(upsert)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
  }

  /** Streaming ANN index maintenance: each micro-batch of new vectors
    * (vec_id, embedding, label) lands in a persisted IVF index root
    * through `IvfIndex.addVectors` — cell partitions upsert via
    * writeMerge, touched-cell centroids re-derive, the centroid table
    * republishes via staging. `addVectors` filters already-indexed
    * vec_ids, so a replayed micro-batch is a no-op and checkpoint +
    * replay yields effectively-once INDEX state (same argument as
    * [[mergeSink]]). This is the landing-zone shape for a vector lake:
    * embeddings stream in, the serving index stays queryable and stays
    * equal to a from-scratch build (`StreamingFileSpec` pins it against
    * the batch path, which `llm_ann_ivf_inc`'s oracle pins in turn).
    */
  def ivfIngestSink(updates: DataFrame, indexRoot: String, checkpoint: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    indexIngestSink(updates, checkpoint, trigger,
      (batch, _) => graft.llm.SimilarityOps.IvfIndex.addVectors(
        batch.sparkSession, batch, indexRoot))

  /** Streaming BM25 index maintenance: micro-batches of new documents
    * (doc_id, text) land through `Bm25Index.addDocuments` — postings /
    * df / doclens upserted partition-locally, stats re-derived.
    * Same effectively-once argument: known doc_ids filter out, so a
    * replayed batch is a no-op.
    */
  def bm25IngestSink(updates: DataFrame, indexRoot: String, checkpoint: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    indexIngestSink(updates, checkpoint, trigger,
      (batch, _) => graft.llm.CorpusOps.Bm25Index.addDocuments(
        batch.sparkSession, batch, indexRoot))

  /** Streaming PQ code maintenance: micro-batches of new vectors encode
    * against the index's FROZEN codebook via `PqIndex.addVectors` and
    * upsert their codes — the streaming face of the rebuild-vs-encode
    * contract (`llm_pq_incremental`).
    */
  def pqIngestSink(updates: DataFrame, indexRoot: String, checkpoint: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    indexIngestSink(updates, checkpoint, trigger,
      (batch, _) => graft.llm.SimilarityOps.PqIndex.addVectors(
        batch.sparkSession, batch, indexRoot))

  /** Streaming dedup-group maintenance: micro-batches of new documents
    * (doc_id, text) band-hash themselves (the batch path's own
    * `bandsOfDocs`) and fold into a persisted `DedupState` root —
    * batch-self pairs + band-index probe + standing-star re-closure,
    * never a lake self-join (`llm_incremental_groups`' algebra, now
    * fed by a stream). `applyBatch` is replay-idempotent (star
    * re-closure of a closed graph is the identity; the band append is
    * anti-join-guarded), so checkpoint + replay yields effectively-once
    * GROUP state: after any prefix of micro-batches the star table
    * equals a full recompute over the documents ingested so far
    * (`StreamingFileSpec` pins it against `connectedComponents` of the
    * batch pipeline).
    */
  def dedupIngestSink(updates: DataFrame, stateRoot: String, checkpoint: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    indexIngestSink(updates, checkpoint, trigger,
      (batch, _) => graft.llm.DedupOps.DedupState.applyBatch(
        batch.sparkSession, graft.llm.DedupOps.bandsOfDocs(batch), stateRoot))

  /** Streaming VECTOR dedup-group maintenance — the embedding twin of
    * [[dedupIngestSink]]: micro-batches of (vec_id, embedding) fold
    * into a persisted `VecDedupState` root at its PINNED band geometry
    * (batch-self banded candidates + band-index probe + exact-cosine
    * verification + star re-closure). `applyBatch` keys all appends off
    * the whole batch with self-targeted anti-joins, so any crash prefix
    * replays to the same state — effectively-once group state over
    * at-least-once delivery.
    */
  def vecDedupIngestSink(updates: DataFrame, stateRoot: String, checkpoint: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    indexIngestSink(updates, checkpoint, trigger,
      (batch, _) => graft.llm.SimilarityOps.VecDedupState.applyBatch(
        batch.sparkSession, batch, stateRoot))

  /** Streaming data-quality monitor — the ingest-time face of
    * `ProfileOps.profile`: each micro-batch folds its per-column
    * profile partials (counts, typed min/max, HLL distinct sketches)
    * into a persisted `ProfileState` root; `ProfileState.read` answers
    * the merged profile of everything ingested so far without ever
    * rescanning the data. Effectively-once by batch-id partition guard
    * with rename-swap publish: a replayed micro-batch (same batch id
    * from the checkpoint) sees its partition already published and
    * no-ops. All partials are order-insensitive mergeables, so any
    * batch split converges to the SAME profile as one batch over the
    * union (`StreamingFileSpec` pins it).
    */
  def profileIngestSink(updates: DataFrame, stateRoot: String, checkpoint: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    indexIngestSink(updates, checkpoint, trigger,
      (batch, id) => graft.operators.ProfileOps.ProfileState.applyBatch(
        batch.sparkSession, batch, stateRoot, id))

  /** Shared foreachBatch plumbing of the three index-maintenance sinks:
    * each micro-batch applies one idempotent delta-builder, so
    * checkpoint + replay yields effectively-once INDEX state even
    * though foreachBatch itself is at-least-once.
    */
  private def indexIngestSink(updates: DataFrame, checkpoint: String,
      trigger: org.apache.spark.sql.streaming.Trigger,
      apply: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    updates.writeStream
      .foreachBatch(apply)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}
