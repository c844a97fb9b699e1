package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.llm.DedupOps

/** Multi-batch replay contract for the PERSISTED incremental-dedup
  * state (VERDICT r8 ask #3): state after `buildInto(lake)` +
  * `applyBatch(b1)` + `applyBatch(b2)` must equal a full recompute over
  * every band ever ingested, and replaying an already-applied batch
  * must be a no-op for both the assignment and the band index.
  */
class IncrementalGroupsSpec extends SparkSpec {
  import spark.implicits._

  // Band rows (doc_id, band_idx, band_hash). Bucket layout:
  //   lake: {0,1} share a bucket, {2,3} share a bucket, 4 alone;
  //   batch1: 10 joins doc 1's bucket (merges into {0,1}), 11 alone;
  //   batch2: 20-21 share a NEW bucket, 22 joins {2,3}'s bucket, and 23
  //   bridges batch1's doc 11 — a cross-BATCH merge no single batch sees.
  private def bandDf(rows: (Long, Int, Long)*): DataFrame =
    rows.toDF("doc_id", "band_idx", "band_hash")

  private val lake = bandDf(
    (0L, 0, 100L), (1L, 0, 100L), (2L, 0, 200L), (3L, 0, 200L), (4L, 0, 300L))
  private val batch1 = bandDf((10L, 0, 100L), (11L, 0, 400L))
  private val batch2 = bandDf(
    (20L, 0, 500L), (21L, 0, 500L), (22L, 0, 200L), (23L, 0, 400L))

  private def assignMap(df: DataFrame): Map[Long, Long] =
    df.select("doc_id", "canonical_id").as[(Long, Long)].collect().toMap

  test("two applied batches equal a full recompute; replay is a no-op") {
    val root = java.nio.file.Files.createTempDirectory("graft-dedupstate").toString + "/state"
    DedupOps.DedupState.buildInto(spark, lake, root)
    DedupOps.DedupState.applyBatch(spark, batch1, root)
    DedupOps.DedupState.applyBatch(spark, batch2, root)
    val got = assignMap(DedupOps.DedupState.assignment(spark, root))
    val full = assignMap(DedupOps.connectedComponents(
      DedupOps.bandSelfPairs(lake.unionAll(batch1).unionAll(batch2))))
    assert(got === full,
      "persisted star re-closure over two batches must equal the from-scratch closure")
    // The cross-batch merge really happened: 23 (batch2) and 11 (batch1)
    // share a bucket no lake doc touches.
    assert(got(23L) === got(11L))
    // Replay batch2: assignment unchanged, band index row count unchanged.
    val nBands0 = spark.read.parquet(s"$root/bandindex").count()
    DedupOps.DedupState.applyBatch(spark, batch2, root)
    assert(assignMap(DedupOps.DedupState.assignment(spark, root)) === full,
      "replaying an applied batch must not move the assignment")
    assert(spark.read.parquet(s"$root/bandindex").count() === nBands0,
      "replaying an applied batch must append nothing to the band index")
  }

  test("a crash between the star publish and the band append is repaired by replay") {
    val root = java.nio.file.Files.createTempDirectory("graft-dedupstate2").toString + "/state"
    DedupOps.DedupState.buildInto(spark, lake, root)
    // Crash simulation: batch1's star generation published, but the
    // band append never ran (publish-then-append order). The replay must
    // converge to the same state as a clean single apply.
    val bb = DedupOps.bandSelfPairs(batch1)
    val lakeIdx = spark.read.parquet(s"$root/bandindex")
    val bl = batch1.select(col("band_idx"), col("band_hash"), col("doc_id").as("bd"))
      .join(lakeIdx.select(col("band_idx").as("bi"), col("band_hash").as("bh"),
        col("doc_id").as("ld")),
        col("band_idx") === col("bi") && col("band_hash") === col("bh"))
      .filter(col("bd") =!= col("ld"))
      .select(least(col("bd"), col("ld")).as("doc_a"),
        greatest(col("bd"), col("ld")).as("doc_b")).distinct()
    val stars = spark.read.parquet(DedupOps.DedupState.starsPath(spark, root))
    val assign = DedupOps.connectedComponents(stars.unionAll(bb).unionAll(bl))
      .filter(col("canonical_id") =!= col("doc_id"))
      .select(col("canonical_id").as("doc_a"), col("doc_id").as("doc_b"))
    graft.sources.Artifacts.publishGeneration(spark, root, "stars") { dir =>
      assign.write.mode("overwrite").parquet(dir)
    } // ...and "crash" before the band append.
    DedupOps.DedupState.applyBatch(spark, batch1, root)
    val got = assignMap(DedupOps.DedupState.assignment(spark, root))
    val want = assignMap(DedupOps.connectedComponents(
      DedupOps.bandSelfPairs(lake.unionAll(batch1))))
    assert(got === want, "replay after the crash must converge to the clean-apply state")
    // And the band index now contains batch1's bands exactly once.
    val b1rows = spark.read.parquet(s"$root/bandindex")
      .filter(col("doc_id") >= 10).count()
    assert(b1rows === 2L)
  }
}
