package graft

import org.apache.spark.sql.functions._

import graft.engine.DagRunner

/** dbt snapshot (SCD2 capture) semantics for BOTH standard strategies:
  * check (first-run open rows, change detection closing + versioning,
  * new-key insert, unchanged and hard-deleted keys left open, idempotent
  * re-runs, NULL-vs-empty disambiguation) and timestamp (strictly-newer
  * updated_at closes, out-of-order/equal arrivals are no-ops, validity
  * stamps come from the source's own timeline). Plus the shared
  * preconditions (duplicate-key and schema-drift rejection) and the
  * rename-swap publish crash contract.
  */
class SnapshotSpec extends SparkSpec {

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft_snap").toFile.getAbsolutePath + "/snap"

  test("capture: first run opens; changes close and version; deletes stay open") {
    import spark.implicits._
    val path = tmp()
    val day1 = Seq((1L, "alice", "NL"), (2L, "bob", "DE"), (3L, "carol", "ES"))
      .toDF("id", "name", "country")
    DagRunner.writeSnapshot(spark, day1, path, "id", Seq("name", "country"), "2024-01-01")
    val s1 = spark.read.parquet(path)
    assert(s1.count() === 3)
    assert(s1.filter(col("dbt_valid_to").isNull).count() === 3)

    // day 2: bob moves country (change), dave appears (new),
    // carol vanishes (hard delete -> stays open), alice unchanged.
    val day2 = Seq((1L, "alice", "NL"), (2L, "bob", "FR"), (4L, "dave", "IT"))
      .toDF("id", "name", "country")
    DagRunner.writeSnapshot(spark, day2, path, "id", Seq("name", "country"), "2024-01-02")
    val s2 = spark.read.parquet(path)
    assert(s2.count() === 5) // 3 originals + bob v2 + dave
    val bob = s2.filter(col("id") === 2).orderBy("dbt_valid_from").collect()
    assert(bob.length === 2)
    assert(bob(0).getAs[String]("country") === "DE" &&
      bob(0).getAs[String]("dbt_valid_to") === "2024-01-02")
    assert(bob(1).getAs[String]("country") === "FR" &&
      bob(1).getAs[String]("dbt_valid_to") == null)
    assert(s2.filter(col("id") === 3 && col("dbt_valid_to").isNull).count() === 1,
      "hard-deleted key stays open under the dbt default")
    assert(s2.filter(col("id") === 4 && col("dbt_valid_from") === "2024-01-02").count() === 1)
    assert(s2.filter(col("id") === 1).count() === 1, "unchanged key keeps one open row")

    // idempotency: same source, same asOf -> byte-identical state
    val before = s2.collect().map(_.toString).sorted.toSeq
    DagRunner.writeSnapshot(spark, day2, path, "id", Seq("name", "country"), "2024-01-02")
    val after = spark.read.parquet(path).collect().map(_.toString).sorted.toSeq
    assert(after === before)
  }

  test("invalidate_hard_deletes closes vanished keys at the run stamp (both strategies)") {
    import spark.implicits._
    // check strategy: carol vanishes on day 2 -> her open row closes.
    val p1 = tmp()
    val day1 = Seq((1L, "alice"), (3L, "carol")).toDF("id", "name")
    DagRunner.writeSnapshot(spark, day1, p1, "id", Seq("name"), "2024-01-01")
    DagRunner.writeSnapshot(spark, Seq((1L, "alice")).toDF("id", "name"),
      p1, "id", Seq("name"), "2024-01-02", invalidateHardDeletes = true)
    val s = spark.read.parquet(p1)
    assert(s.filter(col("id") === 3).head().getAs[String]("dbt_valid_to") === "2024-01-02")
    assert(s.filter(col("id") === 1 && col("dbt_valid_to").isNull).count() === 1)
    // Idempotent: the already-closed key has no open row to close again.
    DagRunner.writeSnapshot(spark, Seq((1L, "alice")).toDF("id", "name"),
      p1, "id", Seq("name"), "2024-01-02", invalidateHardDeletes = true)
    assert(spark.read.parquet(p1).count() === 2)

    // timestamp strategy: deletion closes at the asOf stamp, a
    // superseded version still closes at the superseding updated_at.
    val p2 = tmp()
    val t1 = Seq((1L, "a", "2024-01-01"), (2L, "b", "2024-01-01"))
      .toDF("id", "v", "updated_at")
    DagRunner.writeSnapshotTimestamp(spark, t1, p2, "id", "updated_at")
    val t2 = Seq((1L, "a2", "2024-01-03")).toDF("id", "v", "updated_at")
    DagRunner.writeSnapshotTimestamp(spark, t2, p2, "id", "updated_at",
      invalidateHardDeletes = true, asOf = Some("2024-01-04"))
    val ts = spark.read.parquet(p2)
    assert(ts.filter(col("id") === 2).head().getAs[String]("dbt_valid_to") === "2024-01-04")
    assert(ts.filter(col("id") === 1 && col("dbt_valid_to") === "2024-01-03").count() === 1)
    assert(ts.filter(col("id") === 1 && col("dbt_valid_to").isNull)
      .head().getAs[String]("v") === "a2")
    // The dial without an asOf stamp is a loud error, not a silent null.
    val e = intercept[IllegalArgumentException] {
      DagRunner.writeSnapshotTimestamp(spark, t2, p2, "id", "updated_at",
        invalidateHardDeletes = true)
    }
    assert(e.getMessage.contains("asOf"))
  }

  test("NULL and empty check values are distinct states") {
    import spark.implicits._
    val path = tmp()
    val v1 = Seq((1L, Option.empty[String])).toDF("id", "attr")
    DagRunner.writeSnapshot(spark, v1, path, "id", Seq("attr"), "2024-01-01")
    val v2 = Seq((1L, Option(""))).toDF("id", "attr")
    DagRunner.writeSnapshot(spark, v2, path, "id", Seq("attr"), "2024-01-02")
    val s = spark.read.parquet(path)
    assert(s.count() === 2, "NULL -> '' must register as a change")
    assert(s.filter(col("dbt_valid_to").isNull).count() === 1)
  }

  test("timestamp strategy: strictly-newer closes; equal and out-of-order are no-ops") {
    import spark.implicits._
    val path = tmp()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val day1 = Seq((1L, "alice", ts("2024-01-01 10:00:00")),
      (2L, "bob", ts("2024-01-01 11:00:00"))).toDF("id", "name", "updated_at")
    DagRunner.writeSnapshotTimestamp(spark, day1, path, "id", "updated_at")
    val s1 = spark.read.parquet(path)
    assert(s1.count() === 2 && s1.filter(col("dbt_valid_to").isNull).count() === 2)
    assert(s1.filter(col("id") === 1).head().getAs[String]("dbt_valid_from")
      === "2024-01-01 10:00:00", "valid_from is the row's own updated_at, not run time")

    // day 2: alice newer (closes v1), bob EQUAL updated_at but different
    // content (timestamp strategy ignores content -> no-op), carol new.
    val day2 = Seq((1L, "alice2", ts("2024-01-02 09:00:00")),
      (2L, "bob-renamed", ts("2024-01-01 11:00:00")),
      (3L, "carol", ts("2024-01-02 08:00:00"))).toDF("id", "name", "updated_at")
    DagRunner.writeSnapshotTimestamp(spark, day2, path, "id", "updated_at")
    val s2 = spark.read.parquet(path)
    assert(s2.count() === 4) // alice v1+v2, bob v1, carol
    val alice = s2.filter(col("id") === 1).orderBy("dbt_valid_from").collect()
    assert(alice(0).getAs[String]("dbt_valid_to") === "2024-01-02 09:00:00",
      "closed version's valid_to is the superseding row's updated_at")
    assert(alice(1).getAs[String]("dbt_valid_to") == null)
    assert(s2.filter(col("id") === 2).count() === 1, "equal updated_at is a no-op")
    assert(s2.filter(col("id") === 2).head().getAs[String]("name") === "bob",
      "the open version keeps its original content on a no-op")

    // day 3: alice arrives OUT OF ORDER (older than her open version).
    val day3 = Seq((1L, "alice-stale", ts("2024-01-01 23:00:00"))).toDF("id", "name", "updated_at")
    DagRunner.writeSnapshotTimestamp(spark, day3, path, "id", "updated_at")
    val s3 = spark.read.parquet(path)
    assert(s3.filter(col("id") === 1).count() === 2, "out-of-order updated_at is a no-op")

    // replay idempotency: same batch twice -> identical state
    val before = s3.collect().map(_.toString).sorted.toSeq
    DagRunner.writeSnapshotTimestamp(spark, day2, path, "id", "updated_at")
    val after = spark.read.parquet(path).collect().map(_.toString).sorted.toSeq
    assert(after === before)
  }

  test("duplicate unique_key in the source is rejected, not silently fanned out") {
    import spark.implicits._
    val path = tmp()
    val dup = Seq((1L, "a"), (1L, "b")).toDF("id", "name")
    val e = intercept[IllegalArgumentException] {
      DagRunner.writeSnapshot(spark, dup, path, "id", Seq("name"), "2024-01-01")
    }
    assert(e.getMessage.contains("unique_key"))
    // second run path checks too
    DagRunner.writeSnapshot(spark, Seq((1L, "a")).toDF("id", "name"),
      path, "id", Seq("name"), "2024-01-01")
    intercept[IllegalArgumentException] {
      DagRunner.writeSnapshot(spark, dup, path, "id", Seq("name"), "2024-01-02")
    }
  }

  test("schema drift between source and snapshot fails loudly") {
    import spark.implicits._
    val path = tmp()
    DagRunner.writeSnapshot(spark, Seq((1L, "a")).toDF("id", "name"),
      path, "id", Seq("name"), "2024-01-01")
    val drifted = Seq((1L, "a", "x")).toDF("id", "name", "extra")
    val e = intercept[IllegalArgumentException] {
      DagRunner.writeSnapshot(spark, drifted, path, "id", Seq("name"), "2024-01-02")
    }
    assert(e.getMessage.contains("schema drift") && e.getMessage.contains("extra"))
  }

  test("a crash before the publish renames leaves the old table readable (rename-swap)") {
    import spark.implicits._
    val path = tmp()
    DagRunner.writeSnapshot(spark, Seq((1L, "a")).toDF("id", "name"),
      path, "id", Seq("name"), "2024-01-01")
    val before = spark.read.parquet(path).collect().map(_.toString).sorted.toSeq
    // Simulate the crash window: the new content is fully staged but the
    // process dies before any rename touches the live dir. The live
    // table must still read exactly as before, and a later successful
    // run must clear the stale staging.
    val staging = new java.io.File(path + "-snapshot-staging")
    Seq((1L, "b")).toDF("id", "name")
      .withColumn("dbt_valid_from", org.apache.spark.sql.functions.lit("2024-01-02"))
      .withColumn("dbt_valid_to", org.apache.spark.sql.functions.lit(null).cast("string"))
      .write.parquet(staging.getAbsolutePath)
    assert(spark.read.parquet(path).collect().map(_.toString).sorted.toSeq === before,
      "staging a new version must not touch the live table")
    DagRunner.writeSnapshot(spark, Seq((1L, "b")).toDF("id", "name"),
      path, "id", Seq("name"), "2024-01-02")
    val s = spark.read.parquet(path)
    assert(s.count() === 2, "the interrupted change lands on the NEXT successful run")
    assert(!staging.exists() && !new java.io.File(path + "-prev").exists(),
      "publish cleans both the staging and the prev backup dir")
  }
}
