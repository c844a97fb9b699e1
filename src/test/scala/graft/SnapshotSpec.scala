package graft

import org.apache.spark.sql.functions._

import graft.engine.DagRunner

/** dbt snapshot (SCD2 capture, check strategy) semantics:
  * first-run open rows, change detection closing + versioning, new-key
  * insert, unchanged and hard-deleted keys left open, idempotent
  * re-runs, and NULL-vs-empty check-column disambiguation.
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
}
