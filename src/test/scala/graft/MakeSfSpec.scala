package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.tools.MakeSf

/** The 10× bench-data generator must scale fact tables by `copies`
  * while PRESERVING per-copy join selectivity — a key domain that
  * shifts on one side but not the other would silently turn the scaled
  * bench into a join-miss benchmark.
  */
class MakeSfSpec extends SparkSpec {

  private val src = "/root/testdata/sf0.001"

  test("MakeSf scales facts by copies, keeps dims fixed, preserves join selectivity") {
    val dst = java.nio.file.Files.createTempDirectory("graft-makesf").toString
    try {
      MakeSf.run(spark, src, dst, copies = 2)

      def n(dir: String, t: String): Long = Tables.load(spark, dir, t).count()
      assert(n(dst, "orders") === 2 * n(src, "orders"))
      assert(n(dst, "lineitem") === 2 * n(src, "lineitem"))
      assert(n(dst, "documents") === 2 * n(src, "documents"))
      assert(n(dst, "nation") === n(src, "nation"), "dims must not scale")
      assert(n(dst, "region") === n(src, "region"), "dims must not scale")

      // Join domains shift together: the scaled join yields exactly
      // copies× the base join (no cross-copy matches, no misses).
      def joined(dir: String): Long =
        Tables.load(spark, dir, "orders").join(
          Tables.load(spark, dir, "customer"),
          col("o_custkey") === col("c_custkey")).count()
      assert(joined(dst) === 2 * joined(src))
      def evJoined(dir: String): Long =
        Tables.load(spark, dir, "events").join(
          Tables.load(spark, dir, "customer"),
          col("user_id") === col("c_custkey")).count()
      assert(evJoined(dst) === 2 * evJoined(src))

      // Texts are verbatim: every doc has exactly one twin at copies=2.
      val twins = Tables.load(spark, dst, "documents")
        .groupBy("text").count().select("count").distinct()
        .collect().map(_.getLong(0)).toSet
      // (base data may itself contain duplicate texts, so counts are
      // multiples of copies — never odd)
      assert(twins.forall(_ % 2 == 0), s"per-text counts must be 2x base: $twins")

      // The re-materialized events table round-trips through Tables.load
      // (the ts conversion gates on type, not name).
      assert(Tables.load(spark, dst, "events").schema("ts").dataType ===
        org.apache.spark.sql.types.TimestampType)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dst))
    }
  }
}
