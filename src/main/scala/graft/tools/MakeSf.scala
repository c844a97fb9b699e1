package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Scale-up generator for bench-only data: writes `copies`× the source
  * scale factor by unioning key-shifted copies (stride 1e9 per copy, far
  * above any real key). Key shifts are applied consistently across every
  * table of a join domain — orders.o_custkey, customer.c_custkey, and
  * events.user_id all shift together — so join selectivity per copy is
  * preserved and the result behaves like a genuinely larger dataset, not
  * ten disjoint ones. Dimension tables (nation/region) are NOT scaled,
  * matching how dims grow in real warehouses. Texts and embeddings are
  * kept verbatim, so each document gains copies−1 exact twins: at 10×
  * the near-dup candidate graph crosses the CC local-tier threshold and
  * the bench exercises the distributed large-star/small-star loop.
  *
  * Usage: runMain graft.tools.MakeSf <srcSfDir> <dstDir> <copies>
  * (bench data only — no oracle covers the scaled output.)
  */
object MakeSf {
  val stride = 1000000000L

  def main(args: Array[String]): Unit = {
    val (src, dst, copies) = (args(0), args(1), args(2).toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, src, dst, copies)
    spark.stop()
  }

  def run(spark: SparkSession, src: String, dst: String, copies: Int): Unit = {

    def write(name: String, keys: Seq[String]): Unit = {
      val base = Tables.load(spark, src, name)
      val out =
        if (keys.isEmpty) base
        else (0 until copies).map { k =>
          keys.foldLeft(base)((df, c) => df.withColumn(c, col(c) + lit(k * stride)))
        }.reduce(_ unionAll _)
      out.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[makesf] $name: ${if (keys.isEmpty) "dim copy" else s"${copies}x on ${keys.mkString(",")}"}")
    }

    write("region", Nil)
    write("nation", Nil)
    write("customer", Seq("c_custkey"))
    write("supplier", Seq("s_suppkey"))
    write("part", Seq("p_partkey"))
    write("orders", Seq("o_orderkey", "o_custkey"))
    write("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))
    write("events", Seq("event_id", "user_id"))
    write("documents", Seq("doc_id"))
    write("embeddings", Seq("vec_id"))
  }
}
