package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.engine.DagRunner
import graft.models.NpoDag
import graft.models.testkit.NpoFixtures

/** The `dbt run` equivalent: materialize the full 13-model reference DAG.
  *
  * Usage:
  *   runMain graft.tools.RunDag --demo
  *     runs over the built-in deterministic fixtures into a temp
  *     warehouse and prints per-model row counts + a dashboard sample.
  *   runMain graft.tools.RunDag <sourcesDir> <warehouse> [todayYYYY-MM-DD]
  *     reads each source as <sourcesDir>/<name>.parquet (names per
  *     `NpoDag.sources`) and materializes into <warehouse>.
  *   Add --threads N to materialize ready models concurrently
  *     (dbt's `threads:` — `DagRunner.runParallel`).
  */
object RunDag {
  def main(args0: Array[String]): Unit = {
    val threads = args0.sliding(2).collectFirst {
      case Array("--threads", n) => n.toInt
    }.getOrElse(1)
    val args = {
      val a = args0.toSeq
      val i = a.indexOf("--threads")
      (if (i >= 0) a.patch(i, Nil, 2) else a).toArray
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val (resolve, warehouse, today) =
      if (args.headOption.contains("--demo")) {
        val fixtures = NpoFixtures.all(spark)
        val wh = Files.createTempDirectory("graft_demo_wh").toFile.getAbsolutePath
        (fixtures.apply _, wh, NpoFixtures.today)
      } else {
        val Array(src, wh) = args.take(2)
        val today = args.lift(2).map(java.sql.Date.valueOf)
          .getOrElse(new java.sql.Date(System.currentTimeMillis()))
        ((n: String) => spark.read.parquet(s"$src/$n.parquet"), wh, today)
      }

    val built: Map[String, DataFrame] =
      if (threads > 1)
        DagRunner.runParallel(spark, NpoDag.models(today), resolve, warehouse, threads)
      else DagRunner.run(spark, NpoDag.models(today), resolve, warehouse)
    built.toSeq.sortBy(_._1).foreach { case (name, df) =>
      println(f"[rundag] $name%-45s ${df.count()}%8d rows")
    }
    println(s"[rundag] warehouse: $warehouse")
    built("integral_reporting_dashboard_channel_weekly")
      .orderBy("Naam", "weekdate", "reporting_channel")
      .show(10, truncate = false)
    spark.stop()
  }
}
