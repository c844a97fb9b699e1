package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev profiling main for the file-frontend fixed cost (VERDICT r12 #4):
  * decompose a dag_pkg_* row into ProjectLoader.load / DagRunner.run /
  * query-execution time. Usage: runMain graft.tools.PkgProfile <sfDir> <model>
  */
object PkgProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val model = args.lift(1).getOrElse("orders_dateparts")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Paths.get("fixtures/pkg_project")
    (1 to 3).foreach { i =>
      var t0 = System.nanoTime()
      val proj = graft.engine.ProjectLoader.load(spark, dir)
      val tLoad = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val built = graft.engine.DagRunner.run(spark, proj.models,
        n => graft.sources.Tables.load(spark, sfDir, n.stripPrefix("tpch.")))
      val tRun = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      built(model).write.format("noop").mode("overwrite").save()
      val tExec = (System.nanoTime() - t0) / 1e9
      println(f"[$i] load=$tLoad%.3f run=$tRun%.3f exec=$tExec%.3f total=${tLoad + tRun + tExec}%.3f")
    }
    spark.stop()
  }
}
