package graft.models.testkit

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.engine.DagRunner
import graft.models.NpoDag

/** Persist the NPO fixtures (and every DAG model output) as parquet so
  * the DAG models can be ORACLE-checked end-to-end: the Spark side and
  * the DuckDB oracle read the SAME files, making each model's transform
  * independently verifiable (compositional coverage of all 13 models —
  * VERDICT r2 "Next round" item 1).
  *
  * Layout under [[dir]]:
  *   - `src_<source>.parquet`   — the 11 external source tables
  *   - `model_<model>.parquet`  — each materialized model output (inputs
  *     for downstream models' oracles)
  *
  * Writes are guarded by a version marker so repeated `Verify`/`Bench`
  * runs skip the rebuild; bump [[version]] whenever fixture CONTENT or a
  * model definition changes shape.
  */
object NpoParquet {

  /** Absolute on purpose: the DuckDB oracle SQL must name the same files
    * from whatever working directory the driver uses.
    */
  val dir: String = "/root/repo/fixtures/npo"

  val version: String = "v2"

  def src(name: String): String = s"$dir/src_$name.parquet"
  def model(name: String): String = s"$dir/model_$name.parquet"

  @volatile private var checked = false

  /** Idempotently write fixtures + model outputs; returns [[dir]]. */
  def ensure(spark: SparkSession): String = synchronized {
    val marker = Paths.get(s"$dir/_GRAFT_FIXTURES_$version")
    if (checked || Files.exists(marker)) { checked = true; return dir }
    val fixtures = NpoFixtures.all(spark)
    fixtures.foreach { case (name, df) =>
      df.coalesce(1).write.mode("overwrite").parquet(src(name))
    }
    // Run the full DAG off the just-written source parquet (not the
    // in-memory frames) so every model output derives from the same
    // bytes the oracles read.
    val built = DagRunner.run(spark, NpoDag.models(NpoFixtures.today),
      name => spark.read.parquet(src(name)), s"$dir/warehouse")
    built.foreach { case (name, df) =>
      df.coalesce(1).write.mode("overwrite").parquet(model(name))
    }
    Files.createFile(marker)
    checked = true
    dir
  }
}
