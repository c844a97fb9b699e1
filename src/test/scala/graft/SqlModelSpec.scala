package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.engine.{DagRunner, SqlModel}
import graft.models.{NpoDag, SqlReporting}
import graft.models.testkit.NpoFixtures

/** The SQL-text model frontend: templating unit tests plus the
  * load-bearing equivalence proof — the six reporting models authored as
  * Spark-SQL text must produce FRAME-IDENTICAL output to the compiled
  * `Reporting` builders (which the `dag_*` DuckDB oracle rows pin
  * end-to-end), including the downstream dashboard built on top of them
  * in a mixed Scala/SQL DAG.
  */
class SqlModelSpec extends SparkSpec {

  // ---- templating -------------------------------------------------------

  test("extractRefs finds ref() and source() names in first-appearance order, deduplicated") {
    val sql = """SELECT * FROM {{ ref('b_model') }} JOIN {{ source('raw', 'events') }}
                |JOIN {{ ref('a_model') }} JOIN {{ ref('b_model') }}""".stripMargin
    assert(SqlModel.extractRefs(sql) === Seq("b_model", "events", "a_model"))
  }

  test("fromSqlText builds a runnable model: refs become temp views, vars substitute, config strips") {
    import spark.implicits._
    val m = SqlModel.fromSqlText("doubled",
      """{{ config(materialized='view') }}
        |SELECT id * 2 AS id2 FROM {{ ref('base') }} WHERE id <= {{ var('cap') }}""".stripMargin,
      vars = Map("cap" -> "2"))
    assert(m.refs === Seq("base"))
    val out = m.build(spark, Map("base" -> Seq(1, 2, 3).toDF("id")))
    assert(out.as[Long].collect().sorted === Array(2L, 4L))
  }

  test("a ref name that is not a legal identifier is sanitized into the view name") {
    import spark.implicits._
    val m = SqlModel.fromSqlText("odd",
      "SELECT count(*) AS n FROM {{ ref('360_graden-rapportage.tbl') }}")
    assert(m.refs === Seq("360_graden-rapportage.tbl"))
    val out = m.build(spark, Map("360_graden-rapportage.tbl" -> Seq(1, 2).toDF("x")))
    assert(out.head().getLong(0) === 2L)
  }

  test("an unbound var fails at parse time with the bound names listed") {
    val e = intercept[IllegalArgumentException] {
      SqlModel.fromSqlText("m", "SELECT {{ var('missing') }}", vars = Map("today" -> "1"))
    }
    assert(e.getMessage.contains("missing") && e.getMessage.contains("today"))
  }

  test("SQL-text models participate in DagRunner cycle detection") {
    val a = SqlModel.fromSqlText("a", "SELECT * FROM {{ ref('b') }}")
    val b = SqlModel.fromSqlText("b", "SELECT * FROM {{ ref('a') }}")
    val e = intercept[IllegalArgumentException] { DagRunner.topoSort(Seq(a, b)) }
    assert(e.getMessage.contains("cycle"))
  }

  // ---- equivalence with the compiled (oracle-pinned) builders -----------

  private lazy val fixtures = NpoFixtures.all(spark)
  private lazy val scalaBuilt = DagRunner.run(spark, NpoDag.models(NpoFixtures.today),
    fixtures.apply, tmpWh())
  private lazy val sqlBuilt = DagRunner.run(spark, SqlReporting.dagModels(NpoFixtures.today),
    fixtures.apply, tmpWh())

  private def tmpWh(): String =
    java.nio.file.Files.createTempDirectory("graft_sqlwh").toFile.getAbsolutePath

  private def assertFrameEqual(name: String, sql: DataFrame, scala: DataFrame): Unit = {
    assert(sql.columns.toSeq === scala.columns.toSeq,
      s"$name: SQL-text column names/order must match the compiled builder")
    val order = sql.columns.map(c => col(c).asc_nulls_first)
    val a = sql.orderBy(order: _*).collect()
    val b = scala.orderBy(order: _*).collect()
    assert(a.length === b.length, s"$name: row count differs")
    a.zip(b).zipWithIndex.foreach { case ((ra, rb), i) =>
      (0 until ra.length).foreach { j =>
        (ra.get(j), rb.get(j)) match {
          case (x: Double, y: Double) =>
            assert(x == y || math.abs(x - y) <= 1e-9 * math.max(math.abs(x), math.abs(y)),
              s"$name row $i col ${sql.columns(j)}: $x != $y")
          case (x, y) =>
            assert(x === y, s"$name row $i col ${sql.columns(j)}: $x != $y")
        }
      }
    }
  }

  test("all six reporting models from SQL text are frame-identical to the compiled builders") {
    SqlReporting.names.foreach { n =>
      assertFrameEqual(n, sqlBuilt(n), scalaBuilt(n))
    }
  }

  test("the dashboard built on SQL-text inputs equals the dashboard built on compiled inputs") {
    val n = "integral_reporting_dashboard_channel_weekly"
    assertFrameEqual(n, sqlBuilt(n), scalaBuilt(n))
  }
}
