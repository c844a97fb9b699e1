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

  test("{% set %} list + | join interpolation renders like the reference's incremental model") {
    import spark.implicits._
    val m = SqlModel.fromSqlText("windowed",
      """{% set days = [
        |    'CAST({{ var("today") }} AS STRING)',
        |    'CAST(date_sub({{ var("today") }}, 1) AS STRING)'
        |] %}
        |{{ config(materialized='incremental') }}
        |SELECT d FROM {{ ref('base') }}
        |WHERE d IN ({{ days | join(',') }})""".stripMargin,
      vars = Map("today" -> "DATE '2021-01-20'"))
    val base = Seq("2021-01-18", "2021-01-19", "2021-01-20").toDF("d")
    val out = m.build(spark, Map("base" -> base))
    assert(out.as[String].collect().sorted === Array("2021-01-19", "2021-01-20"))
  }

  test("a join over an undefined list fails at parse time with the defined names listed") {
    val e = intercept[IllegalArgumentException] {
      SqlModel.fromSqlText("m",
        "{% set known = ['a'] %}\nSELECT {{ missing | join(',') }}")
    }
    assert(e.getMessage.contains("missing") && e.getMessage.contains("known"))
  }

  test("extractSetLists strips the block and keeps raw items (var calls intact)") {
    val (lists, rest) = SqlModel.extractSetLists(
      "{% set xs = [ 'a', '{{ var(\"t\") }}' ] %}\nSELECT 1")
    assert(lists === Map("xs" -> Seq("a", "{{ var(\"t\") }}")))
    assert(rest.trim === "SELECT 1")
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

  test("all ten SQL-text models are frame-identical to the compiled builders (full SQL DAG)") {
    SqlReporting.allNames.foreach { n =>
      assertFrameEqual(n, sqlBuilt(n), scalaBuilt(n))
    }
  }
}
