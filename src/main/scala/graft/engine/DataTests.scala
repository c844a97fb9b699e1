package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.QueryDef
import graft.sources.Tables

/** dbt's four built-in generic data tests — `unique`, `not_null`,
  * `accepted_values`, `relationships` — as engine-level checks. The
  * reference project declares no tests (its `sources.yml` carries only
  * source routing), but the generic tests are part of dbt's standard
  * surface (dbt-core's generic_test_sql macros): a user switching
  * their project to this engine keeps their schema tests.
  *
  * Violation semantics mirror the SQL dbt generates:
  *  - unique: number of KEY VALUES occurring more than once
  *    (`GROUP BY ... HAVING count(*) > 1`, counted);
  *  - not_null: number of rows with a NULL in the column;
  *  - accepted_values: number of DISTINCT values outside the list;
  *  - relationships: number of child ROWS whose non-NULL key has no
  *    parent (NULL child keys are not violations, as in dbt).
  *
  * Scale shape: every check is one aggregate or one left-anti join —
  * no check materializes violating rows into the summary (each probe
  * reduces to a single count before the union), so a failing test on a
  * 100 TB model costs one scan + one shuffle, and the summary is
  * |checks| rows. The anti-join's parent side is the DISTINCT key set
  * (vocabulary-sized, broadcastable when small).
  */
object DataTests {

  sealed trait Check
  final case class Unique(model: String, columns: Seq[String]) extends Check
  final case class NotNull(model: String, column: String) extends Check
  final case class AcceptedValues(model: String, column: String, values: Seq[String]) extends Check
  final case class Relationships(childModel: String, childColumn: String,
      parentModel: String, parentColumn: String) extends Check

  /** One summary row per check: (test, model, column, n_violations).
    * `resolve` maps a model name to its DataFrame (a `Tables.load`
    * closure in the oracle row; `DagRunner` output readers in a real
    * project). An empty check list yields an empty summary (zero rows,
    * same schema) — not a crash — so a build gate can be wired up
    * before any tests are declared.
    */
  def run(resolve: String => DataFrame, checks: Seq[Check]): DataFrame = {
    def row(test: String, model: String, column: String, n: Column, df: DataFrame): DataFrame =
      df.agg(coalesce(n, lit(0L)).as("n_violations"))
        .select(lit(test).as("test"), lit(model).as("model"),
          lit(column).as("column"), col("n_violations"))
    if (checks.isEmpty) {
      val s = SparkSession.active
      return s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "test STRING, model STRING, column STRING, n_violations BIGINT"))
    }
    val frames = checks.map {
      case Unique(m, cols) =>
        // dbt's generated unique-test SQL filters `where col is not null`
        // before grouping: NULL key values are never uniqueness
        // violations (they get their own not_null test if required).
        val dupKeys = resolve(m)
          .filter(cols.map(col(_).isNotNull).reduce(_ && _))
          .groupBy(cols.map(col): _*)
          .agg(count(lit(1)).as("cnt")).filter(col("cnt") > 1)
        row("unique", m, cols.mkString(","), count(lit(1)), dupKeys)
      case NotNull(m, c) =>
        row("not_null", m, c,
          sum(when(col(c).isNull, 1L).otherwise(0L)), resolve(m))
      case AcceptedValues(m, c, vs) =>
        val bad = resolve(m).select(col(c).cast("string").as("v"))
          .filter(col("v").isNotNull && !col("v").isin(vs: _*)).distinct()
        row("accepted_values", m, c, count(lit(1)), bad)
      case Relationships(cm, cc, pm, pc) =>
        val orphans = resolve(cm).select(col(cc).as("k")).filter(col("k").isNotNull)
          .join(resolve(pm).select(col(pc).as("k")).distinct(), Seq("k"), "left_anti")
        row("relationships", cm, s"$cc->$pm.$pc", count(lit(1)), orphans)
    }
    frames.reduce(_.unionAll(_)).orderBy("test", "model", "column")
  }

  /** The oracle row: the four generic tests over the fixture warehouse,
    * with both passing checks (TPC-H integrity holds by construction)
    * and deliberately failing ones (`events.event_type` has 5 values,
    * `events.user_id` repeats) so the violation counts are exercised,
    * not just zeros.
    */
  private val schemaTests = QueryDef(
    "s17_schema_tests",
    (s, dir) => run(Tables.load(s, dir, _), Seq(
      Unique("orders", Seq("o_orderkey")),
      Unique("events", Seq("user_id")),
      NotNull("lineitem", "l_orderkey"),
      AcceptedValues("lineitem", "l_returnflag", Seq("A", "N", "R")),
      AcceptedValues("events", "event_type", Seq("view", "click", "purchase")),
      Relationships("lineitem", "l_orderkey", "orders", "o_orderkey"))),
    Some("""SELECT * FROM (
           |  SELECT 'unique' AS test, 'orders' AS model, 'o_orderkey' AS "column",
           |    (SELECT count(*) FROM (SELECT o_orderkey FROM orders
           |      WHERE o_orderkey IS NOT NULL
           |      GROUP BY 1 HAVING count(*) > 1)) AS n_violations
           |  UNION ALL
           |  SELECT 'unique', 'events', 'user_id',
           |    (SELECT count(*) FROM (SELECT user_id FROM events
           |      WHERE user_id IS NOT NULL
           |      GROUP BY 1 HAVING count(*) > 1))
           |  UNION ALL
           |  SELECT 'not_null', 'lineitem', 'l_orderkey',
           |    (SELECT count(*) FROM lineitem WHERE l_orderkey IS NULL)
           |  UNION ALL
           |  SELECT 'accepted_values', 'lineitem', 'l_returnflag',
           |    (SELECT count(*) FROM (SELECT DISTINCT CAST(l_returnflag AS VARCHAR) AS v
           |      FROM lineitem WHERE l_returnflag IS NOT NULL) WHERE v NOT IN ('A', 'N', 'R'))
           |  UNION ALL
           |  SELECT 'accepted_values', 'events', 'event_type',
           |    (SELECT count(*) FROM (SELECT DISTINCT CAST(event_type AS VARCHAR) AS v
           |      FROM events WHERE event_type IS NOT NULL)
           |     WHERE v NOT IN ('view', 'click', 'purchase'))
           |  UNION ALL
           |  SELECT 'relationships', 'lineitem', 'l_orderkey->orders.o_orderkey',
           |    (SELECT count(*) FROM lineitem l WHERE l_orderkey IS NOT NULL
           |      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)))
           |ORDER BY test, model, "column"""".stripMargin))

  val all: Seq[QueryDef] = Seq(schemaTests)
}
