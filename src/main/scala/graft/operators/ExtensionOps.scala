package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dialect.Dialect._
import graft.sources.Tables

/** Relational-completeness extensions beyond the reference's own SQL
  * surface: the navigation-window family (LAG/LEAD/FIRST_VALUE/
  * NTH_VALUE), INTERSECT/EXCEPT set semantics, and UNPIVOT (melt).
  * The reference never needs these (SURVEY.md §2.5/§2.7 list what it
  * uses), but an engine a warehouse user can "switch to" must carry
  * them — each row here is oracle-checked against DuckDB.
  *
  * Scale notes: the navigation windows are one shuffle on the partition
  * key plus a sorted pass (same shape as `a12_sessionize_batch`);
  * INTERSECT/EXCEPT plan as aggregate + left-semi/anti joins on the
  * distinct sets (no cartesian anything); UNPIVOT is a pure map-side
  * Expand — 4× the rows, zero shuffle until the downstream aggregate's
  * partial combine shrinks it to one row per measure per partition.
  */
object ExtensionOps {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** W9: the navigation-window family over the event log, per user in
    * (ts, event_id) order. `lag` with an explicit default, a 2-back
    * `lag`, `lead` on a different column, and running-frame
    * `first_value`/`nth_value` (ROWS UNBOUNDED PRECEDING..CURRENT ROW
    * in BOTH engines — nth_value's default frame would otherwise
    * differ). The oracle truncates ts to microseconds (CAST AS
    * TIMESTAMP) to match Spark's parquet ns→µs read, same as the
    * `a12_sessionize_batch` oracle.
    */
  private val lagLead = QueryDef(
    "w9_lag_lead",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("value"),
          lag("value", 1).over(w).as("prev_value"),
          lag("value", 2, -1.0).over(w).as("prev2_value"),
          lead("event_type", 1).over(w).as("next_type"),
          first("value").over(run).as("first_val"),
          nth_value(col("value"), 2).over(run).as("second_val"))
        .orderBy("user_id", "event_id")
    },
    Some("""WITH e AS (
           |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value, event_type
           |  FROM events)
           |SELECT user_id, event_id, value,
           |  lag(value, 1) OVER w AS prev_value,
           |  lag(value, 2, -1.0) OVER w AS prev2_value,
           |  lead(event_type, 1) OVER w AS next_type,
           |  first_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_val,
           |  nth_value(value, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_val
           |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
           |ORDER BY user_id, event_id""".stripMargin))

  /** U3: INTERSECT / EXCEPT (both DISTINCT semantics, per the SQL
    * default) over year-over-year active-customer sets — retained vs
    * churned customers, tagged and stacked into one result. Catalyst
    * plans these as aggregate + left-semi / left-anti joins on the
    * deduplicated sides; both sides partition on the same key, so at
    * scale this is one shuffle each, no N×M anything.
    */
  private val setOps = QueryDef(
    "u3_intersect_except",
    (s, dir) => {
      val o = t(s, dir, "orders")
      def activeIn(y: Int) =
        o.filter(year(col("o_orderdate")) === y).select("o_custkey").distinct()
      val y95 = activeIn(1995)
      val y96 = activeIn(1996)
      y95.intersect(y96).withColumn("op", lit("retained"))
        .unionAll(y95.except(y96).withColumn("op", lit("churned")))
        .select("op", "o_custkey")
        .orderBy("op", "o_custkey")
    },
    Some("""SELECT 'retained' AS op, o_custkey FROM (
           |  SELECT o_custkey FROM orders WHERE extract(year FROM o_orderdate) = 1995
           |  INTERSECT
           |  SELECT o_custkey FROM orders WHERE extract(year FROM o_orderdate) = 1996)
           |UNION ALL
           |SELECT 'churned' AS op, o_custkey FROM (
           |  SELECT o_custkey FROM orders WHERE extract(year FROM o_orderdate) = 1995
           |  EXCEPT
           |  SELECT o_custkey FROM orders WHERE extract(year FROM o_orderdate) = 1996)
           |ORDER BY op, o_custkey""".stripMargin))

  /** P9: UNPIVOT (melt) — the four lineitem measures into long form via
    * the native `Dataset.unpivot` (plans as a map-side Expand, no
    * shuffle), then a per-measure aggregate so the result stays
    * bounded at any corpus size. The oracle is the portable UNION ALL
    * formulation of the same melt.
    */
  private val unpivotMelt = QueryDef(
    "p9_unpivot",
    (s, dir) => t(s, dir, "lineitem")
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax")),
        "measure", "value")
      .groupBy("measure")
      .agg(count(lit(1)).as("n"),
        roundTo(avg("value"), 4).as("avg_value"),
        roundTo(max("value"), 4).as("max_value"))
      .orderBy("measure"),
    Some("""SELECT measure, count(*) AS n,
           |  floor(avg(value) * 10000.0 + 0.5) / 10000.0 AS avg_value,
           |  floor(max(value) * 10000.0 + 0.5) / 10000.0 AS max_value
           |FROM (
           |  SELECT 'l_quantity' AS measure, l_quantity AS value FROM lineitem
           |  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
           |  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
           |  UNION ALL SELECT 'l_tax', l_tax FROM lineitem)
           |GROUP BY measure ORDER BY measure""".stripMargin))

  val all: Seq[QueryDef] = Seq(lagLead, setOps, unpivotMelt)
}
