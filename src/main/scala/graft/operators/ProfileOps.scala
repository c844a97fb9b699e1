package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.dialect.Dialect
import graft.sources.Tables

/** Table profiling ("summarize") — per-column null counts, distinct
  * counts, and portable min/max renderings in ONE aggregation pass over
  * the table. The dbt-profiler / data-catalog / ingest-quality-dashboard
  * shape: a new source lands, the first question is "what's in each
  * column" — answered without N per-column scans.
  *
  * Scale shape: a single `agg` carrying 4 metrics per column. The
  * multi-column exact COUNT(DISTINCT) is Catalyst's Expand rewrite —
  * one shuffle, rows × ncols intermediate; at 100 TB (or very wide
  * tables) pass `approx = true` to swap exact distincts for
  * HyperLogLog `approx_count_distinct`, which drops the Expand and
  * ships one sketch per column per partition. Min/max/null-count are
  * plain mergeable partial aggregates either way. The final unpivot to
  * long form runs on the ONE aggregated row — free at any scale.
  */
object ProfileOps {

  /** Portable cross-engine string rendering of a min/max value: doubles
    * quantize to 2 places first (float formatting differs between
    * engines), timestamps format to whole seconds, everything else
    * relies on the engines' shared integer/date/string casts.
    */
  private def render(c: Column, dt: DataType): Column = dt match {
    case DoubleType | FloatType => Dialect.roundTo(c, 2).cast("string")
    case TimestampType          => date_format(c, "yyyy-MM-dd HH:mm:ss")
    case _                      => c.cast("string")
  }

  /** One-pass profile of every column of `df`:
    * (col_name, n_nulls, n_distinct, min_v, max_v), ordered by name.
    */
  def profile(df: DataFrame, approx: Boolean = false): DataFrame = {
    val fields = df.schema.fields.toSeq
    val aggs = fields.flatMap { f =>
      val c = col(f.name)
      Seq(
        coalesce(sum(when(c.isNull, 1L).otherwise(0L)), lit(0L)).as(s"${f.name}__nulls"),
        (if (approx) approx_count_distinct(c) else countDistinct(c)).as(s"${f.name}__distinct"),
        render(min(c), f.dataType).as(s"${f.name}__min"),
        render(max(c), f.dataType).as(s"${f.name}__max"))
    }
    val one = df.agg(aggs.head, aggs.drop(1): _*)
    val rows = fields.map { f =>
      struct(
        lit(f.name).as("col_name"),
        col(s"${f.name}__nulls").as("n_nulls"),
        col(s"${f.name}__distinct").as("n_distinct"),
        col(s"${f.name}__min").as("min_v"),
        col(s"${f.name}__max").as("max_v"))
    }
    one.select(explode(array(rows: _*)).as("p")).select("p.*").orderBy("col_name")
  }

  /** Profile of `orders` plus one derived nullable column (the fixture
    * tables carry no NULLs, so `nullif` manufactures some — the null
    * path is exercised, not just asserted zero).
    */
  private val profileOrders = QueryDef(
    "s22_profile",
    (s, dir) =>
      profile(Tables.load(s, dir, "orders")
        .withColumn("status_nullable", expr("nullif(o_orderstatus, 'O')"))),
    Some("""WITH t AS (
           |  SELECT *, nullif(o_orderstatus, 'O') AS status_nullable FROM orders)
           |SELECT * FROM (
           |  SELECT 'o_orderkey' AS col_name,
           |    CAST(count(*) - count(o_orderkey) AS BIGINT) AS n_nulls,
           |    CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
           |    CAST(min(o_orderkey) AS VARCHAR) AS min_v,
           |    CAST(max(o_orderkey) AS VARCHAR) AS max_v FROM t
           |  UNION ALL
           |  SELECT 'o_custkey', CAST(count(*) - count(o_custkey) AS BIGINT),
           |    CAST(count(DISTINCT o_custkey) AS BIGINT),
           |    CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR) FROM t
           |  UNION ALL
           |  SELECT 'o_orderstatus', CAST(count(*) - count(o_orderstatus) AS BIGINT),
           |    CAST(count(DISTINCT o_orderstatus) AS BIGINT),
           |    CAST(min(o_orderstatus) AS VARCHAR), CAST(max(o_orderstatus) AS VARCHAR) FROM t
           |  UNION ALL
           |  SELECT 'o_totalprice', CAST(count(*) - count(o_totalprice) AS BIGINT),
           |    CAST(count(DISTINCT o_totalprice) AS BIGINT),
           |    CAST(floor(min(o_totalprice) * 100 + 0.5) / 100 AS VARCHAR),
           |    CAST(floor(max(o_totalprice) * 100 + 0.5) / 100 AS VARCHAR) FROM t
           |  UNION ALL
           |  SELECT 'o_orderdate', CAST(count(*) - count(o_orderdate) AS BIGINT),
           |    CAST(count(DISTINCT o_orderdate) AS BIGINT),
           |    strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S'),
           |    strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S') FROM t
           |  UNION ALL
           |  SELECT 'o_orderpriority', CAST(count(*) - count(o_orderpriority) AS BIGINT),
           |    CAST(count(DISTINCT o_orderpriority) AS BIGINT),
           |    CAST(min(o_orderpriority) AS VARCHAR), CAST(max(o_orderpriority) AS VARCHAR) FROM t
           |  UNION ALL
           |  SELECT 'status_nullable', CAST(count(*) - count(status_nullable) AS BIGINT),
           |    CAST(count(DISTINCT status_nullable) AS BIGINT),
           |    CAST(min(status_nullable) AS VARCHAR), CAST(max(status_nullable) AS VARCHAR) FROM t
           |) ORDER BY col_name""".stripMargin))

  val all: Seq[QueryDef] = Seq(profileOrders)
}
