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

  /** Profile of every column of `df`:
    * (col_name, n_nulls, n_distinct, min_v, max_v), ordered by name.
    *
    * approx = true (the 100 TB shape) stays ONE aggregation pass: HLL
    * sketches are mergeable partials, so N approx distincts + min/max/
    * nulls ride a single Expand-free global agg.
    *
    * approx = false: N exact countDistinct in one agg is Catalyst's
    * Expand rewrite — rows × N duplicated, then a full-width SORT
    * (min/max over strings forces SortAggregate) before the shuffle.
    * Measured at sf0.1 that sort of the 8×-expanded table dominated the
    * row (4.6 s). Restructured (optimization round 14, guide §2.3/§2.4
    * — shuffle fewer bytes, remove the sort): nulls/min/max ride one
    * global agg (single group — no sort, no Expand), and each column's
    * exact distinct is its OWN single-distinct aggregate over a
    * column-pruned scan (a one-distinct Aggregate never rewrites
    * through Expand; partial dedup happens map-side so only distinct
    * values shuffle). Parquet is columnar, so the N per-column scans
    * read the same total bytes as the one wide scan. The N+1 subtrees
    * are independent and their stages overlap inside the one job. Same
    * rows, same oracle — s22c's exact side proved this shape ~4× faster.
    */
  def profile(df: DataFrame, approx: Boolean = false): DataFrame = {
    val fields = df.schema.fields.toSeq
    if (approx) {
      val aggs = fields.flatMap { f =>
        val c = col(f.name)
        Seq(
          coalesce(sum(when(c.isNull, 1L).otherwise(0L)), lit(0L)).as(s"${f.name}__nulls"),
          approx_count_distinct(c).as(s"${f.name}__distinct"),
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
    } else {
      base(df).join(broadcast(exactDistincts(df)), "col_name")
        .select("col_name", "n_nulls", "n_distinct", "min_v", "max_v")
        .orderBy("col_name")
    }
  }

  /** Long-form (col_name, n_nulls, min_v, max_v) from ONE global agg —
    * a single group, so no sort and no Expand regardless of types.
    */
  private def base(df: DataFrame): DataFrame = {
    val fields = df.schema.fields.toSeq
    val aggs = fields.flatMap { f =>
      val c = col(f.name)
      Seq(
        coalesce(sum(when(c.isNull, 1L).otherwise(0L)), lit(0L)).as(s"${f.name}__nulls"),
        render(min(c), f.dataType).as(s"${f.name}__min"),
        render(max(c), f.dataType).as(s"${f.name}__max"))
    }
    val one = df.agg(aggs.head, aggs.drop(1): _*)
    val rows = fields.map { f =>
      struct(
        lit(f.name).as("col_name"),
        col(s"${f.name}__nulls").as("n_nulls"),
        col(s"${f.name}__min").as("min_v"),
        col(s"${f.name}__max").as("max_v"))
    }
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
  }

  /** (col_name, n_distinct) — one single-distinct aggregate per column
    * (Expand-free: map-side dedup, only distinct values shuffle), the 7
    * one-row results unioned. The s22c exact-side shape, shared.
    */
  private def exactDistincts(df: DataFrame): DataFrame =
    df.schema.fields.toSeq.map { f =>
      df.agg(countDistinct(col(f.name)).as("n_distinct"))
        .select(lit(f.name).as("col_name"), col("n_distinct"))
    }.reduce(_.unionAll(_))

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

  /** Tolerance harness for the approx profile: per column, the HLL
    * estimate (rsd 0.02) must land within 3·rsd of the exact distinct
    * count. The exact count — and its Expand — exist ONLY in this
    * oracle-harness row (a3b precedent); the production shape is
    * [[profile]] with `approx = true` alone, benchmarked as
    * `s22c_profile_approx_prod` and plan-locked Expand-free in
    * `PlanAuditSpec`.
    */
  private def profileTolerance(df: DataFrame, rsd: Double): DataFrame = {
    val fields = df.schema.fields.toSeq
    // Three independent Expand-free passes (optimization round 14,
    // guide §2.3/§2.4 — the previous shape's exact pass was the
    // Expand + full-width-sort multi-distinct, measured 3.5 s at
    // sf0.1): nulls/min/max ride one global agg, each exact distinct
    // is its own single-distinct column-pruned aggregate, and the HLL
    // pass keeps its one-agg sketch shape (the production plan). The
    // per-column 1-row frames broadcast-join on col_name.
    val approxAggs = fields.map { f =>
      approx_count_distinct(col(f.name), rsd).as(s"${f.name}__approx")
    }
    val one = df.agg(approxAggs.head, approxAggs.drop(1): _*)
    val approxRows = fields.map { f =>
      struct(lit(f.name).as("col_name"), col(s"${f.name}__approx").as("n_approx"))
    }
    val approxLong = one.select(explode(array(approxRows: _*)).as("p")).select("p.*")
    base(df).join(broadcast(exactDistincts(df)), "col_name")
      .join(broadcast(approxLong), "col_name")
      .select(
        col("col_name"),
        col("n_nulls"),
        col("n_distinct"),
        (abs(col("n_approx") - col("n_distinct")) <=
          col("n_distinct") * lit(3 * rsd)).as("distinct_ok"),
        col("min_v"),
        col("max_v"))
      .orderBy("col_name")
  }

  private val profileApprox = QueryDef(
    "s22b_profile_approx",
    (s, dir) => profileTolerance(Tables.load(s, dir, "orders"), 0.02),
    Some("""SELECT * FROM (
           |  SELECT 'o_orderkey' AS col_name,
           |    CAST(count(*) - count(o_orderkey) AS BIGINT) AS n_nulls,
           |    CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
           |    true AS distinct_ok,
           |    CAST(min(o_orderkey) AS VARCHAR) AS min_v,
           |    CAST(max(o_orderkey) AS VARCHAR) AS max_v FROM orders
           |  UNION ALL
           |  SELECT 'o_custkey', CAST(count(*) - count(o_custkey) AS BIGINT),
           |    CAST(count(DISTINCT o_custkey) AS BIGINT), true,
           |    CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR) FROM orders
           |  UNION ALL
           |  SELECT 'o_orderstatus', CAST(count(*) - count(o_orderstatus) AS BIGINT),
           |    CAST(count(DISTINCT o_orderstatus) AS BIGINT), true,
           |    CAST(min(o_orderstatus) AS VARCHAR), CAST(max(o_orderstatus) AS VARCHAR) FROM orders
           |  UNION ALL
           |  SELECT 'o_totalprice', CAST(count(*) - count(o_totalprice) AS BIGINT),
           |    CAST(count(DISTINCT o_totalprice) AS BIGINT), true,
           |    CAST(floor(min(o_totalprice) * 100 + 0.5) / 100 AS VARCHAR),
           |    CAST(floor(max(o_totalprice) * 100 + 0.5) / 100 AS VARCHAR) FROM orders
           |  UNION ALL
           |  SELECT 'o_orderdate', CAST(count(*) - count(o_orderdate) AS BIGINT),
           |    CAST(count(DISTINCT o_orderdate) AS BIGINT), true,
           |    strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S'),
           |    strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S') FROM orders
           |  UNION ALL
           |  SELECT 'o_orderpriority', CAST(count(*) - count(o_orderpriority) AS BIGINT),
           |    CAST(count(DISTINCT o_orderpriority) AS BIGINT), true,
           |    CAST(min(o_orderpriority) AS VARCHAR), CAST(max(o_orderpriority) AS VARCHAR) FROM orders
           |) ORDER BY col_name""".stripMargin))

  /** The production approx profile, band-validated (VERDICT r12 #2): the
    * sketch pass is [[profile]] with `approx = true` — one Expand-free
    * aggregation, the 100 TB plan — and the row turns its engine-specific
    * HLL estimates into an oracle-checkable boolean by banding each one
    * against an exact distinct count. The exact side deliberately does
    * NOT reintroduce the Expand: each column gets its OWN single-distinct
    * aggregate over a column-pruned scan (a one-distinct Aggregate never
    * rewrites through Expand), and the 7 one-row results union into a
    * 7-row frame that broadcast-joins the profile. n_nulls/min_v/max_v
    * pass through from the production pass exact and unchanged, so the
    * oracle pins them value-for-value; `distinct_ok` pins the 3·rsd band
    * (rsd = 0.05, `approx_count_distinct`'s default).
    */
  private def profileValidated(df: DataFrame, rsd: Double = 0.05): DataFrame = {
    val prod = profile(df, approx = true)
    val exact = exactDistincts(df).withColumnRenamed("n_distinct", "n_exact")
    prod.join(broadcast(exact), "col_name")
      .select(
        col("col_name"),
        col("n_nulls"),
        (abs(col("n_distinct") - col("n_exact")) <= col("n_exact") * lit(3 * rsd))
          .as("distinct_ok"),
        col("min_v"),
        col("max_v"))
      .orderBy("col_name")
  }

  private val profileApproxProd = QueryDef(
    "s22c_profile_approx_prod",
    (s, dir) => profileValidated(Tables.load(s, dir, "orders")),
    Some("""SELECT * FROM (
           |  SELECT 'o_orderkey' AS col_name,
           |    CAST(count(*) - count(o_orderkey) AS BIGINT) AS n_nulls,
           |    true AS distinct_ok,
           |    CAST(min(o_orderkey) AS VARCHAR) AS min_v,
           |    CAST(max(o_orderkey) AS VARCHAR) AS max_v FROM orders
           |  UNION ALL
           |  SELECT 'o_custkey', CAST(count(*) - count(o_custkey) AS BIGINT), true,
           |    CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR) FROM orders
           |  UNION ALL
           |  SELECT 'o_orderstatus', CAST(count(*) - count(o_orderstatus) AS BIGINT), true,
           |    CAST(min(o_orderstatus) AS VARCHAR), CAST(max(o_orderstatus) AS VARCHAR) FROM orders
           |  UNION ALL
           |  SELECT 'o_totalprice', CAST(count(*) - count(o_totalprice) AS BIGINT), true,
           |    CAST(floor(min(o_totalprice) * 100 + 0.5) / 100 AS VARCHAR),
           |    CAST(floor(max(o_totalprice) * 100 + 0.5) / 100 AS VARCHAR) FROM orders
           |  UNION ALL
           |  SELECT 'o_orderdate', CAST(count(*) - count(o_orderdate) AS BIGINT), true,
           |    strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S'),
           |    strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S') FROM orders
           |  UNION ALL
           |  SELECT 'o_orderpriority', CAST(count(*) - count(o_orderpriority) AS BIGINT), true,
           |    CAST(min(o_orderpriority) AS VARCHAR), CAST(max(o_orderpriority) AS VARCHAR) FROM orders
           |) ORDER BY col_name""".stripMargin))

  val all: Seq[QueryDef] = Seq(profileOrders, profileApprox, profileApproxProd)

  /** Incrementally-maintained profile state — the ingest-time
    * data-quality monitor. Each arriving batch contributes one tiny
    * per-column PARTIALS row-set (counts, typed min/max, a DataSketches
    * HLL sketch for distincts); the merged profile of everything
    * ingested so far is an aggregation over the partials table — the
    * raw data is never rescanned. All partial metrics are mergeable and
    * order-insensitive (sums, min/max, HLL register maxima), so any
    * batch split of the same rows converges to the SAME profile.
    *
    * Crash/replay discipline: partials land under a `batch_id=N`
    * partition via staged rename-swap — a replayed micro-batch sees its
    * partition already published and no-ops, a crashed half-write
    * leaves only a staging dir that the retry clears. Effectively-once
    * state over at-least-once foreachBatch delivery, same argument as
    * the index-maintenance sinks.
    */
  object ProfileState {

    /** Typed views: numerics/timestamps range in a double pair, strings
      * in a string pair (a single string-rendered pair would order
      * "10" < "9"); the HLL sketch input is long/string (the sketch
      * aggregate's supported inputs — doubles and dates sketch their
      * canonical string form).
      */
    private def numView(c: Column, dt: DataType): Column = dt match {
      case TimestampType  => unix_micros(c).cast("double")
      case _: NumericType => c.cast("double")
      case _              => lit(null).cast("double")
    }
    private def strView(c: Column, dt: DataType): Column = dt match {
      case StringType => c
      case DateType   => c.cast("string")
      case _          => lit(null).cast("string")
    }
    private def sketchView(c: Column, dt: DataType): Column = dt match {
      case StringType                                     => c
      case ByteType | ShortType | IntegerType | LongType  => c.cast("long")
      case TimestampType                                  => unix_micros(c)
      case _                                              => c.cast("string")
    }

    /** One partial-profile row per column of `batch`:
      * (col_name, n_rows, n_nulls, min_num, max_num, min_str, max_str, hll).
      */
    def partials(batch: DataFrame): DataFrame = {
      val fields = batch.schema.fields.toSeq
      val aggs = fields.flatMap { f =>
        val c = col(f.name)
        Seq(
          count(lit(1)).as(s"${f.name}__rows"),
          coalesce(sum(when(c.isNull, 1L).otherwise(0L)), lit(0L)).as(s"${f.name}__nulls"),
          min(numView(c, f.dataType)).as(s"${f.name}__minn"),
          max(numView(c, f.dataType)).as(s"${f.name}__maxn"),
          min(strView(c, f.dataType)).as(s"${f.name}__mins"),
          max(strView(c, f.dataType)).as(s"${f.name}__maxs"),
          hll_sketch_agg(sketchView(c, f.dataType), 12).as(s"${f.name}__hll"))
      }
      val one = batch.agg(aggs.head, aggs.drop(1): _*)
      val rows = fields.map { f =>
        struct(
          lit(f.name).as("col_name"),
          col(s"${f.name}__rows").as("n_rows"),
          col(s"${f.name}__nulls").as("n_nulls"),
          col(s"${f.name}__minn").as("min_num"),
          col(s"${f.name}__maxn").as("max_num"),
          col(s"${f.name}__mins").as("min_str"),
          col(s"${f.name}__maxs").as("max_str"),
          col(s"${f.name}__hll").as("hll"))
      }
      one.select(explode(array(rows: _*)).as("p")).select("p.*")
    }

    /** Publish one batch's partials under `batch_id=<id>`. Replay-safe:
      * an already-published partition no-ops; a crashed attempt leaves
      * only staging, which the retry clears before re-writing.
      */
    def applyBatch(spark: org.apache.spark.sql.SparkSession, batch: DataFrame,
                   stateRoot: String, batchId: Long): Unit = {
      val conf = spark.sparkContext.hadoopConfiguration
      val part = new org.apache.hadoop.fs.Path(s"$stateRoot/partials/batch_id=$batchId")
      val fs = part.getFileSystem(conf)
      if (fs.exists(part)) return
      val staging = new org.apache.hadoop.fs.Path(s"$stateRoot/.staging-$batchId")
      if (fs.exists(staging)) fs.delete(staging, true)
      partials(batch).coalesce(1).write.mode("overwrite").parquet(staging.toString)
      fs.mkdirs(part.getParent)
      require(fs.rename(staging, part), s"profile partials publish failed for batch $batchId")
    }

    /** The merged profile of everything ingested so far: sums, typed
      * min/max, HLL-union distinct estimates — an aggregation over the
      * KB-sized partials table only.
      */
    def read(spark: org.apache.spark.sql.SparkSession, stateRoot: String): DataFrame =
      spark.read.parquet(s"$stateRoot/partials")
        .groupBy("col_name")
        .agg(
          sum("n_rows").as("n_rows"),
          sum("n_nulls").as("n_nulls"),
          min("min_num").as("min_num"),
          max("max_num").as("max_num"),
          min("min_str").as("min_str"),
          max("max_str").as("max_str"),
          coalesce(hll_sketch_estimate(hll_union_agg(col("hll"), lit(false))), lit(0L))
            .as("n_distinct_est"))
        .orderBy("col_name")
  }
}
