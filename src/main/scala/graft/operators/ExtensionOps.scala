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

  /** A17: the statistical-aggregate family — stddev_samp / var_samp /
    * covar_samp / corr per group. All four are single-pass co-moment
    * aggregates (partial states merge associatively), so at scale this
    * is one shuffle of four small states per group, never a second
    * pass over the data. Results are portably rounded: the co-moment
    * merge order differs between engines only at ~1e-15 relative.
    */
  private val statsFamily = QueryDef(
    "a17_stats_family",
    (s, dir) => t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(roundTo(stddev_samp(col("l_extendedprice")), 4).as("sd_price"),
        roundTo(var_samp(col("l_discount")), 8).as("var_disc"),
        roundTo(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("cov_qty_price"),
        roundTo(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
           |  floor(stddev_samp(l_extendedprice) * 10000.0 + 0.5) / 10000.0 AS sd_price,
           |  floor(var_samp(l_discount) * 100000000.0 + 0.5) / 100000000.0 AS var_disc,
           |  floor(covar_samp(l_quantity, l_extendedprice) * 100.0 + 0.5) / 100.0 AS cov_qty_price,
           |  floor(corr(l_quantity, l_extendedprice) * 1000000.0 + 0.5) / 1000000.0 AS corr_qty_price,
           |  count(*) AS n
           |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  /** A23: the linear-regression aggregate family — REGR_SLOPE /
    * REGR_INTERCEPT / REGR_R2 / REGR_AVGX / REGR_AVGY / REGR_COUNT of
    * extendedprice on quantity per return flag. Like `a17`, every
    * member is a single-pass mergeable co-moment aggregate: one shuffle
    * of a fixed-size state per group, no second data pass — the OLS fit
    * of a 100 TB fact table costs exactly one aggregation. Results are
    * portably rounded (co-moment merge order differs at ~1e-15).
    */
  private val regrFamily = QueryDef(
    "a23_regr_family",
    (s, dir) => t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        roundTo(expr("regr_slope(l_extendedprice, l_quantity)"), 4).as("slope"),
        roundTo(expr("regr_intercept(l_extendedprice, l_quantity)"), 2).as("intercept"),
        roundTo(expr("regr_r2(l_extendedprice, l_quantity)"), 6).as("r2"),
        roundTo(expr("regr_avgx(l_extendedprice, l_quantity)"), 4).as("avg_x"),
        roundTo(expr("regr_avgy(l_extendedprice, l_quantity)"), 2).as("avg_y"),
        expr("regr_count(l_extendedprice, l_quantity)").as("n"))
      .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
           |  floor(regr_slope(l_extendedprice, l_quantity) * 10000.0 + 0.5) / 10000.0 AS slope,
           |  floor(regr_intercept(l_extendedprice, l_quantity) * 100.0 + 0.5) / 100.0 AS intercept,
           |  floor(regr_r2(l_extendedprice, l_quantity) * 1000000.0 + 0.5) / 1000000.0 AS r2,
           |  floor(regr_avgx(l_extendedprice, l_quantity) * 10000.0 + 0.5) / 10000.0 AS avg_x,
           |  floor(regr_avgy(l_extendedprice, l_quantity) * 100.0 + 0.5) / 100.0 AS avg_y,
           |  regr_count(l_extendedprice, l_quantity) AS n
           |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  /** A19: MIN_BY / MAX_BY (argmin/argmax). The ordering key is the
    * composite `round(acctbal·100)·10^8 + custkey` — an exact BIGINT
    * both engines compute identically, so acctbal ties (present at
    * sf0.1+, and systematic in the key-shifted sf1 corpus where every
    * balance exists 10×) still pick ONE deterministic winner. A plain
    * `max_by(x, acctbal)` would be nondeterministic under ties — the
    * same trap as unordered `first()`.
    */
  private val argMinMax = QueryDef(
    "a19_min_max_by",
    (s, dir) => {
      val key = (round(col("c_acctbal") * 100).cast("long") * lit(100000000L) +
        col("c_custkey")).as("k")
      t(s, dir, "customer")
        .select(col("c_nationkey"), col("c_custkey"), key)
        .groupBy("c_nationkey")
        .agg(max_by(col("c_custkey"), col("k")).as("richest_cust"),
          min_by(col("c_custkey"), col("k")).as("poorest_cust"),
          count(lit(1)).as("n"))
        .orderBy("c_nationkey")
    },
    Some("""SELECT c_nationkey,
           |  arg_max(c_custkey, k) AS richest_cust,
           |  arg_min(c_custkey, k) AS poorest_cust,
           |  count(*) AS n
           |FROM (SELECT c_nationkey, c_custkey,
           |        CAST(round(c_acctbal * 100) AS BIGINT) * 100000000 + c_custkey AS k
           |      FROM customer)
           |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin))

  /** A20: deterministic MODE (most frequent value, ties broken by the
    * smaller value) — the count + rank-filter formulation rather than a
    * native `mode()` aggregate, because mode's tie behavior is
    * engine-defined; the explicit (cnt DESC, value) tiebreak makes the
    * answer reproducible anywhere. Plans as two aggregates + a
    * WindowGroupLimit rank filter — one row per group crosses the final
    * shuffle.
    */
  private val modeAgg = QueryDef(
    "a20_mode",
    (s, dir) => {
      val counts = t(s, dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("cnt"))
      counts
        .withColumn("rn", row_number().over(
          Window.partitionBy("o_orderstatus")
            .orderBy(col("cnt").desc, col("o_orderpriority"))))
        .filter(col("rn") === 1)
        .select(col("o_orderstatus"), col("o_orderpriority").as("mode_priority"),
          col("cnt"))
        .orderBy("o_orderstatus")
    },
    Some("""WITH counts AS (
           |  SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
           |  FROM orders GROUP BY o_orderstatus, o_orderpriority),
           |ranked AS (
           |  SELECT o_orderstatus, o_orderpriority, cnt,
           |    row_number() OVER (PARTITION BY o_orderstatus
           |                       ORDER BY cnt DESC, o_orderpriority) AS rn
           |  FROM counts)
           |SELECT o_orderstatus, o_orderpriority AS mode_priority, cnt
           |FROM ranked WHERE rn = 1 ORDER BY o_orderstatus""".stripMargin))

  /** W10: explicit ROWS sliding frame (3-row centered moving window) —
    * the frame variant the reference never uses (its windows are
    * running or unbounded; `w5` covers RANGE intervals). ROWS frames
    * are tie-sensitive, so the order key includes the unique event_id
    * — without it two engines could legally disagree inside tied
    * timestamps.
    */
  private val slidingFrame = QueryDef(
    "w10_sliding_frame",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(-1, 1)
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          roundTo(avg("value").over(w), 4).as("centered_avg"),
          count(lit(1)).over(w).as("frame_n"),
          roundTo(min("value").over(w), 2).as("frame_min"))
        .orderBy("user_id", "event_id")
    },
    Some("""WITH e AS (
           |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events)
           |SELECT user_id, event_id,
           |  floor(avg(value) OVER w * 10000.0 + 0.5) / 10000.0 AS centered_avg,
           |  count(*) OVER w AS frame_n,
           |  floor(min(value) OVER w * 100.0 + 0.5) / 100.0 AS frame_min
           |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
           |  ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)
           |ORDER BY user_id, event_id""".stripMargin))

  /** F-COND: conditional scalar family — COALESCE chains, NULLIF,
    * GREATEST/LEAST (NULL-tolerant in both engines), IF. All pure
    * codegen'd row expressions.
    */
  private val condFuncs = QueryDef(
    "f_conditional_funcs",
    (s, dir) => t(s, dir, "orders")
      .select(col("o_orderkey"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("status_or_open"),
        greatest(col("o_totalprice"), lit(100000.0)).as("price_floor"),
        least(col("o_totalprice"), lit(200000.0)).as("price_cap"),
        when(col("o_orderpriority") < lit("3"), "urgentish")
          .otherwise("relaxed").as("prio_bucket"))
      .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
           |  coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_or_open,
           |  greatest(o_totalprice, 100000.0) AS price_floor,
           |  least(o_totalprice, 200000.0) AS price_cap,
           |  CASE WHEN o_orderpriority < '3' THEN 'urgentish' ELSE 'relaxed' END
           |    AS prio_bucket
           |FROM orders ORDER BY o_orderkey""".stripMargin))

  /** A21: boolean/conditional aggregates — COUNT_IF, BOOL_AND, BOOL_OR
    * (ANSI ANY/EVERY). All are single-pass mergeable states (a count
    * and two booleans per group cross the shuffle).
    */
  private val boolAggs = QueryDef(
    "a21_bool_aggs",
    (s, dir) => t(s, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(expr("count_if(o_totalprice > 150000)").as("n_big"),
        expr("bool_and(o_totalprice > 1000)").as("all_over_1k"),
        expr("bool_or(o_orderstatus = 'F')").as("any_finished"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority"),
    Some("""SELECT o_orderpriority,
           |  count(*) FILTER (WHERE o_totalprice > 150000) AS n_big,
           |  bool_and(o_totalprice > 1000) AS all_over_1k,
           |  bool_or(o_orderstatus = 'F') AS any_finished,
           |  count(*) AS n
           |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin))

  /** U4: INTERSECT ALL / EXCEPT ALL — the multiset variants (bag
    * semantics: min / difference of multiplicities). Catalyst plans
    * them via a per-side count aggregate + join on the value, so the
    * shuffle carries one row per DISTINCT value and side, not the raw
    * bags.
    */
  private val setOpsAll = QueryDef(
    "u4_intersect_except_all",
    (s, dir) => {
      val p = t(s, dir, "part")
      val a = p.filter(col("p_size") <= 25).select("p_brand")
      val b = p.filter(col("p_size") >= 20).select("p_brand")
      a.intersectAll(b).withColumn("op", lit("intersect_all"))
        .unionAll(a.exceptAll(b).withColumn("op", lit("except_all")))
        .groupBy("op", "p_brand").agg(count(lit(1)).as("multiplicity"))
        .orderBy("op", "p_brand")
    },
    Some("""WITH a AS (SELECT p_brand FROM part WHERE p_size <= 25),
           |b AS (SELECT p_brand FROM part WHERE p_size >= 20),
           |ia AS (SELECT p_brand FROM a INTERSECT ALL SELECT p_brand FROM b),
           |ea AS (SELECT p_brand FROM a EXCEPT ALL SELECT p_brand FROM b)
           |SELECT op, p_brand, multiplicity FROM (
           |  SELECT 'intersect_all' AS op, p_brand, count(*) AS multiplicity
           |  FROM ia GROUP BY p_brand
           |  UNION ALL
           |  SELECT 'except_all' AS op, p_brand, count(*) AS multiplicity
           |  FROM ea GROUP BY p_brand)
           |ORDER BY op, p_brand""".stripMargin))

  /** F-BIT: bitwise scalar family (AND/OR/XOR, shifts, bit_count) —
    * pure codegen'd per-row arithmetic over the event ids.
    */
  private val bitwiseFuncs = QueryDef(
    "f_bitwise_funcs",
    (s, dir) => t(s, dir, "events")
      .select(col("event_id"),
        (col("event_id").bitwiseAND(lit(255L))).as("lo_byte"),
        (col("event_id").bitwiseOR(lit(4096L))).as("with_flag"),
        (col("event_id").bitwiseXOR(col("user_id"))).as("xored"),
        expr("shiftleft(event_id, 3)").as("shl3"),
        expr("shiftright(event_id, 2)").as("shr2"),
        bit_count(col("event_id")).as("popcount"))
      .orderBy("event_id"),
    Some("""SELECT event_id,
           |  event_id & 255 AS lo_byte,
           |  event_id | 4096 AS with_flag,
           |  xor(event_id, user_id) AS xored,
           |  event_id << 3 AS shl3,
           |  event_id >> 2 AS shr2,
           |  CAST(bit_count(event_id) AS INTEGER) AS popcount
           |FROM events ORDER BY event_id""".stripMargin))

  /** J16: correlated LATERAL join — top-2 customers per nation through
    * a correlated subquery with ORDER BY + LIMIT. Catalyst
    * decorrelates this into a window rank-filter (WindowGroupLimit at
    * scale), i.e. the same physical shape as `p7_w1_qualify_first` —
    * no per-row re-execution of the inner query.
    */
  private val lateralTopN = QueryDef(
    "j16_lateral_topn",
    (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""SELECT n.n_name, c.c_custkey, c.c_acctbal
              |FROM nation n,
              |LATERAL (SELECT c_custkey, c_acctbal FROM customer
              |         WHERE c_nationkey = n.n_nationkey
              |         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c
              |ORDER BY n_name, c_custkey""".stripMargin)
    },
    Some("""SELECT n.n_name, c.c_custkey, c.c_acctbal
           |FROM nation n,
           |LATERAL (SELECT c_custkey, c_acctbal FROM customer
           |         WHERE c_nationkey = n.n_nationkey
           |         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c
           |ORDER BY n_name, c_custkey""".stripMargin))

  /** U5: UNION by NAME over partially-overlapping schemas — the
    * `dbt_utils.union_relations` shape (the most-used dbt package
    * macro): conform two differently-shaped relations by column NAME,
    * null-filling what each side lacks. `unionByName(allowMissing
    * Columns = true)` is the native Spark spelling; DuckDB's
    * `UNION ALL BY NAME` is the independent check. Pure map-side
    * Expand-free union — each side projects into the conformed schema
    * and streams.
    */
  private val unionByNameQ = QueryDef(
    "u5_union_by_name",
    (s, dir) => {
      val cust = t(s, dir, "customer")
        .select(col("c_custkey").as("key"), col("c_name").as("name"),
          col("c_acctbal").as("acctbal"), lit("customer").as("kind"))
      val supp = t(s, dir, "supplier")
        .select(col("s_suppkey").as("key"), col("s_name").as("name"),
          col("s_nationkey").as("nation"), lit("supplier").as("kind"))
      cust.unionByName(supp, allowMissingColumns = true)
        .select("key", "name", "acctbal", "kind", "nation")
        .orderBy("kind", "key")
    },
    Some("""SELECT key, name, acctbal, kind, nation FROM (
           |  SELECT c_custkey AS key, c_name AS name, c_acctbal AS acctbal,
           |         'customer' AS kind
           |  FROM customer
           |  UNION ALL BY NAME
           |  SELECT s_suppkey AS key, s_name AS name, s_nationkey AS nation,
           |         'supplier' AS kind
           |  FROM supplier)
           |ORDER BY kind, key""".stripMargin))

  /** A26: PERCENTILE_DISC — the DISCRETE quantile (first value whose
    * cumulative distribution reaches p, always an actual data value),
    * complementing `a16_exact_percentiles`' interpolating
    * PERCENTILE_CONT. Discrete selection returns exact stored values,
    * so no rounding is needed for the cross-engine hash. Same scale
    * shape as a16: sort-based exact aggregate per group.
    */
  private val percentileDisc = QueryDef(
    "a26_percentile_disc",
    (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""SELECT l_returnflag,
              |  percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity) AS q1,
              |  percentile_disc(0.5)  WITHIN GROUP (ORDER BY l_quantity) AS med,
              |  percentile_disc(0.75) WITHIN GROUP (ORDER BY l_quantity) AS q3,
              |  count(*) AS n
              |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    },
    Some("""SELECT l_returnflag,
           |  quantile_disc(l_quantity, 0.25) AS q1,
           |  quantile_disc(l_quantity, 0.5) AS med,
           |  quantile_disc(l_quantity, 0.75) AS q3,
           |  count(*) AS n
           |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  /** A27: market-basket frequent pairs with association metrics — the
    * classic co-occurrence mine (Agrawal et al., VLDB 1994 Apriori
    * shape, first pass): which part pairs ship together in one order
    * more often than chance, scored by support, directional
    * confidence, and lift.
    *
    * Scale shape: the per-order item-pair join is bounded by basket
    * size (TPC-H orders hold ≤ 7 lineitems → ≤ 21 pairs/order — pair
    * growth is |orders|·b², never |items|²), the distinct (order,
    * part) projection collapses duplicate part rows BEFORE pairing,
    * both self-join sides reuse one exchange (same distinct), pair
    * counts combine map-side, and the singleton-support join is keyed
    * on partkey (AQE broadcasts it when small; at 100 TB it's an
    * ordinary keyed join, never a cartesian). Top-20 by count plans as
    * TakeOrderedAndProject. Lift/confidence quantize portably to 1e-6.
    */
  /** Shared plan for A27/A27b. `minSupport = None` is the exhaustive
    * first pass; `Some(ms)` is the Apriori support-prune dial: baskets'
    * parts are semi-joined against singletons with `cnt_one >= ms`
    * BEFORE the pair explode, so the candidate-pair key space shrinks
    * from (all co-occurring parts)² to (frequent parts)² — the move
    * that makes pair mining feasible on realistic Zipf-skewed corpora,
    * where the long tail of rare parts contributes almost all candidate
    * pairs and none of the frequent ones. The prune is lossless for the
    * pruned row's semantics (a pair involving a part with cnt_one < ms
    * can never satisfy both-parts-frequent), which the brute-force
    * DuckDB oracle proves by computing the same result WITHOUT the
    * prune. Apriori's premise — frequent singletons are few — is what
    * justifies the explicit broadcast of the qualifying set; on a
    * corpus where most parts qualify, the prune buys nothing and the
    * unpruned row is the right tool.
    */
  private def basketPairsPlan(s: SparkSession, dir: String,
                              minSupport: Option[Long],
                              /** RELATIVE min support (fraction of all
                                * baskets) — the classic Apriori dial.
                                * The threshold derives from the basket
                                * count inside the plan (1-row broadcast
                                * + ceil), so no driver round-trip and
                                * the same fraction stays meaningful at
                                * every SF — absolute thresholds go
                                * stale as the corpus grows.
                                */
                              relSupport: Option[Double] = None): org.apache.spark.sql.DataFrame = {
    // ONE shuffle on okey builds the per-order basket; the three
    // downstream branches (pair counts, singleton supports, order
    // count) all hang off the SAME aggregate subtree, so Catalyst
    // reuses one exchange and the fact table is scanned once.
    val baskets = Tables.load(s, dir, "lineitem")
      .groupBy(col("l_orderkey").as("okey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
    val nOrders = baskets.select(count(lit(1)).as("n_orders"))
    val supports = baskets.select(explode(col("parts")).as("part"))
      .groupBy("part").agg(count(lit(1)).as("cnt_one"))
    // Apriori prune: drop infrequent parts from every basket before
    // pair expansion (explode → broadcast semi-join → regroup; two
    // cheap shuffles that replace a quadratically larger pair agg).
    val qualifyingOpt = (minSupport, relSupport) match {
      case (Some(ms), None) => Some(supports.filter(col("cnt_one") >= ms).select("part"))
      case (None, Some(rel)) => Some(
        supports.crossJoin(broadcast(nOrders))
          .filter(col("cnt_one") >= ceil(lit(rel) * col("n_orders")))
          .select("part"))
      case (None, None) => None
      case _ => throw new IllegalArgumentException(
        "pass at most one of minSupport / relSupport")
    }
    val pairSource = qualifyingOpt match {
      case None => baskets
      case Some(qualifying) =>
        baskets.select(col("okey"), explode(col("parts")).as("part"))
          .join(broadcast(qualifying), Seq("part"), "left_semi")
          .groupBy("okey").agg(sort_array(collect_set(col("part"))).as("parts"))
    }
    // In-basket pair expansion: strictly-later elements of the sorted
    // distinct set, so pa < pb by construction and each unordered
    // pair appears once per order.
    val pairs = pairSource.select(explode(expr(
        "flatten(transform(parts, (x, i) -> " +
          "transform(slice(parts, i + 2, size(parts)), y -> struct(x AS pa, y AS pb))))"))
        .as("pr"))
      .select(col("pr.pa").as("pa"), col("pr.pb").as("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("cnt_ab"))
      .filter(col("cnt_ab") >= 2)
    pairs
      .join(supports.withColumnRenamed("part", "pa").withColumnRenamed("cnt_one", "cnt_a"), "pa")
      .join(supports.withColumnRenamed("part", "pb").withColumnRenamed("cnt_one", "cnt_b"), "pb")
      .crossJoin(broadcast(nOrders))
      .select(col("pa"), col("pb"), col("cnt_ab"), col("cnt_a"), col("cnt_b"),
        roundTo(col("cnt_ab").cast("double") / col("cnt_a"), 6).as("conf_a_b"),
        roundTo(col("cnt_ab").cast("double") / col("cnt_b"), 6).as("conf_b_a"),
        roundTo(col("n_orders") * col("cnt_ab").cast("double") /
          (col("cnt_a") * col("cnt_b")), 6).as("lift"))
      .orderBy(col("cnt_ab").desc, col("pa"), col("pb"))
      .limit(20)
  }

  private val basketPairs = QueryDef(
    "a27_basket_pairs",
    (s, dir) => basketPairsPlan(s, dir, None),
    Some("""WITH items AS (
           |  SELECT DISTINCT l_orderkey AS okey, l_partkey AS part FROM lineitem),
           |n AS (SELECT count(DISTINCT okey) AS n_orders FROM items),
           |sup AS (SELECT part, count(*) AS cnt_one FROM items GROUP BY part),
           |pairs AS (
           |  SELECT a.part AS pa, b.part AS pb, count(*) AS cnt_ab
           |  FROM items a JOIN items b ON a.okey = b.okey AND a.part < b.part
           |  GROUP BY 1, 2 HAVING count(*) >= 2)
           |SELECT pa, pb, CAST(cnt_ab AS BIGINT) AS cnt_ab,
           |  CAST(sa.cnt_one AS BIGINT) AS cnt_a, CAST(sb.cnt_one AS BIGINT) AS cnt_b,
           |  floor(CAST(cnt_ab AS DOUBLE) / sa.cnt_one * 1000000 + 0.5) / 1000000 AS conf_a_b,
           |  floor(CAST(cnt_ab AS DOUBLE) / sb.cnt_one * 1000000 + 0.5) / 1000000 AS conf_b_a,
           |  floor(n.n_orders * CAST(cnt_ab AS DOUBLE) / (sa.cnt_one * sb.cnt_one)
           |    * 1000000 + 0.5) / 1000000 AS lift
           |FROM pairs
           |JOIN sup sa ON pairs.pa = sa.part
           |JOIN sup sb ON pairs.pb = sb.part
           |CROSS JOIN n
           |ORDER BY cnt_ab DESC, pa, pb LIMIT 20""".stripMargin))

  /** A27b: frequent-pairs with the Apriori minSupport dial ON (both
    * parts must have singleton support ≥ 25). The Spark plan prunes
    * infrequent parts BEFORE the pair explode; the oracle computes the
    * identical result by brute force WITHOUT the prune (post-hoc
    * both-frequent filter) — the hash match is the losslessness proof.
    */
  private val basketPairsPruned = QueryDef(
    "a27b_basket_pairs_pruned",
    (s, dir) => basketPairsPlan(s, dir, Some(25L)),
    Some("""WITH items AS (
           |  SELECT DISTINCT l_orderkey AS okey, l_partkey AS part FROM lineitem),
           |n AS (SELECT count(DISTINCT okey) AS n_orders FROM items),
           |sup AS (SELECT part, count(*) AS cnt_one FROM items GROUP BY part),
           |pairs AS (
           |  SELECT a.part AS pa, b.part AS pb, count(*) AS cnt_ab
           |  FROM items a JOIN items b ON a.okey = b.okey AND a.part < b.part
           |  GROUP BY 1, 2 HAVING count(*) >= 2)
           |SELECT pa, pb, CAST(cnt_ab AS BIGINT) AS cnt_ab,
           |  CAST(sa.cnt_one AS BIGINT) AS cnt_a, CAST(sb.cnt_one AS BIGINT) AS cnt_b,
           |  floor(CAST(cnt_ab AS DOUBLE) / sa.cnt_one * 1000000 + 0.5) / 1000000 AS conf_a_b,
           |  floor(CAST(cnt_ab AS DOUBLE) / sb.cnt_one * 1000000 + 0.5) / 1000000 AS conf_b_a,
           |  floor(n.n_orders * CAST(cnt_ab AS DOUBLE) / (sa.cnt_one * sb.cnt_one)
           |    * 1000000 + 0.5) / 1000000 AS lift
           |FROM pairs
           |JOIN sup sa ON pairs.pa = sa.part
           |JOIN sup sb ON pairs.pb = sb.part
           |CROSS JOIN n
           |WHERE sa.cnt_one >= 25 AND sb.cnt_one >= 25
           |ORDER BY cnt_ab DESC, pa, pb LIMIT 20""".stripMargin))

  /** A27c: the RELATIVE Apriori dial — min support as a fraction of
    * all baskets (0.25% here), the form real basket mining runs with
    * (absolute counts go stale as the corpus grows; the
    * `graft.tools.BasketStats` probe measured a 14× candidate cut and
    * a 4-orders-of-magnitude pair-key-state cut at 1% on the Zipf sf3z
    * corpus). The threshold is computed INSIDE the plan from the
    * 1-row basket count — no driver round-trip — and the prune runs
    * before the pair explode exactly like A27b; the brute-force oracle
    * applies the same threshold post-hoc, so the hash match proves
    * losslessness for both-frequent pairs.
    */
  private val basketPairsRelSup = QueryDef(
    "a27c_basket_pairs_relsup",
    (s, dir) => basketPairsPlan(s, dir, None, relSupport = Some(0.0025)),
    Some("""WITH items AS (
           |  SELECT DISTINCT l_orderkey AS okey, l_partkey AS part FROM lineitem),
           |n AS (SELECT count(DISTINCT okey) AS n_orders FROM items),
           |sup AS (SELECT part, count(*) AS cnt_one FROM items GROUP BY part),
           |pairs AS (
           |  SELECT a.part AS pa, b.part AS pb, count(*) AS cnt_ab
           |  FROM items a JOIN items b ON a.okey = b.okey AND a.part < b.part
           |  GROUP BY 1, 2 HAVING count(*) >= 2)
           |SELECT pa, pb, CAST(cnt_ab AS BIGINT) AS cnt_ab,
           |  CAST(sa.cnt_one AS BIGINT) AS cnt_a, CAST(sb.cnt_one AS BIGINT) AS cnt_b,
           |  floor(CAST(cnt_ab AS DOUBLE) / sa.cnt_one * 1000000 + 0.5) / 1000000 AS conf_a_b,
           |  floor(CAST(cnt_ab AS DOUBLE) / sb.cnt_one * 1000000 + 0.5) / 1000000 AS conf_b_a,
           |  floor(n.n_orders * CAST(cnt_ab AS DOUBLE) / (sa.cnt_one * sb.cnt_one)
           |    * 1000000 + 0.5) / 1000000 AS lift
           |FROM pairs
           |JOIN sup sa ON pairs.pa = sa.part
           |JOIN sup sb ON pairs.pb = sb.part
           |CROSS JOIN n
           |WHERE sa.cnt_one >= ceil(0.0025 * n.n_orders)
           |  AND sb.cnt_one >= ceil(0.0025 * n.n_orders)
           |ORDER BY cnt_ab DESC, pa, pb LIMIT 20""".stripMargin))

  val all: Seq[QueryDef] = Seq(lagLead, setOps, unpivotMelt,
    statsFamily, regrFamily, argMinMax, setOpsAll, bitwiseFuncs, lateralTopN, modeAgg,
    boolAggs, slidingFrame, condFuncs, unionByNameQ, percentileDisc, basketPairs,
    basketPairsPruned, basketPairsRelSup)
}
