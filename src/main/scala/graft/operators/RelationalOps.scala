package graft.operators

import java.sql.Date

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dialect.Dialect._
import graft.sources.Tables

/** SURVEY.md §2 relational operator inventory (S/P/J/A/W/O/U rows), each
  * re-expressed Spark-first over the driver testdata and paired with a
  * DuckDB oracle. Every query ends in a total-order `orderBy` mirrored in
  * the oracle so results are deterministic regardless of parallelism.
  *
  * Scale notes (100 TB):
  *  - No `collect()` anywhere; scalar subqueries stay in the plan so
  *    Catalyst executes them as (reusable) subquery stages.
  *  - Aggregations are partial-by-default (hash agg w/ map-side combine).
  *  - Small-side joins (nation/region-sized dims) broadcast automatically
  *    under `spark.sql.autoBroadcastJoinThreshold`; big-big joins shuffle
  *    on their equi-keys and AQE handles skew.
  *  - Double-valued aggregates are rounded in BOTH engines so float
  *    summation order (which legitimately differs across partitionings)
  *    cannot flip the comparison.
  */
object RelationalOps {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Register all tables and run literal SQL — used where the operator
    * under test IS the SQL feature (scalar subqueries), and the same text
    * is valid ANSI for the oracle.
    */
  private def sql(q: String): (SparkSession, String) => DataFrame =
    (s, dir) => { Tables.registerAll(s, dir); s.sql(q) }

  // ---------------------------------------------------------------- scans

  /** S1 table scan passthrough (`/root/reference/models/source/
    * ingest_latest/media_events.sql:1` and siblings).
    */
  private val s1 = QueryDef(
    "s1_scan_region",
    (s, dir) => t(s, dir, "region").orderBy("r_regionkey"),
    Some("SELECT * FROM region ORDER BY r_regionkey"))

  /** S4 latest-partition source + J12 scalar subquery in predicate
    * (`quintly_youtube_allchannels_weekly.sql:7-13`): keep only the max
    * partition value; o_orderdate stands in for partitionDate.
    */
  private val s4 = QueryDef(
    "s4_latest_partition",
    sql("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
          |WHERE o_orderdate = (SELECT max(o_orderdate) FROM orders)
          |ORDER BY o_orderkey""".stripMargin),
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
           |WHERE o_orderdate = (SELECT max(o_orderdate) FROM orders)
           |ORDER BY o_orderkey""".stripMargin))

  // ---------------------------------------- projections / filters (P1-P8)

  /** P1 computed projections (`poms_flattened.sql:3-20`). */
  private val p1 = QueryDef(
    "p1_project_compute",
    (s, dir) => t(s, dir, "lineitem").select(
      col("l_orderkey"), col("l_linenumber"),
      roundTo(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 2).as("revenue"),
      roundTo(col("l_extendedprice") * (lit(1.0) + col("l_tax")), 2).as("charge"))
      .orderBy("l_orderkey", "l_linenumber"),
    Some("""SELECT l_orderkey, l_linenumber,
           |floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5) / 100.0 AS revenue,
           |floor(l_extendedprice * (1.0 + l_tax) * 100.0 + 0.5) / 100.0 AS charge
           |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin))

  /** P2 `SELECT * EXCEPT(col)` → `df.drop`
    * (`quintly_youtube_allchannels_weekly.sql:8`).
    */
  private val p2 = QueryDef(
    "p2_select_except",
    (s, dir) => t(s, dir, "customer").drop("c_acctbal").orderBy("c_custkey"),
    Some("""SELECT c_custkey, c_name, c_nationkey, c_mktsegment
           |FROM customer ORDER BY c_custkey""".stripMargin))

  /** P3 comparison filters (`atinternet_smarttag_streams_daily_v4.sql:72`). */
  private val p3 = QueryDef(
    "p3_filter_compare",
    (s, dir) => t(s, dir, "lineitem")
      .filter(col("l_quantity") > 45.0 && col("l_returnflag") =!= "A")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
      .orderBy("l_orderkey", "l_linenumber"),
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
           |FROM lineitem WHERE l_quantity > 45.0 AND l_returnflag <> 'A'
           |ORDER BY l_orderkey, l_linenumber""".stripMargin))

  /** P4 `NOT IN` with NULL escape (`poms_flattened.sql:30`: `id NOT IN
    * (...) OR id IS NULL` — BigQuery/ANSI `NOT IN` over NULL is NULL, so
    * the escape clause is load-bearing).
    */
  private val p4 = QueryDef(
    "p4_not_in_null_escape",
    (s, dir) => {
      val et2 = when(col("value") > 150.0, lit(null).cast("string"))
        .otherwise(col("event_type"))
      t(s, dir, "events")
        .withColumn("et2", et2)
        .filter(!col("et2").isin("view", "click") || col("et2").isNull)
        .select("event_id", "et2", "value")
        .orderBy("event_id")
    },
    Some("""SELECT event_id,
           |CASE WHEN value > 150.0 THEN NULL ELSE event_type END AS et2, value
           |FROM events
           |WHERE (CASE WHEN value > 150.0 THEN NULL ELSE event_type END) NOT IN ('view','click')
           |   OR (CASE WHEN value > 150.0 THEN NULL ELSE event_type END) IS NULL
           |ORDER BY event_id""".stripMargin))

  /** P5 regex filter (`atinternet_smarttag_streams_daily_v4.sql:39`
    * `REGEXP_CONTAINS`).
    */
  private val p5 = QueryDef(
    "p5_filter_regex",
    (s, dir) => t(s, dir, "documents")
      .filter(col("text").rlike("spark [a-z]+ join"))
      .select("doc_id", "lang", "source")
      .orderBy("doc_id"),
    Some("""SELECT doc_id, lang, source FROM documents
           |WHERE regexp_matches(text, 'spark [a-z]+ join')
           |ORDER BY doc_id""".stripMargin))

  /** P6 NULL tests (`integral_reporting_youtube.sql:27`). */
  private val p6 = QueryDef(
    "p6_filter_null",
    (s, dir) => t(s, dir, "documents")
      .withColumn("lang_nn", nullif(col("lang"), lit("en")))
      .filter(col("lang_nn").isNotNull)
      .select("doc_id", "lang_nn")
      .orderBy("doc_id"),
    Some("""SELECT doc_id, nullif(lang, 'en') AS lang_nn FROM documents
           |WHERE nullif(lang, 'en') IS NOT NULL ORDER BY doc_id""".stripMargin))

  /** P7/W1 QUALIFY pattern — window then filter rank=1
    * (`poms_flattened.sql:66,94`).
    */
  private val p7 = QueryDef(
    "p7_w1_qualify_first",
    (s, dir) => t(s, dir, "lineitem")
      .withColumn("rn", row_number().over(
        Window.partitionBy("l_orderkey")
          .orderBy("l_linenumber", "l_partkey", "l_suppkey")))
      .filter(col("rn") === 1)
      .select("l_orderkey", "l_linenumber", "l_partkey")
      .orderBy("l_orderkey"),
    Some("""SELECT l_orderkey, l_linenumber, l_partkey FROM (
           |  SELECT l_orderkey, l_linenumber, l_partkey,
           |    row_number() OVER (PARTITION BY l_orderkey
           |      ORDER BY l_linenumber, l_partkey, l_suppkey) AS rn
           |  FROM lineitem) WHERE rn = 1 ORDER BY l_orderkey""".stripMargin))

  /** P8 ISO-calendar expression filter
    * (`integral_reporting_tvbroadcasts.sql:15` `extract(isoyear ...)`).
    */
  private val p8 = QueryDef(
    "p8_iso_filter",
    (s, dir) => t(s, dir, "orders")
      .withColumn("od", to_date(col("o_orderdate")))
      .filter(isoYear(col("od")) === 1998)
      .select("o_orderkey", "od")
      .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od FROM orders
           |WHERE isoyear(CAST(o_orderdate AS DATE)) = 1998
           |ORDER BY o_orderkey""".stripMargin))

  // ------------------------------------------------------- joins (J1-J12)

  /** J1 INNER equi-join + downstream agg
    * (`atinternet_smarttag_streams_daily_v4.sql:69`). lineitem⋈orders is a
    * big-big join: shuffles both sides on the orderkey — the partitioning
    * Catalyst picks survives into the aggregation when keys align.
    */
  private val j1 = QueryDef(
    "j1_inner_join",
    (s, dir) => t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority"),
    Some("""SELECT o_orderpriority,
           |round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
           |count(*) AS n
           |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin))

  /** J2 LEFT OUTER equi-join (`integral_reporting_tvbroadcasts.sql:14`) —
    * customers without orders survive with NULL-coalesced aggregates.
    */
  private val j2 = QueryDef(
    "j2_left_join",
    (s, dir) => t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("n_orders"),
        round(coalesce(sum("o_totalprice"), lit(0.0)), 2).as("total_spent"))
      .orderBy("c_custkey"),
    Some("""SELECT c_custkey, count(o_orderkey) AS n_orders,
           |round(coalesce(sum(o_totalprice), 0.0), 2) AS total_spent
           |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
           |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin))

  /** J3 join on compound ISO-week expression keys
    * (`integral_reporting_youtube.sql:22-25`): still an equi-join on the
    * derived (isoyear, isoweek) pair, so hash-joinable at scale.
    */
  private val j3 = QueryDef(
    "j3_iso_expr_join",
    (s, dir) => {
      val ow = t(s, dir, "orders")
        .groupBy(isoYear(to_date(col("o_orderdate"))).cast("int").as("iy"),
          isoWeek(to_date(col("o_orderdate"))).cast("int").as("iw"))
        .agg(count(lit(1)).as("n_orders"))
      val sw = t(s, dir, "lineitem")
        .groupBy(isoYear(to_date(col("l_shipdate"))).cast("int").as("siy"),
          isoWeek(to_date(col("l_shipdate"))).cast("int").as("siw"))
        .agg(count(lit(1)).as("n_ships"))
      ow.join(sw, col("iy") === col("siy") && col("iw") === col("siw"), "left")
        .select("iy", "iw", "n_orders", "n_ships")
        .orderBy("iy", "iw")
    },
    Some("""WITH ow AS (
           |  SELECT CAST(isoyear(CAST(o_orderdate AS DATE)) AS INTEGER) AS iy,
           |         CAST(weekofyear(CAST(o_orderdate AS DATE)) AS INTEGER) AS iw,
           |         count(*) AS n_orders
           |  FROM orders GROUP BY 1, 2),
           |sw AS (
           |  SELECT CAST(isoyear(CAST(l_shipdate AS DATE)) AS INTEGER) AS siy,
           |         CAST(weekofyear(CAST(l_shipdate AS DATE)) AS INTEGER) AS siw,
           |         count(*) AS n_ships
           |  FROM lineitem GROUP BY 1, 2)
           |SELECT iy, iw, n_orders, n_ships
           |FROM ow LEFT JOIN sw ON iy = siy AND iw = siw
           |ORDER BY iy, iw""".stripMargin))

  /** J4 FULL OUTER join + coalesce key merge
    * (`integral_reporting_dashboard_channel_weekly.sql:21-29`).
    */
  private val j4 = QueryDef(
    "j4_full_outer_coalesce",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val a = o.filter(col("o_orderstatus") === "F").groupBy(col("o_custkey").as("a_key"))
        .agg(round(sum("o_totalprice"), 2).as("f_total"))
      val b = o.filter(col("o_orderstatus") === "O").groupBy(col("o_custkey").as("b_key"))
        .agg(round(sum("o_totalprice"), 2).as("o_total"))
      a.join(b, col("a_key") === col("b_key"), "full_outer")
        .select(coalesce(col("a_key"), col("b_key")).as("custkey"),
          col("f_total"), col("o_total"))
        .orderBy("custkey")
    },
    Some("""WITH a AS (SELECT o_custkey AS a_key, round(sum(o_totalprice), 2) AS f_total
           |           FROM orders WHERE o_orderstatus = 'F' GROUP BY 1),
           |b AS (SELECT o_custkey AS b_key, round(sum(o_totalprice), 2) AS o_total
           |      FROM orders WHERE o_orderstatus = 'O' GROUP BY 1)
           |SELECT coalesce(a_key, b_key) AS custkey, f_total, o_total
           |FROM a FULL OUTER JOIN b ON a_key = b_key
           |ORDER BY custkey""".stripMargin))

  /** J5 CROSS JOIN UNNEST — inner lateral explode
    * (`atinternet_smarttag_streams_daily_v4.sql:173`).
    */
  private val j5 = QueryDef(
    "j5_explode_words",
    (s, dir) => t(s, dir, "documents")
      .select(explode(splitLit(col("text"), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy("word"),
    Some("""SELECT word, count(*) AS cnt FROM (
           |  SELECT unnest(string_split(text, ' ')) AS word FROM documents)
           |GROUP BY word ORDER BY word""".stripMargin))

  /** J6 LEFT JOIN UNNEST — outer explode preserving NULL/empty-array rows
    * (`poms_flattened.sql:23-27`).
    */
  private val j6 = QueryDef(
    "j6_explode_outer",
    (s, dir) => {
      val arr = when(col("value") < 5.0, array().cast("array<string>"))
        .when(col("event_type") === "error", lit(null).cast("array<string>"))
        .otherwise(splitLit(concat(col("event_type"), lit("_"), col("user_id").cast("string")), "_"))
      t(s, dir, "events")
        .withColumn("arr", arr)
        .select(col("event_id"), explode_outer(col("arr")).as("token"))
        .orderBy(col("event_id"), col("token").asc_nulls_first)
    },
    Some("""SELECT event_id,
           |unnest(CASE WHEN arr IS NULL OR len(arr) = 0
           |            THEN [CAST(NULL AS VARCHAR)] ELSE arr END) AS token
           |FROM (
           |  SELECT event_id,
           |    CASE WHEN value < 5.0 THEN CAST([] AS VARCHAR[])
           |         WHEN event_type = 'error' THEN NULL
           |         ELSE string_split(event_type || '_' || CAST(user_id AS VARCHAR), '_')
           |    END AS arr
           |  FROM events)
           |ORDER BY event_id, token NULLS FIRST""".stripMargin))

  /** J7 UNNEST WITH OFFSET — positional explode
    * (`poms_flattened.sql:28`). Offsets are 0-based in both engines.
    */
  private val j7 = QueryDef(
    "j7_posexplode",
    (s, dir) => t(s, dir, "embeddings")
      .select(col("vec_id"), posexplode(slice(col("embedding"), 1, 4)))
      .withColumnRenamed("col", "v")
      .orderBy("vec_id", "pos"),
    Some("""SELECT vec_id,
           |CAST(unnest(generate_series(1, least(4, len(embedding)))) - 1 AS INTEGER) AS pos,
           |unnest(embedding[1:4]) AS v
           |FROM embeddings ORDER BY vec_id, pos""".stripMargin))

  /** J8 minute-densify via generated timestamp array
    * (`atinternet_smarttag_streams_daily_v4.sql:37`).
    */
  private val j8 = QueryDef(
    "j8_minute_densify",
    (s, dir) => t(s, dir, "events")
      .withColumn("m0", truncMinute(col("ts")))
      .select(explode(generateTimestampArray(col("m0"),
        col("m0") + expr("interval 4 minutes"), 1)).as("minute"))
      .groupBy("minute").agg(count(lit(1)).as("n"))
      .orderBy("minute"),
    Some("""SELECT minute, count(*) AS n FROM (
           |  SELECT unnest(generate_series(
           |    date_trunc('minute', CAST(ts AS TIMESTAMP)),
           |    date_trunc('minute', CAST(ts AS TIMESTAMP)) + INTERVAL 4 MINUTE,
           |    INTERVAL 1 MINUTE)) AS minute
           |  FROM events)
           |GROUP BY minute ORDER BY minute""".stripMargin))

  /** J9 date-spine driving table (`integral_reporting_tvbroadcasts.sql:52`):
    * a generated weekly spine LEFT JOINed to fact aggregates on ISO keys.
    * The spine is tiny → broadcast; facts aggregate before the join so the
    * shuffle carries weeks, not events.
    */
  private val j9 = QueryDef(
    "j9_date_spine",
    (s, dir) => {
      val spine = s.range(1).select(explode(generateDateArray(
        lit(Date.valueOf("2023-12-25")), lit(Date.valueOf("2024-02-26")), 7)).as("week_start"))
        .withColumn("iy", isoYear(col("week_start")).cast("int"))
        .withColumn("iw", isoWeek(col("week_start")).cast("int"))
      val wk = t(s, dir, "events")
        .withColumn("d", to_date(col("ts")))
        .groupBy(isoYear(col("d")).cast("int").as("eiy"),
          isoWeek(col("d")).cast("int").as("eiw"))
        .agg(count(lit(1)).as("n_events"))
      spine.join(wk, col("iy") === col("eiy") && col("iw") === col("eiw"), "left")
        .select("week_start", "iy", "iw", "n_events")
        .orderBy("week_start")
    },
    Some("""WITH spine AS (
           |  SELECT CAST(unnest(generate_series(DATE '2023-12-25', DATE '2024-02-26',
           |                                     INTERVAL 7 DAY)) AS DATE) AS week_start),
           |sp AS (
           |  SELECT week_start, CAST(isoyear(week_start) AS INTEGER) AS iy,
           |         CAST(weekofyear(week_start) AS INTEGER) AS iw FROM spine),
           |wk AS (
           |  SELECT CAST(isoyear(CAST(ts AS DATE)) AS INTEGER) AS eiy,
           |         CAST(weekofyear(CAST(ts AS DATE)) AS INTEGER) AS eiw,
           |         count(*) AS n_events
           |  FROM events GROUP BY 1, 2)
           |SELECT week_start, iy, iw, n_events
           |FROM sp LEFT JOIN wk ON iy = eiy AND iw = eiw
           |ORDER BY week_start""".stripMargin))

  /** J10/W2 as-of nearest-match join via window dedup
    * (`atinternet_smarttag_streams_daily_v4.sql:64,70,135`): equi-join on a
    * coarse bucket (user, hour) keeps the join hash-based at scale; the
    * window picks the nearest candidate; ties broken deterministically.
    */
  private val j10 = QueryDef(
    "j10_asof_nearest",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val err = ev.filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("ts"),
          date_trunc("hour", col("ts")).as("hr"))
      val sig = ev.filter(col("event_type") === "signup")
        .select(col("event_id").as("signup_id"), col("user_id").as("s_user"),
          col("ts").as("sts"), date_trunc("hour", col("ts")).as("s_hr"))
      val diff = abs(unix_micros(col("ts")) - unix_micros(col("sts")))
      err.join(sig, col("user_id") === col("s_user") && col("hr") === col("s_hr"))
        .withColumn("diff_us", diff)
        .withColumn("rn", row_number().over(
          Window.partitionBy("event_id").orderBy(col("diff_us"), col("signup_id"))))
        .filter(col("rn") === 1)
        .select(col("event_id"), col("signup_id"),
          floor(col("diff_us") / lit(1000000.0)).cast("long").as("diff_seconds"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, signup_id,
           |CAST(floor(diff_us / 1000000.0) AS BIGINT) AS diff_seconds FROM (
           |  SELECT e.event_id, g.event_id AS signup_id,
           |    abs(epoch_us(CAST(e.ts AS TIMESTAMP)) - epoch_us(CAST(g.ts AS TIMESTAMP))) AS diff_us,
           |    row_number() OVER (PARTITION BY e.event_id
           |      ORDER BY abs(epoch_us(CAST(e.ts AS TIMESTAMP)) - epoch_us(CAST(g.ts AS TIMESTAMP))),
           |               g.event_id) AS rn
           |  FROM events e JOIN events g
           |    ON e.user_id = g.user_id
           |   AND date_trunc('hour', CAST(e.ts AS TIMESTAMP)) = date_trunc('hour', CAST(g.ts AS TIMESTAMP))
           |  WHERE e.event_type = 'error' AND g.event_type = 'signup')
           |WHERE rn = 1 ORDER BY event_id""".stripMargin))

  /** J11 self-join of derived subqueries
    * (`atinternet_smarttag_streams_daily_v4.sql:196-199`). The per-order
    * average is exact (integer-valued doubles), so the comparison is
    * engine-stable.
    */
  private val j11 = QueryDef(
    "j11_derived_self_join",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val avgQ = li.groupBy(col("l_orderkey").as("ak"))
        .agg(avg("l_quantity").as("aq"))
      li.join(avgQ, col("l_orderkey") === col("ak"))
        .filter(col("l_quantity") > col("aq"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_above_avg"))
        .orderBy("l_returnflag")
    },
    Some("""WITH avgq AS (
           |  SELECT l_orderkey AS ak, avg(l_quantity) AS aq FROM lineitem GROUP BY 1)
           |SELECT l_returnflag, count(*) AS n_above_avg
           |FROM lineitem JOIN avgq ON l_orderkey = ak
           |WHERE l_quantity > aq
           |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  /** J12 scalar subquery in predicate
    * (`quintly_youtube_allchannels_weekly.sql:13`).
    */
  private val j12 = QueryDef(
    "j12_scalar_subquery",
    sql("""SELECT o_orderkey, o_totalprice FROM orders
          |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
          |ORDER BY o_orderkey""".stripMargin),
    Some("""SELECT o_orderkey, o_totalprice FROM orders
           |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
           |ORDER BY o_orderkey""".stripMargin))

  // ------------------------------------------------- aggregations (A1-A8)

  /** A1/A2 grouped SUM/AVG/COUNT (pricing-summary shape; reference aggs at
    * `integral_reporting_vodstreaming.sql:80-91`).
    */
  private val a1 = QueryDef(
    "a1_groupby_pricing",
    (s, dir) => t(s, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc"),
        round(avg("l_quantity"), 6).as("avg_qty"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag", "l_linestatus"),
    Some("""SELECT l_returnflag, l_linestatus,
           |round(sum(l_quantity), 2) AS sum_qty,
           |round(sum(l_extendedprice), 2) AS sum_base,
           |round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc,
           |round(avg(l_quantity), 6) AS avg_qty,
           |count(*) AS n
           |FROM lineitem GROUP BY l_returnflag, l_linestatus
           |ORDER BY l_returnflag, l_linestatus""".stripMargin))

  /** A2 MIN/MAX (exact on doubles — no rounding needed). */
  private val a2 = QueryDef(
    "a2_minmax_group",
    (s, dir) => t(s, dir, "customer")
      .groupBy("c_nationkey")
      .agg(min("c_acctbal").as("min_bal"), max("c_acctbal").as("max_bal"),
        count(lit(1)).as("n"))
      .orderBy("c_nationkey"),
    Some("""SELECT c_nationkey, min(c_acctbal) AS min_bal, max(c_acctbal) AS max_bal,
           |count(*) AS n FROM customer GROUP BY c_nationkey
           |ORDER BY c_nationkey""".stripMargin))

  /** A3 COUNT(DISTINCT expr)
    * (`integral_reporting_tvbroadcasts.sql:26` counts a concat).
    */
  private val a3 = QueryDef(
    "a3_count_distinct",
    (s, dir) => t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("nd_part"),
        countDistinct(concat(col("l_orderkey").cast("string"), lit("-"),
          col("l_linenumber").cast("string"))).as("nd_line"))
      .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
           |count(DISTINCT l_partkey) AS nd_part,
           |count(DISTINCT CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)) AS nd_line
           |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  /** A3 scale variant: HyperLogLog++ approximate distinct — at 100 TB an
    * exact COUNT(DISTINCT) shuffles every distinct value; the sketch
    * shuffles fixed-size registers. The raw HLL estimate is
    * engine-specific (DuckDB's sketch yields different values), so the
    * oracle pins a TOLERANCE instead: the row carries the exact count
    * (computable by both engines) plus `hll_ok` = |estimate − exact| ≤
    * 3·rsd·exact, which the oracle asserts as literal `true` — an
    * out-of-band sketch flips the flag and fails the hash compare. The
    * exact count here is oracle harness, not production shape (real use
    * is the sketch alone); the tighter 2%-rsd bound is also asserted in
    * `OperatorSpec`.
    */
  private val a3b = QueryDef(
    "a3b_approx_distinct",
    (s, dir) => t(s, dir, "events")
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
        countDistinct(col("user_id")).as("nd_exact"))
      .select(col("event_type"), col("nd_exact"),
        (abs(col("approx_users") - col("nd_exact")) <=
          col("nd_exact") * lit(3 * 0.02)).as("hll_ok"))
      .orderBy("event_type"),
    Some("""SELECT event_type, count(DISTINCT user_id) AS nd_exact,
           |true AS hll_ok
           |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin))

  /** A4 conditional aggregation — SUM(IF)/COUNT(DISTINCT IF)
    * (`atinternet_smarttag_streams_daily_v4.sql:133,158`).
    */
  private val a4 = QueryDef(
    "a4_conditional_agg",
    (s, dir) => t(s, dir, "events")
      .groupBy("event_type")
      .agg(round(sum(when(col("value") >= 30.0, col("value")).otherwise(0.0)), 2)
        .as("qualified_value"),
        countDistinct(when(col("value") >= 30.0, col("user_id"))).as("qualified_users"))
      .orderBy("event_type"),
    Some("""SELECT event_type,
           |round(sum(CASE WHEN value >= 30.0 THEN value ELSE 0.0 END), 2) AS qualified_value,
           |count(DISTINCT CASE WHEN value >= 30.0 THEN user_id END) AS qualified_users
           |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin))

  /** A5 STRING_AGG with ORDER BY
    * (`atinternet_smarttag_streams_daily_v4.sql:219`).
    */
  private val a5 = QueryDef(
    "a5_string_agg_ordered",
    (s, dir) => t(s, dir, "nation")
      .groupBy("n_regionkey")
      .agg(stringAggOrdered(col("n_name"), ",").as("names"))
      .orderBy("n_regionkey"),
    Some("""SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS names
           |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin))

  /** A5 scale variant: the bounded-buffer chunked ordered STRING_AGG
    * ([[graft.dialect.Dialect.stringAggOrderedLarge]]) oracle-checked
    * against DuckDB's native ordered string_agg on customer names per
    * market segment — thousands of values per group at sf0.1, ~30k at
    * sf1, concatenated through ntile-chunked runs instead of one
    * unbounded collect_list buffer.
    */
  private val a5b = QueryDef(
    "a5b_string_agg_chunked",
    (s, dir) => stringAggOrderedLarge(
        t(s, dir, "customer").select("c_mktsegment", "c_name"),
        Seq("c_mktsegment"), "c_name", ",", chunks = 16)
      .orderBy("c_mktsegment"),
    Some("""SELECT c_mktsegment, string_agg(c_name, ',' ORDER BY c_name) AS c_name_agg
           |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin))

  /** A6 HAVING (`integral_reporting_dashboard_channel_weekly.sql:33`). */
  private val a6 = QueryDef(
    "a6_having",
    (s, dir) => t(s, dir, "customer")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), round(avg("c_acctbal"), 6).as("avg_bal"))
      .filter(col("n") >= 300)
      .orderBy("c_mktsegment"),
    Some("""SELECT c_mktsegment, count(*) AS n, round(avg(c_acctbal), 6) AS avg_bal
           |FROM customer GROUP BY c_mktsegment HAVING count(*) >= 300
           |ORDER BY c_mktsegment""".stripMargin))

  /** A7 ratio-of-aggregates with NULLIF divide-by-zero guard
    * (`integral_reporting_vodstreaming.sql:84-87`).
    */
  private val a7 = QueryDef(
    "a7_ratio_nullif",
    (s, dir) => t(s, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(round(
        sum(when(col("o_orderstatus") === "P" && col("o_totalprice") > 400000.0,
          col("o_totalprice")).otherwise(0.0)) /
          nullif(sum(when(col("o_orderstatus") === "P" && col("o_totalprice") > 400000.0,
            lit(1L)).otherwise(0L)), lit(0L)),
        4).as("big_p_avg"))
      .orderBy("o_orderpriority"),
    Some("""SELECT o_orderpriority, round(
           |  sum(CASE WHEN o_orderstatus = 'P' AND o_totalprice > 400000.0
           |           THEN o_totalprice ELSE 0.0 END) /
           |  nullif(sum(CASE WHEN o_orderstatus = 'P' AND o_totalprice > 400000.0
           |             THEN 1 ELSE 0 END), 0), 4) AS big_p_avg
           |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin))

  /** A8 dedup-by-grouping / DISTINCT
    * (`integral_reporting_vodstreaming.sql:45`).
    */
  private val a8 = QueryDef(
    "a8_distinct",
    (s, dir) => t(s, dir, "lineitem")
      .select("l_returnflag", "l_linestatus").distinct()
      .orderBy("l_returnflag", "l_linestatus"),
    Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
           |ORDER BY l_returnflag, l_linestatus""".stripMargin))

  // ------------------------------------------------------ windows (W2-W4)

  /** W2 ROW_NUMBER ordered by an expression — nearest-to-target pick
    * (`atinternet_smarttag_streams_daily_v4.sql:64`).
    */
  private val w2 = QueryDef(
    "w2_rownum_nearest",
    (s, dir) => t(s, dir, "events")
      .withColumn("rn", row_number().over(
        Window.partitionBy("user_id").orderBy(abs(col("value") - 50.0), col("event_id"))))
      .filter(col("rn") === 1)
      .select("user_id", "event_id", "value")
      .orderBy("user_id"),
    Some("""SELECT user_id, event_id, value FROM (
           |  SELECT user_id, event_id, value,
           |    row_number() OVER (PARTITION BY user_id
           |                       ORDER BY abs(value - 50.0), event_id) AS rn
           |  FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin))

  /** W3 MIN/MAX OVER whole partition
    * (`integral_reporting_vodstreaming.sql:11-12`).
    */
  private val w3 = QueryDef(
    "w3_minmax_over",
    (s, dir) => t(s, dir, "orders")
      .withColumn("od", to_date(col("o_orderdate")))
      .select(col("o_orderkey"), col("o_custkey"),
        min(col("od")).over(Window.partitionBy("o_custkey")).as("first_order"),
        max(col("od")).over(Window.partitionBy("o_custkey")).as("last_order"))
      .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey, o_custkey,
           |min(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey) AS first_order,
           |max(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey) AS last_order
           |FROM orders ORDER BY o_orderkey""".stripMargin))

  /** W4 SUM/AVG OVER whole partition
    * (`integral_reporting_dashboard_channel_weekly.sql:271,277-279`).
    */
  private val w4 = QueryDef(
    "w4_sumavg_over",
    (s, dir) => t(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        round(sum(col("value")).over(Window.partitionBy("user_id")), 2).as("user_total"),
        round(avg(col("value")).over(Window.partitionBy("user_id")), 6).as("user_avg"))
      .orderBy("event_id"),
    Some("""SELECT event_id, user_id,
           |round(sum(value) OVER (PARTITION BY user_id), 2) AS user_total,
           |round(avg(value) OVER (PARTITION BY user_id), 6) AS user_avg
           |FROM events ORDER BY event_id""".stripMargin))

  // ------------------------------------------------------- sorts / setops

  /** O2 final ORDER BY (`integral_reporting_vodstreaming.sql:158`) with a
    * deterministic tiebreak.
    */
  private val o2 = QueryDef(
    "o2_orderby_desc",
    (s, dir) => t(s, dir, "orders")
      .select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey")),
    Some("""SELECT o_orderkey, o_totalprice FROM orders
           |ORDER BY o_totalprice DESC, o_orderkey""".stripMargin))

  /** U1 UNION ALL with typed NULL placeholders
    * (`integral_reporting_vodstreaming.sql:81-83,115-120`).
    */
  private val u1 = QueryDef(
    "u1_union_typed_nulls",
    (s, dir) => {
      val a = t(s, dir, "events").filter(col("event_type") === "signup")
        .select(lit("signup").as("kind"), col("event_id").as("id"),
          col("value").as("metric"), lit(null).cast("string").as("label"))
      val b = t(s, dir, "orders")
        .select(lit("order").as("kind"), col("o_orderkey").as("id"),
          col("o_totalprice").as("metric"), col("o_orderstatus").as("label"))
      a.unionAll(b).orderBy("kind", "id")
    },
    Some("""SELECT * FROM (
           |  SELECT 'signup' AS kind, event_id AS id, value AS metric,
           |         CAST(NULL AS VARCHAR) AS label
           |  FROM events WHERE event_type = 'signup'
           |  UNION ALL
           |  SELECT 'order', o_orderkey, o_totalprice, o_orderstatus FROM orders)
           |ORDER BY kind, id""".stripMargin))

  /** U2 6-way UNION ALL conforming to one layout
    * (`integral_reporting_dashboard_channel_weekly.sql:72-219`).
    */
  private val u2 = QueryDef(
    "u2_union_6way",
    (s, dir) => {
      def c(df: DataFrame, entity: String, key: String, name: org.apache.spark.sql.Column,
            metric: org.apache.spark.sql.Column): DataFrame =
        df.select(lit(entity).as("entity"), col(key).cast("long").as("key"),
          name.cast("string").as("name"), metric.cast("double").as("metric"))
      c(t(s, dir, "region"), "region", "r_regionkey", col("r_name"), lit(null))
        .unionAll(c(t(s, dir, "nation"), "nation", "n_nationkey", col("n_name"), lit(null)))
        .unionAll(c(t(s, dir, "customer"), "customer", "c_custkey", col("c_name"), col("c_acctbal")))
        .unionAll(c(t(s, dir, "supplier"), "supplier", "s_suppkey", col("s_name"), col("s_acctbal")))
        .unionAll(c(t(s, dir, "part"), "part", "p_partkey", col("p_name"), col("p_retailprice")))
        .unionAll(c(t(s, dir, "orders"), "orders", "o_orderkey", lit(null), col("o_totalprice")))
        .orderBy("entity", "key")
    },
    Some("""SELECT * FROM (
           |  SELECT 'region' AS entity, CAST(r_regionkey AS BIGINT) AS key,
           |         r_name AS name, CAST(NULL AS DOUBLE) AS metric FROM region
           |  UNION ALL SELECT 'nation', CAST(n_nationkey AS BIGINT), n_name, NULL FROM nation
           |  UNION ALL SELECT 'customer', c_custkey, c_name, c_acctbal FROM customer
           |  UNION ALL SELECT 'supplier', s_suppkey, s_name, s_acctbal FROM supplier
           |  UNION ALL SELECT 'part', p_partkey, p_name, p_retailprice FROM part
           |  UNION ALL SELECT 'orders', o_orderkey, CAST(NULL AS VARCHAR), o_totalprice FROM orders)
           |ORDER BY entity, key""".stripMargin))

  /** J13 (beyond the reference surface): interval/range join via
    * `ScaleOps.rangeJoinDays` — shipments falling inside each early
    * order's 30-day window. The bucketed rewrite keeps the plan an
    * equi-join (no BroadcastNestedLoopJoin / cartesian, asserted in
    * `PlanAuditSpec`); the DuckDB oracle uses its native BETWEEN
    * (IEJoin) formulation, so the check is cross-algorithm.
    */
  private val j13 = QueryDef(
    "j13_range_join",
    (s, dir) => {
      val ranges = t(s, dir, "orders").filter(col("o_orderkey") < 100)
        .select(col("o_orderkey"),
          col("o_orderdate").cast("date").as("win_start"),
          date_add(col("o_orderdate").cast("date"), 30).as("win_end"))
      val li = t(s, dir, "lineitem")
        .select(col("l_quantity"), col("l_shipdate").cast("date").as("ship_date"))
      ScaleOps.rangeJoinDays(li, "ship_date", ranges, "win_start", "win_end", 30)
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("n_shipments"), sum("l_quantity").as("sum_qty"))
        .orderBy("o_orderkey")
    },
    Some("""WITH r AS (
           |  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS ws,
           |         CAST(o_orderdate AS DATE) + 30 AS we
           |  FROM orders WHERE o_orderkey < 100)
           |SELECT o_orderkey, count(*) AS n_shipments, sum(l_quantity) AS sum_qty
           |FROM r JOIN lineitem ON CAST(l_shipdate AS DATE) BETWEEN ws AND we
           |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin))

  val all: Seq[QueryDef] = Seq(
    s1, s4, p1, p2, p3, p4, p5, p6, p7, p8,
    j1, j2, j3, j4, j5, j6, j7, j8, j9, j10, j11, j12, j13,
    a1, a2, a3, a3b, a4, a5, a5b, a6, a7, a8,
    w2, w3, w4, o2, u1, u2)
}
