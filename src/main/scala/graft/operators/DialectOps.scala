package graft.operators

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.dialect.Dialect._
import graft.sources.Tables

/** SURVEY.md §2.8 scalar-function dialect shims, each exercised as a
  * verifiable query over testdata (plus literal spines for the calendar
  * edge cases the testdata can't reach). These are the highest-risk
  * semantic translations (SURVEY.md §7.4): literal-vs-regex SPLIT, 0-based
  * NULL-safe SAFE_OFFSET, ISO week/year at year boundaries.
  */
object DialectOps {

  /** SPLIT literal + SAFE_OFFSET + NULLIF empty-segment escape
    * (`atinternet_smarttag_streams_daily_v4.sql:53,69,113-123`).
    */
  private val fSplit = QueryDef(
    "f_split_safe_offset",
    (s, dir) => {
      val parts = splitLit(
        concat(col("event_type"), lit("_||_"), col("user_id").cast("string"), lit("_||_")), "_||_")
      Tables.load(s, dir, "events")
        .withColumn("parts", parts)
        .select(col("event_id"),
          safeOffset(col("parts"), 0).as("name0"),
          safeOffset(col("parts"), 1).as("uid1"),
          safeOffset(col("parts"), 2).as("tail2"),
          safeOffset(col("parts"), 5).as("missing5"),
          nullifEmpty(safeOffset(col("parts"), 2)).as("tail2_nn"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, parts[1] AS name0, parts[2] AS uid1, parts[3] AS tail2,
           |parts[6] AS missing5, nullif(parts[3], '') AS tail2_nn FROM (
           |  SELECT event_id,
           |    string_split(event_type || '_||_' || CAST(user_id AS VARCHAR) || '_||_',
           |                 '_||_') AS parts
           |  FROM events)
           |ORDER BY event_id""".stripMargin))

  /** ISO week/year across three year boundaries, incl. 2018-12-31 (ISO
    * week 1 of 2019 — the reference's spine start,
    * `integral_reporting_tvbroadcasts.sql:52`) and 2021-01-01 (ISO week 53
    * of 2020). (`integral_reporting_youtube.sql:24-25`.)
    */
  private val fIso = QueryDef(
    "f_iso_calendar",
    (s, _) => s.range(1)
      .select(explode(generateDateArray(
        lit(Date.valueOf("2018-12-24")), lit(Date.valueOf("2021-01-10")), 1)).as("d"))
      .select(col("d"), isoWeek(col("d")).cast("int").as("iso_week"),
        isoYear(col("d")).cast("int").as("iso_year"))
      .orderBy("d"),
    Some("""SELECT CAST(d AS DATE) AS d,
           |CAST(weekofyear(d) AS INTEGER) AS iso_week,
           |CAST(isoyear(d) AS INTEGER) AS iso_year
           |FROM (SELECT unnest(generate_series(DATE '2018-12-24', DATE '2021-01-10',
           |                                    INTERVAL 1 DAY)) AS d)
           |ORDER BY d""".stripMargin))

  /** DATE/TIMESTAMP functions: DATE(ts), TIMESTAMP_TRUNC, TIMESTAMP_DIFF,
    * DATE_DIFF, DATE_SUB (`atinternet_smarttag_streams_daily_v4.sql:64,70,
    * 75,3-10`; `integral_reporting_vodstreaming.sql:84-87`).
    */
  private val fDatetime = QueryDef(
    "f_datetime_funcs",
    (s, dir) => {
      val epoch = to_timestamp(lit("2024-01-01 00:00:00"))
      Tables.load(s, dir, "events")
        .withColumn("event_date", to_date(col("ts")))
        .select(col("event_id"), col("event_date"),
          truncMinute(col("ts")).as("minute_ts"),
          timestampDiffSeconds(col("ts"), epoch).as("secs_since"),
          timestampDiffMinutes(col("ts"), epoch).as("mins_since"),
          dateDiffDays(col("event_date"), lit(Date.valueOf("2024-01-01"))).as("days_since"),
          date_sub(col("event_date"), 7).as("week_ago"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, CAST(ts AS DATE) AS event_date,
           |date_trunc('minute', CAST(ts AS TIMESTAMP)) AS minute_ts,
           |CAST(floor((epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(TIMESTAMP '2024-01-01 00:00:00')) / 1000000.0) AS BIGINT) AS secs_since,
           |CAST(floor((epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(TIMESTAMP '2024-01-01 00:00:00')) / 60000000.0) AS BIGINT) AS mins_since,
           |CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INTEGER) AS days_since,
           |CAST(ts AS DATE) - 7 AS week_ago
           |FROM events ORDER BY event_id""".stripMargin))

  /** String dialect: CONCAT, STARTS_WITH, REGEXP_CONTAINS, LIKE, NULLIF,
    * COALESCE, IF, CASE WHEN (`poms_flattened.sql:11-20`;
    * `integral_reporting_sites_and_apps.sql:33-38`).
    */
  private val fString = QueryDef(
    "f_string_funcs",
    (s, dir) => Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        concat(col("lang"), lit(":"), col("source")).as("tag"),
        col("text").startsWith("the").as("starts_the"),
        col("text").rlike("spark").as("has_spark"),
        col("source").like("src%").as("is_src"),
        nullif(col("lang"), lit("en")).as("lang_nn"),
        coalesce(nullif(col("lang"), lit("en")), lit("english")).as("lang_cv"),
        when(col("n_chars") > 200, "long").otherwise("short").as("len_flag"),
        when(col("n_chars") < 100, "S").when(col("n_chars") < 300, "M")
          .otherwise("L").as("size_class"))
      .orderBy("doc_id"),
    Some("""SELECT doc_id, lang || ':' || source AS tag,
           |starts_with(text, 'the') AS starts_the,
           |regexp_matches(text, 'spark') AS has_spark,
           |source LIKE 'src%' AS is_src,
           |nullif(lang, 'en') AS lang_nn,
           |coalesce(nullif(lang, 'en'), 'english') AS lang_cv,
           |CASE WHEN n_chars > 200 THEN 'long' ELSE 'short' END AS len_flag,
           |CASE WHEN n_chars < 100 THEN 'S' WHEN n_chars < 300 THEN 'M'
           |     ELSE 'L' END AS size_class
           |FROM documents ORDER BY doc_id""".stripMargin))

  /** DIV, ROUND, `/` with NULLIF denominator
    * (`atinternet_smarttag_streams_daily_v4.sql:181`;
    * `integral_reporting_dashboard_channel_weekly.sql:266-268`).
    */
  private val fMath = QueryDef(
    "f_math_div_round",
    (s, dir) => Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        div(col("l_orderkey"), lit(100)).as("bucket"),
        roundTo(col("l_extendedprice"), 1).as("price_r1"),
        roundTo(col("l_extendedprice") / nullif(col("l_quantity") - 10.0, lit(0.0)), 4)
          .as("unit_ratio"))
      .orderBy("l_orderkey", "l_linenumber"),
    Some("""SELECT l_orderkey, l_linenumber,
           |CAST(floor(l_orderkey / 100.0) AS BIGINT) AS bucket,
           |floor(l_extendedprice * 10.0 + 0.5) / 10.0 AS price_r1,
           |floor(l_extendedprice / nullif(l_quantity - 10.0, 0.0) * 10000.0 + 0.5) / 10000.0 AS unit_ratio
           |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin))

  /** GENERATE_TIMESTAMP_ARRAY from literals
    * (`atinternet_smarttag_streams_daily_v4.sql:37`).
    */
  private val fGenTs = QueryDef(
    "f_generate_timestamp_array",
    (s, _) => s.range(1)
      .select(explode(generateTimestampArray(
        to_timestamp(lit("2024-03-01 06:00:00")),
        to_timestamp(lit("2024-03-01 07:30:00")), 5)).as("m"))
      .orderBy("m"),
    Some("""SELECT unnest(generate_series(TIMESTAMP '2024-03-01 06:00:00',
           |TIMESTAMP '2024-03-01 07:30:00', INTERVAL 5 MINUTE)) AS m
           |ORDER BY m""".stripMargin))

  /** JSON metadata extraction over `events.props` — beyond the reference
    * surface (it uses no JSON) but core to training-data pipelines where
    * per-record metadata rides along as JSON strings. Both the string
    * path (`get_json_object`) and the typed path (`from_json` with an
    * explicit schema — the scale-safe form, since schema-on-read keeps
    * the parse inside codegen and prunes unreferenced fields).
    */
  private val fJson = QueryDef(
    "f_json_extract",
    (s, dir) => Tables.load(s, dir, "events")
      .withColumn("parsed", from_json(col("props"), lit("k INT")))
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        col("parsed.k").as("k_int"))
      .orderBy("event_id"),
    Some("""SELECT event_id,
           |json_extract_string(props, '$.k') AS k_str,
           |CAST(json_extract(props, '$.k') AS INTEGER) AS k_int
           |FROM events ORDER BY event_id""".stripMargin))

  /** Array higher-order functions — transform / filter / aggregate /
    * array_distinct / sort_array / slice / array_join over the
    * word-split corpus, mirrored against DuckDB's list_* family (two
    * independent HOF implementations). ASCII-only corpus keeps the sort
    * collation-free.
    *
    * Scale note: Spark evaluates HOF lambdas INTERPRETED per element
    * (no codegen). That is fine here — a handful of cheap ops per
    * short array — but heavy per-element scalar work (hashing, big
    * polynomials) belongs in a typed `Dataset.map` JVM loop instead:
    * the winnowing fingerprint benched 24–30 s as HOFs vs ~0.9 s typed
    * at sf0.1 (see `TextOps.winnowFingerprint`).
    */
  private val fArrayHof = QueryDef(
    "f_array_hof",
    (s, dir) => {
      val words = splitLit(col("text"), " ")
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          size(filter(words, w => length(w) > 4)).as("n_long"),
          aggregate(transform(words, w => length(w).cast("long")),
            lit(0L), (acc, x) => acc + x).as("total_len"),
          array_join(slice(sort_array(array_distinct(words)), 1, 3), ",")
            .as("first3_distinct"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
           |  CAST(len(list_filter(words, w -> strlen(w) > 4)) AS INTEGER) AS n_long,
           |  CAST(list_sum(list_transform(words, w -> strlen(w))) AS BIGINT) AS total_len,
           |  array_to_string(list_slice(list_sort(list_distinct(words)), 1, 3), ',')
           |    AS first3_distinct
           |FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
           |ORDER BY doc_id""".stripMargin))

  val all: Seq[QueryDef] = Seq(fSplit, fIso, fDatetime, fString, fMath, fGenTs, fJson,
    fArrayHof)
}
