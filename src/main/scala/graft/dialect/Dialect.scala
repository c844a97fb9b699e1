package graft.dialect

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** BigQuery-dialect semantics re-expressed as plain Spark `Column`
  * compositions (SURVEY.md §2.8, §7.1). No custom Catalyst expressions are
  * needed: every shim folds into whole-stage codegen because it only
  * composes built-ins.
  *
  * The shims encode the semantic traps called out in SURVEY.md §7.4:
  *   - `SPLIT` takes a LITERAL delimiter in BigQuery but a Java regex in
  *     Spark (`/root/reference/models/datamarts/npo-data-hub/intermediary/
  *     atinternet_smarttag_streams_daily_v4.sql:53` splits on `_||_`, a
  *     pathological regex alternation if left unquoted);
  *   - `arr[SAFE_OFFSET(i)]` is 0-based and NULL out-of-range (same file
  *     line 69,113-123) vs Spark's 1-based `element_at`;
  *   - `EXTRACT(ISOWEEK/ISOYEAR ...)` (e.g. `.../reporting/
  *     integral_reporting/integral_reporting_youtube.sql:24-25`) must use
  *     ISO-8601 week numbering — 2018-12-31 is week 1 of ISO year 2019,
  *     which is why the reference's weekly spine starts there
  *     (`integral_reporting_tvbroadcasts.sql:52`).
  */
object Dialect {

  /** BigQuery `arr[SAFE_OFFSET(i)]`: 0-based index, NULL when out of range
    * (never an error). Spark's `try_element_at` is 1-based and NULL-safe.
    */
  def safeOffset(arr: Column, i: Int): Column = try_element_at(arr, lit(i + 1))

  /** BigQuery `SPLIT(s, delim)`: the delimiter is a literal string, not a
    * regex. `Pattern.quote` keeps `_||_` (and any other metacharacter
    * soup) literal under Spark's regex-based `split`.
    */
  def splitLit(s: Column, delim: String): Column = split(s, Pattern.quote(delim))

  /** BigQuery `EXTRACT(ISOWEEK FROM d)` — Spark's weekofyear is ISO-8601. */
  def isoWeek(d: Column): Column = weekofyear(d)

  /** BigQuery `EXTRACT(ISOYEAR FROM d)` — ISO week-numbering year. */
  def isoYear(d: Column): Column = date_part(lit("YEAROFWEEK"), d)

  /** BigQuery `DATE_DIFF(a, b, DAY)` (a - b in whole days). */
  def dateDiffDays(a: Column, b: Column): Column = datediff(a, b)

  /** BigQuery `TIMESTAMP_DIFF(a, b, SECOND)` for a >= b. Computed as a
    * floor over the microsecond delta so Spark and any ANSI oracle agree
    * on truncation. (`atinternet_smarttag_streams_daily_v4.sql:64` orders
    * an as-of dedup by exactly this expression.)
    */
  def timestampDiffSeconds(a: Column, b: Column): Column =
    floor((unix_micros(a) - unix_micros(b)) / lit(1000000.0)).cast("long")

  /** BigQuery `TIMESTAMP_DIFF(a, b, MINUTE)` for a >= b. */
  def timestampDiffMinutes(a: Column, b: Column): Column =
    floor((unix_micros(a) - unix_micros(b)) / lit(60000000.0)).cast("long")

  /** BigQuery `TIMESTAMP_TRUNC(ts, MINUTE)`. */
  def truncMinute(ts: Column): Column = date_trunc("minute", ts)

  /** BigQuery `GENERATE_DATE_ARRAY(start, end, INTERVAL n DAY)` —
    * inclusive of `end` when it lands on the step, like `sequence`.
    */
  def generateDateArray(start: Column, end: Column, stepDays: Int): Column =
    sequence(start, end, expr(s"interval $stepDays days"))

  /** BigQuery `GENERATE_TIMESTAMP_ARRAY(start, end, INTERVAL n MINUTE)`
    * (`atinternet_smarttag_streams_daily_v4.sql:37` densifies broadcast
    * windows per minute with this).
    */
  def generateTimestampArray(start: Column, end: Column, stepMinutes: Int): Column =
    sequence(start, end, expr(s"interval $stepMinutes minutes"))

  /** BigQuery `STRING_AGG(x, sep ORDER BY x)` — deterministic ordered
    * concatenation (`atinternet_smarttag_streams_daily_v4.sql:219`).
    * `collect_list` order is nondeterministic under parallelism, so the
    * sort happens after collection. CAP: the whole group is buffered in
    * ONE in-memory aggregation buffer, so this form is for groups that
    * fit comfortably in a task's heap (the reference's usage —
    * channel-per-day lists — is tiny). For skewed or unbounded groups
    * use [[stringAggOrderedLarge]], whose buffers are bounded.
    */
  def stringAggOrdered(c: Column, sep: String): Column =
    array_join(array_sort(collect_list(c)), sep)

  /** Ordered STRING_AGG for LARGE/skewed groups, with bounded
    * aggregation buffers: `ntile(chunks)` over the value order splits
    * each group into ~equal runs (the window sort is spillable —
    * Spark's external sorter — unlike a `collect_list` buffer, which is
    * not), each run concatenates in its own reducer (a hot key spreads
    * over `chunks` tasks instead of one), and the per-group finish
    * stitches `chunks` strings in run order. Result rows are identical
    * to `groupBy(group).agg(stringAggOrdered(value, sep))` — proved in
    * `DialectSpec` on a pathologically skewed key. The final row still
    * holds the full concatenation (that IS the output); what's bounded
    * is every intermediate buffer.
    */
  def stringAggOrderedLarge(df: org.apache.spark.sql.DataFrame, groupCols: Seq[String],
                            value: String, sep: String, chunks: Int = 64)
      : org.apache.spark.sql.DataFrame = {
    require(chunks > 0, "chunks must be positive")
    val g = groupCols.map(org.apache.spark.sql.functions.col)
    df.withColumn("__chunk", org.apache.spark.sql.functions.ntile(chunks).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(g: _*).orderBy(col(value))))
      .groupBy((g :+ col("__chunk")): _*)
      .agg(array_join(array_sort(collect_list(col(value))), sep).as("__part"))
      .groupBy(g: _*)
      .agg(array_join(
        expr("transform(array_sort(collect_list(struct(__chunk, __part))), p -> p.__part)"),
        sep).as(s"${value}_agg"))
  }

  /** BigQuery `NULLIF(s, '')` — the reference's empty-split-segment escape
    * (`atinternet_smarttag_streams_daily_v4.sql:113-119`).
    */
  def nullifEmpty(c: Column): Column = nullif(c, lit(""))

  /** Engine-portable fixed-point rounding: `floor(x*10^n + 0.5)/10^n`
    * evaluates bit-identically under IEEE-754 in any engine, unlike
    * `ROUND(x, n)` whose half-point behavior differs between BigDecimal
    * (Spark) and multiply-and-rint (DuckDB/C++) implementations. Used for
    * per-row derived values that must hash-match an external oracle.
    */
  def roundTo(c: Column, n: Int): Column = {
    val p = math.pow(10, n)
    floor(c * lit(p) + lit(0.5)) / lit(p)
  }

  /** BigQuery `DIV(a, b)` — integer division (truncation; callers in the
    * reference only divide non-negatives, `.../intermediary/
    * atinternet_smarttag_streams_daily_v4.sql:181`).
    */
  def div(a: Column, b: Column): Column =
    floor(a.cast("double") / b.cast("double")).cast("long")
}
