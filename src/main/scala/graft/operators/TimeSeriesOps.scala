package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dialect.Dialect._
import graft.sources.Tables

/** Time-series operators over the `events` stream table: dense gap-fill
  * with linear interpolation, and OHLC-style resampling. Both are the
  * standard shape for sensor/metric pipelines.
  *
  * Scale: everything partitions by `user_id` — the window functions and
  * the spine explode shuffle once on the user key and then stay
  * co-partitioned; no global window appears in any plan (a global sort
  * exists only as the verify dump's final ORDER BY). The hourly spine
  * fan-out is bounded by the observed [min,max] hour span per user, not
  * by a fixed calendar, so idle series cost nothing.
  */
object TimeSeriesOps {

  /** Hourly gap-fill + linear interpolation of the per-user mean `view`
    * value: every hour between a user's first and last observation gets
    * a value — observed hours keep theirs, gap hours get
    * `pv + (nv-pv) * elapsed/gap` between the flanking observations.
    *
    * Formulated as ONE scan: `lead()` pairs each observation with its
    * successor, then each pair explodes into its gap hours and
    * interpolates directly. The naive spine-join form (build a per-user
    * min..max hour spine, left-join observations back, IGNORE-NULLS
    * windows to find flanks) reads and aggregates the events table
    * TWICE and shuffles the dense spine; this form shuffles the sparse
    * observations once on `user_id` and fans out map-side. Plan locked
    * in `PlanAuditSpec`: exactly one parquet scan, one Window, no join.
    */
  private val gapfill = QueryDef(
    "ts1_gapfill_interp",
    (s, dir) => {
      val wUser = Window.partitionBy("user_id").orderBy("hr")
      val hEpoch = unix_timestamp(col("h"))
      Tables.load(s, dir, "events")
        .filter(col("event_type") === "view")
        .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hr"))
        .agg(avg("value").as("obs_v"))
        .withColumn("next_hr", lead("hr", 1).over(wUser))
        .withColumn("next_v", lead("obs_v", 1).over(wUser))
        .select(col("user_id"), col("hr"), col("obs_v"), col("next_v"),
          unix_timestamp(col("hr")).as("t0"),
          unix_timestamp(col("next_hr")).as("t1"),
          explode(sequence(col("hr"),
            coalesce(col("next_hr") - expr("interval 1 hour"), col("hr")),
            expr("interval 1 hour"))).as("h"))
        .select(col("user_id"), col("h").as("hr"),
          roundTo(
            when(col("h") === col("hr"), col("obs_v"))
              .otherwise(col("obs_v") + (col("next_v") - col("obs_v")) *
                (hEpoch - col("t0")) / (col("t1") - col("t0"))), 4).as("v"),
          (col("h") === col("hr")).as("is_observed"))
        .orderBy("user_id", "hr")
    },
    Some("""WITH obs AS (
           |  SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
           |         avg(value) AS obs_v
           |  FROM events WHERE event_type = 'view' GROUP BY 1, 2),
           |paired AS (
           |  SELECT user_id, hr, obs_v,
           |    lead(hr) OVER w AS next_hr, lead(obs_v) OVER w AS next_v
           |  FROM obs WINDOW w AS (PARTITION BY user_id ORDER BY hr)),
           |fanned AS (
           |  SELECT user_id, hr, obs_v, next_v,
           |    epoch(hr) AS t0, epoch(next_hr) AS t1,
           |    unnest(generate_series(hr,
           |      coalesce(next_hr - INTERVAL 1 HOUR, hr), INTERVAL 1 HOUR)) AS h
           |  FROM paired)
           |SELECT user_id, h AS hr,
           |  floor((CASE WHEN h = fanned.hr THEN obs_v
           |              ELSE obs_v + (next_v - obs_v) * (epoch(h) - t0) / (t1 - t0)
           |         END) * 10000 + 0.5) / 10000 AS v,
           |  h = fanned.hr AS is_observed
           |FROM fanned
           |ORDER BY user_id, 2""".stripMargin))

  /** OHLC resample: per user per 6-hour bucket, open/high/low/close of
    * `value` with a deterministic (ts, event_id) intra-bucket order.
    * Open/close come from a windowed row_number rather than min_by/
    * max_by so tie-breaking is identical in both engines.
    */
  private val ohlc = QueryDef(
    "ts2_resample_ohlc",
    (s, dir) => {
      val bucketed = Tables.load(s, dir, "events")
        .withColumn("bucket",
          timestamp_seconds(floor(unix_timestamp(col("ts")) / 21600L) * 21600L))
      val w = Window.partitionBy("user_id", "bucket").orderBy("ts", "event_id")
      bucketed
        .withColumn("rn_a", row_number().over(w))
        .withColumn("rn_d", row_number().over(
          Window.partitionBy("user_id", "bucket")
            .orderBy(col("ts").desc, col("event_id").desc)))
        .groupBy("user_id", "bucket")
        .agg(
          max(when(col("rn_a") === 1, col("value"))).as("open"),
          max("value").as("high"),
          min("value").as("low"),
          max(when(col("rn_d") === 1, col("value"))).as("close"),
          count(lit(1)).as("n"))
        .orderBy("user_id", "bucket")
    },
    Some("""SELECT user_id, bucket,
           |  max(CASE WHEN rn_a = 1 THEN value END) AS open,
           |  max(value) AS high, min(value) AS low,
           |  max(CASE WHEN rn_d = 1 THEN value END) AS close,
           |  count(*) AS n
           |FROM (
           |  SELECT user_id, value,
           |    make_timestamp(CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 21600) AS BIGINT) * 21600 * 1000000) AS bucket,
           |    row_number() OVER (PARTITION BY user_id,
           |      CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 21600) AS BIGINT)
           |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn_a,
           |    row_number() OVER (PARTITION BY user_id,
           |      CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 21600) AS BIGINT)
           |      ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn_d
           |  FROM events)
           |GROUP BY user_id, bucket
           |ORDER BY user_id, bucket""".stripMargin))

  /** LOCF forward-fill + backward-fill: only `purchase` events carry an
    * observation; every event row gets the most recent purchase value
    * (ffill) and the next upcoming one (bfill) in (ts, event_id) order.
    * `last/first(..., ignoreNulls)` over running frames — the Spark
    * spelling of IGNORE NULLS — against DuckDB's native
    * `last_value(x IGNORE NULLS)`. Values are copied, never computed,
    * so the hashes match without rounding.
    *
    * Scale: one shuffle on `user_id`, then each fill is a RUNNING
    * (unbounded-preceding) frame — bfill over the DESCENDING sort,
    * which selects the same "next non-null at-or-after this row" value
    * as a forward unbounded-FOLLOWING frame. The frame direction is
    * load-bearing at scale: Spark's UnboundedFollowingWindowFunctionFrame
    * re-evaluates the aggregate from each row to partition end — O(n²)
    * per partition — which the Zipf corpus turned into a single
    * ~2M-row hot-user task with ~2·10¹² aggregate updates (killed at
    * 29 min, ETA hours; r12). Running frames accumulate in O(n); the
    * second sort of the already-exchanged partition is the whole cost.
    * Plan-locked: no Following frame bound (`PlanAuditSpec`).
    */
  private val locf = QueryDef(
    "ts3_locf_ffill",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wDesc = Window.partitionBy("user_id")
        .orderBy(col("ts").desc, col("event_id").desc)
      val runDesc = wDesc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.load(s, dir, "events")
        .withColumn("obs",
          when(col("event_type") === "purchase", col("value")))
        .select(col("user_id"), col("event_id"), col("obs"),
          last("obs", ignoreNulls = true).over(run).as("ffill"),
          last("obs", ignoreNulls = true).over(runDesc).as("bfill"))
        .orderBy("user_id", "event_id")
    },
    Some("""SELECT user_id, event_id, obs,
           |  last_value(obs IGNORE NULLS) OVER (PARTITION BY user_id
           |    ORDER BY ts, event_id
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill,
           |  first_value(obs IGNORE NULLS) OVER (PARTITION BY user_id
           |    ORDER BY ts, event_id
           |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS bfill
           |FROM (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
           |        CASE WHEN event_type = 'purchase' THEN value END AS obs
           |      FROM events)
           |ORDER BY user_id, event_id""".stripMargin))

  /** Frame-bounded EWMA (α = 1/2, horizon 16) in EXACT integer
    * arithmetic: weights are powers of two, values quantize to 1e6
    * BIGINT, so `num = Σ qv[t−k]·2^(15−k)` and the available-weight
    * denominator are exact and the truncating division is
    * deterministic cross-engine — no floating-point accumulation
    * order anywhere. The 16-term lag fan is 32 window expressions
    * over ONE user_id sort (a true recursive EWMA is inherently
    * sequential; the 2^-16 tail this truncates is below the
    * quantization floor anyway).
    */
  private val ewma = QueryDef(
    "ts4_ewma_exact",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val qv = expr("CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)")
      val num = (0 until 16).map { k =>
        coalesce(lag(col("qv"), k).over(w), lit(0L)) * lit(1L << (15 - k))
      }.reduce(_ + _)
      val den = (0 until 16).map { k =>
        coalesce(lag(lit(1L), k).over(w), lit(0L)) * lit(1L << (15 - k))
      }.reduce(_ + _)
      Tables.load(s, dir, "events")
        .withColumn("qv", qv)
        .select(col("user_id"), col("event_id"), col("qv"),
          (num.cast("long")).as("num"), (den.cast("long")).as("den"))
        .select(col("user_id"), col("event_id"), col("qv"),
          expr("num div den").as("ewma_q"))
        .orderBy("user_id", "event_id")
    },
    Some {
      val num = (0 until 16).map(k =>
        s"coalesce(lag(qv, $k) OVER w, 0) * ${1L << (15 - k)}").mkString(" + ")
      val den = (0 until 16).map(k =>
        s"coalesce(lag(1, $k) OVER w, 0) * ${1L << (15 - k)}").mkString(" + ")
      s"""SELECT user_id, event_id, qv,
         |  CAST(($num) AS BIGINT) // CAST(($den) AS BIGINT) AS ewma_q
         |FROM (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
         |        CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS qv FROM events)
         |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         |ORDER BY user_id, event_id""".stripMargin
    })

  /** Rolling z-score outlier flags: per user, |value − rolling mean|
    * > 2·rolling stddev over the trailing 20 events (ROWS frame in
    * both engines so ties cannot diverge). The z value is portably
    * rounded; rows too early for a stable estimate (fewer than 5
    * samples or zero variance) get NULL z and false flag via the same
    * guards in both engines. One user_id shuffle, two co-frame window
    * aggregates.
    */
  private val zscore = QueryDef(
    "ts5_zscore_outliers",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(-19, Window.currentRow)
      Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("value"),
          avg("value").over(w).as("mu"),
          stddev_samp(col("value")).over(w).as("sd"),
          count(lit(1)).over(w).as("n"))
        .select(col("user_id"), col("event_id"), col("value"),
          roundTo(when(col("n") >= 5 && col("sd") > 0,
            (col("value") - col("mu")) / col("sd")), 4).as("z"))
        .withColumn("is_outlier", coalesce(abs(col("z")) > 2.0, lit(false)))
        .orderBy("user_id", "event_id")
    },
    Some("""SELECT user_id, event_id, value,
           |  floor(CASE WHEN n >= 5 AND sd > 0 THEN (value - mu) / sd END
           |        * 10000.0 + 0.5) / 10000.0 AS z,
           |  coalesce(abs(floor(CASE WHEN n >= 5 AND sd > 0 THEN (value - mu) / sd END
           |        * 10000.0 + 0.5) / 10000.0) > 2.0, false) AS is_outlier
           |FROM (
           |  SELECT user_id, event_id, value,
           |    avg(value) OVER w AS mu,
           |    stddev_samp(value) OVER w AS sd,
           |    count(*) OVER w AS n
           |  FROM (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events)
           |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
           |               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
           |ORDER BY user_id, event_id""".stripMargin))

  /** Autocorrelation function: per event type, Pearson correlation of
    * the daily event count with itself at lags 1, 2, 3 and 7 — the
    * standard seasonality probe (a strong lag-7 says weekly rhythm).
    * Two-phase: the raw stream first collapses to one row per
    * (type, day) — after which each lag is a window `lag()` plus a
    * `corr` aggregate over at most |types|×|days| rows, so the four
    * lag passes cost nothing next to the single events scan that feeds
    * them. At 100 TB the pre-aggregate is the whole job (map-side
    * partial count, one shuffle on (type, day)); the ACF math never
    * sees raw events.
    */
  private val autocorr = QueryDef(
    "ts6_autocorr",
    (s, dir) => {
      val daily = Tables.load(s, dir, "events")
        .groupBy(col("event_type"), col("ts").cast("date").as("d"))
        .agg(count(lit(1)).cast("double").as("cnt"))
      val w = Window.partitionBy("event_type").orderBy("d")
      val lagged = Seq(1, 2, 3, 7).map { k =>
        daily
          .withColumn("prev", lag("cnt", k).over(w))
          .filter(col("prev").isNotNull)
          .groupBy("event_type")
          .agg(roundTo(corr(col("cnt"), col("prev")), 4).as("acf"))
          .select(col("event_type"), lit(k).as("lag"), col("acf"))
      }
      lagged.reduce(_ unionAll _).orderBy("event_type", "lag")
    },
    Some {
      val one =
        """SELECT event_type, %LAG% AS lag,
          |  floor(corr(cnt, prev) * 10000.0 + 0.5) / 10000.0 AS acf
          |FROM (SELECT event_type, cnt,
          |        lag(cnt, %LAG%) OVER (PARTITION BY event_type ORDER BY d) AS prev
          |      FROM daily)
          |WHERE prev IS NOT NULL GROUP BY event_type""".stripMargin
      s"""WITH daily AS (
         |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
         |    CAST(count(*) AS DOUBLE) AS cnt
         |  FROM events GROUP BY 1, 2)
         |${Seq(1, 2, 3, 7).map(k => one.replace("%LAG%", k.toString)).mkString("\nUNION ALL\n")}
         |ORDER BY event_type, lag""".stripMargin
    })

  /** Robust outlier detection on the daily series: median/MAD instead
    * of mean/stddev, so a burst day cannot drag the threshold toward
    * itself (the textbook failure of z-scores on spiky metrics). A day
    * is an outlier when |x − median| > 3 · 1.4826 · MAD. Two exact
    * percentile passes over the (type, day) pre-aggregate — tiny by
    * the same argument as ts6 — then a broadcast join back. All
    * comparisons happen on portably-quantized values.
    */
  private val madOutliers = QueryDef(
    "ts7_mad_outliers",
    (s, dir) => {
      val daily = Tables.load(s, dir, "events")
        .groupBy(col("event_type"), col("ts").cast("date").as("d"))
        .agg(roundTo(sum("value"), 4).as("x"))
      val med = daily.groupBy("event_type")
        .agg(expr("percentile(x, 0.5)").as("med"))
      val mad = daily.join(broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(first("med").as("med"),
          expr("percentile(abs(x - med), 0.5)").as("mad"))
        .select(col("event_type"), roundTo(col("med"), 4).as("med"),
          roundTo(col("mad"), 4).as("mad"))
      daily.join(broadcast(mad), "event_type")
        .select(col("event_type"), col("d"), col("x"),
          (abs(col("x") - col("med")) > lit(3 * 1.4826) * col("mad")).as("is_outlier"))
        .orderBy("event_type", "d")
    },
    Some("""WITH daily AS (
           |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
           |    floor(sum(value) * 10000.0 + 0.5) / 10000.0 AS x
           |  FROM events GROUP BY 1, 2),
           |med AS (
           |  SELECT event_type, quantile_cont(x, 0.5) AS med
           |  FROM daily GROUP BY event_type),
           |mad AS (
           |  SELECT d.event_type,
           |    floor(any_value(m.med) * 10000.0 + 0.5) / 10000.0 AS med,
           |    floor(quantile_cont(abs(d.x - m.med), 0.5) * 10000.0 + 0.5) / 10000.0 AS mad
           |  FROM daily d JOIN med m ON m.event_type = d.event_type
           |  GROUP BY d.event_type)
           |SELECT d.event_type, d.d, d.x,
           |  abs(d.x - m.med) > 3 * 1.4826 * m.mad AS is_outlier
           |FROM daily d JOIN mad m ON m.event_type = d.event_type
           |ORDER BY d.event_type, d.d""".stripMargin))

  /** Rolling EXACT median over a trailing 20-event frame — the robust
    * denoiser (a single spike shifts a moving average by spike/20 but
    * leaves the median untouched). Spark has no median window, so the
    * frame materializes as a sorted 20-element array per row
    * (`collect_list` over the bounded ROWS frame + `sort_array`) and
    * the median interpolates the two middles on even counts — exactly
    * DuckDB's `median(DOUBLE) OVER w`. The frame bound is what makes
    * this scale-sane: per-row state is O(frame), the only exchange is
    * the user_id partition sort every ts* row already pays, and the
    * array never outlives its projection.
    */
  private val rollingMedian = QueryDef(
    "ts8_rolling_median",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(-19, Window.currentRow)
      Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("value"),
          sort_array(collect_list(col("value")).over(w)).as("vals"))
        .select(col("user_id"), col("event_id"), col("value"),
          roundTo(when(size(col("vals")) % 2 === 1,
              element_at(col("vals"), ((size(col("vals")) + 1) / 2).cast("int")))
            .otherwise((element_at(col("vals"), (size(col("vals")) / 2).cast("int")) +
              element_at(col("vals"), (size(col("vals")) / 2).cast("int") + 1)) / 2.0), 4)
            .as("rolling_median"))
        .orderBy("user_id", "event_id")
    },
    Some("""SELECT user_id, event_id, value,
           |  floor(median(value) OVER w * 10000.0 + 0.5) / 10000.0 AS rolling_median
           |FROM (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events)
           |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
           |             ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
           |ORDER BY user_id, event_id""".stripMargin))

  /** Classical seasonal decomposition of the daily event-value series
    * (the moving-average flavor of STL): trend = centered 7-day moving
    * average (defined only on FULL frames — edge days stay NULL rather
    * than averaging a partial week), seasonal = per-day-of-week mean of
    * the detrended series, remainder = value − trend − seasonal. The
    * anomaly-screen input every metrics pipeline wants before alerting
    * on raw values. Exactness: values quantize to 1e-4 BIGINT at
    * ingest, the trend/seasonal means are integer `div` (truncating in
    * BOTH engines — verified: DuckDB `//` truncates toward zero like
    * Spark's `div`), and day-of-week is pure epoch-day arithmetic
    * ((days+4) mod 7, Sunday=0) so no calendar-function semantics can
    * diverge. The bounded ROWS frame is O(n·7) — the UNBOUNDED
    * FOLLOWING trap (SCALE.md) does not apply.
    *
    * Scale: the first aggregation collapses the corpus to ≤ |calendar|
    * rows (the fact→day reduction is map-side combinable); every
    * window after that runs over the DAY series, whose length is set
    * by the calendar, not the corpus — the global (unpartitioned)
    * windows here are windows over ~365 rows/year and would be
    * per-(metric, series) partitioned the moment a series key exists.
    */
  private val seasonal = QueryDef(
    "ts9_seasonal_decompose",
    (s, dir) => {
      val daily = Tables.load(s, dir, "events")
        .groupBy(to_date(col("ts")).as("d"))
        .agg(sum(floor(col("value") * lit(1e4) + lit(0.5)).cast("long")).as("x4"))
      val w = Window.orderBy("d").rowsBetween(-3, 3)
      val tr = daily
        .withColumn("s4", sum("x4").over(w))
        .withColumn("nf", count(lit(1)).over(w))
        .withColumn("trend4", when(col("nf") === 7, expr("s4 div 7")))
        .withColumn("dt4", col("x4") - col("trend4"))
        .withColumn("dow", (datediff(col("d"), lit("1970-01-01")) + 4) % 7)
      tr.withColumn("seas4", expr("sum(dt4) OVER (PARTITION BY dow) div count(dt4) OVER (PARTITION BY dow)"))
        .select(col("d"),
          (col("x4") / lit(10000.0)).as("value"),
          (col("trend4") / lit(10000.0)).as("trend"),
          (col("seas4") / lit(10000.0)).as("seasonal"),
          ((col("x4") - col("trend4") - col("seas4")) / lit(10000.0)).as("remainder"))
        .orderBy("d")
    },
    Some("""WITH daily AS (
           |  SELECT CAST(ts AS DATE) AS d,
           |    CAST(sum(CAST(floor(value * 10000.0 + 0.5) AS BIGINT)) AS BIGINT) AS x4
           |  FROM events GROUP BY 1),
           |tr AS (
           |  SELECT d, x4,
           |    CASE WHEN count(*) OVER w = 7
           |         THEN CAST(sum(x4) OVER w AS BIGINT) // 7 END AS trend4,
           |    (datediff('day', DATE '1970-01-01', d) + 4) % 7 AS dow
           |  FROM daily
           |  WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
           |se AS (
           |  SELECT d, x4, trend4,
           |    CAST(sum(x4 - trend4) OVER (PARTITION BY dow) AS BIGINT)
           |      // count(x4 - trend4) OVER (PARTITION BY dow) AS seas4
           |  FROM tr)
           |SELECT d, x4 / 10000.0 AS value, trend4 / 10000.0 AS trend,
           |  seas4 / 10000.0 AS seasonal,
           |  (x4 - trend4 - seas4) / 10000.0 AS remainder
           |FROM se ORDER BY d""".stripMargin))

  val all: Seq[QueryDef] = Seq(gapfill, ohlc, locf, ewma, zscore, autocorr,
    madOutliers, rollingMedian, seasonal)
}
