package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dialect.Dialect._
import graft.sources.Tables

/** The flagship end-to-end slice (SURVEY.md §7.3): the as-of livestream
  * match + 30s-qualified distinct play count at the heart of
  * `/root/reference/models/datamarts/npo-data-hub/intermediary/
  * atinternet_smarttag_streams_daily_v4.sql:26-161`, re-expressed on the
  * `events` table. One query covering J8 (minute densify), J10 (as-of via
  * window dedup), W2 (row_number over an expression), P7 (QUALIFY), A3/A4
  * (COUNT(DISTINCT IF(...))).
  *
  * Shape: `signup` events play the role of broadcast starts (a 10-minute
  * "show" per signup, per user = channel); `view`/`click`/`purchase`
  * events are media events. Each media event is bucketed to its minute,
  * equi-joined to the densified show minutes, deduped to the nearest show
  * start, then aggregated per show with a >= 30 qualification threshold.
  *
  * Scale design: the join is a pure equi-join on (user_id, minute) — at
  * 100 TB both sides shuffle-partition on that compound key and the
  * nearest-match dedup window partitions by media event id, so no
  * cross-product and no driver-side state. Densification multiplies the
  * small (signup) side only, BEFORE the join, exactly like the
  * reference's GENERATE_TIMESTAMP_ARRAY densify.
  */
object Flagship {

  def build(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")

    // Broadcast windows: one row per show-minute (J8).
    val shows = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("show_id"), col("user_id").as("s_user"),
        truncMinute(col("ts")).as("show_begin"))
      .select(col("show_id"), col("s_user"), col("show_begin"),
        explode(generateTimestampArray(col("show_begin"),
          col("show_begin") + expr("interval 9 minutes"), 1)).as("s_minute"))

    // Media events bucketed to the minute.
    val media = ev.filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("event_id").as("play_id"), col("user_id"), col("value"),
        col("ts"), truncMinute(col("ts")).as("minute"))

    // As-of match: equi-join on (user, minute), nearest show start wins
    // (J10/W2/P7). Ties broken by show_id for determinism.
    val matched = media
      .join(shows, col("user_id") === col("s_user") && col("minute") === col("s_minute"))
      .withColumn("diff_s", timestampDiffSeconds(col("ts"), col("show_begin")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("play_id").orderBy(col("diff_s"), col("show_id"))))
      .filter(col("rn") === 1)

    // Per-show aggregation with the >=30 qualification (A3/A4).
    matched.groupBy("show_id")
      .agg(countDistinct(col("play_id")).as("plays"),
        countDistinct(when(col("value") >= 30.0, col("play_id"))).as("qualified_plays"),
        round(sum("value"), 2).as("total_value"))
      .orderBy("show_id")
  }

  val oracle: String =
    """WITH shows AS (
      |  SELECT event_id AS show_id, user_id AS s_user,
      |    date_trunc('minute', CAST(ts AS TIMESTAMP)) AS show_begin,
      |    unnest(generate_series(
      |      date_trunc('minute', CAST(ts AS TIMESTAMP)),
      |      date_trunc('minute', CAST(ts AS TIMESTAMP)) + INTERVAL 9 MINUTE,
      |      INTERVAL 1 MINUTE)) AS s_minute
      |  FROM events WHERE event_type = 'signup'),
      |media AS (
      |  SELECT event_id AS play_id, user_id, value, CAST(ts AS TIMESTAMP) AS ts,
      |    date_trunc('minute', CAST(ts AS TIMESTAMP)) AS minute
      |  FROM events WHERE event_type IN ('view', 'click', 'purchase')),
      |matched AS (
      |  SELECT m.play_id, m.value, s.show_id,
      |    row_number() OVER (PARTITION BY m.play_id ORDER BY
      |      CAST(floor((epoch_us(m.ts) - epoch_us(s.show_begin)) / 1000000.0) AS BIGINT),
      |      s.show_id) AS rn
      |  FROM media m JOIN shows s
      |    ON m.user_id = s.s_user AND m.minute = s.s_minute)
      |SELECT show_id, count(DISTINCT play_id) AS plays,
      |  count(DISTINCT CASE WHEN value >= 30.0 THEN play_id END) AS qualified_plays,
      |  round(sum(value), 2) AS total_value
      |FROM matched WHERE rn = 1
      |GROUP BY show_id ORDER BY show_id""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("flagship_asof_densify", (s, dir) => build(s, dir), Some(oracle)))
}
