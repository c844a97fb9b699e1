package graft.models

import java.sql.Date

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dialect.Dialect._

/** The weekly reporting models: a generated ISO-week spine LEFT JOINed to
  * channel facts and the per-title "intekening" dimension (vertaaltabel).
  * References: `/root/reference/models/datamarts/npo-data-hub/reporting/
  * integral_reporting/integral_reporting_{tvbroadcasts,vodstreaming,
  * youtube,facebook,instagram,sites_and_apps}.sql`.
  *
  * `today` is injected (the reference's CURRENT_DATE(),
  * tvbroadcasts.sql:52 etc.) so runs are reproducible/testable.
  */
object Reporting {

  /** Weekly date spine from 2018-12-31 (ISO week 1 of 2019) to today. */
  def weekSpine(spark: org.apache.spark.sql.SparkSession, today: Date): DataFrame =
    spark.range(1).select(explode(generateDateArray(
      lit(Date.valueOf("2018-12-31")), lit(today), 7)).as("weekdate"))

  /** `integral_reporting_tvbroadcasts.sql:1-56`. */
  def tvBroadcasts(spark: org.apache.spark.sql.SparkSession, adv: DataFrame,
                   dimPoms: DataFrame, vertaal: DataFrame, today: Date): DataFrame = {
    // Episode grain (lines 1-17).
    val tvEp = adv
      .join(dimPoms.select(col("episode_id"), col("series_ref"), col("series_title")),
        col("episode_id") === col("mediaId"), "left")
      .filter(col("channel").rlike("NPO") && col("RepeatType") === "FIRST" &&
        col("audience") === "6+" && col("universe") === "Nat[SKO]" &&
        isoYear(col("date")) >= 2019)
      .groupBy(col("title"), col("date"), col("mediaId"),
        col("series_ref").as("poms_series_id"),
        col("series_title").as("poms_series_title"), col("channel"))
      .agg(timestampDiffMinutes(min(col("endTimeCET").cast("timestamp")),
        min(col("beginTimeCET").cast("timestamp"))).as("ep_duration_min"),
        sum("kdh").as("kdh"))
      .withColumn("time_spent", col("ep_duration_min") * col("kdh"))

    // Title-week grain (lines 20-33).
    val tvTitle = tvEp
      .groupBy(col("poms_series_id"), col("poms_series_title"),
        isoWeek(col("date")).as("weeknr"), isoYear(col("date")).as("year"))
      .agg(countDistinct(concat(col("mediaId"), lit(" - "),
        col("date").cast("string"))).as("tv_number_of_broadcasts"),
        sum("ep_duration_min").as("tv_duration_min"),
        sum("kdh").as("tv_sum_kdh_per_week"),
        sum("time_spent").as("tv_time_spent_per_week_min"))

    // Spine-driven final (lines 36-56).
    weekSpine(spark, today)
      .join(tvTitle,
        isoWeek(col("weekdate")) === col("weeknr") &&
          col("year") === isoYear(col("weekdate")), "left")
      .join(vertaal.select(col("Naam"), col("Net"), col("Omroep"), col("CCC"),
        col("Serie_mid")), col("Serie_mid") === col("poms_series_id"), "left")
      .select(col("Naam"), col("Net"), col("Omroep"), col("CCC"), col("weekdate"),
        col("weeknr"), col("year"),
        when(col("poms_series_title").isNotNull, 1).otherwise(0).as("tv_broadcast_week"),
        col("poms_series_id"), col("poms_series_title"), col("tv_number_of_broadcasts"),
        col("tv_duration_min"), col("tv_sum_kdh_per_week"), col("tv_time_spent_per_week_min"))
  }

  /** `integral_reporting_vodstreaming.sql:1-158`. */
  def vodStreaming(spark: org.apache.spark.sql.SparkSession, adv: DataFrame,
                   pomsFlattened: DataFrame, streamsDaily: DataFrame, dimPoms: DataFrame,
                   vertaal: DataFrame, today: Date): DataFrame = {
    // New TV episodes with season windows (lines 1-17). NOTE the
    // reference's missing comma: `poms_info.season_id channel` ALIASES
    // season_id AS channel — mirrored deliberately (SURVEY.md §7.4.5).
    val newTvEps = adv
      .join(pomsFlattened.select(col("mid"), col("season_id")),
        col("mid") === col("mediaId"), "left")
      .filter(col("channel").rlike("NPO") && col("RepeatType") === "FIRST" &&
        col("audience") === "6+" && col("universe") === "Nat[SKO]" &&
        isoYear(col("date")) >= 2019)
      .select(col("title"), col("date").as("first_broadcast_date"),
        col("beginTimeCET").as("start_eps"), col("mediaId"),
        col("season_id").as("channel"),
        timestampDiffMinutes(col("endTimeCET").cast("timestamp"),
          col("beginTimeCET").cast("timestamp")).as("ep_duration_min"),
        min(col("date")).over(Window.partitionBy(col("season_id")))
          .as("first_known_eps_date_season"),
        max(col("date")).over(Window.partitionBy(col("season_id")))
          .as("last_known_eps_date_season"))

    // First day a mid crossed 100 qualified plays (lines 19-39).
    val firstStreamingDays = streamsDaily
      .filter(col("mtd_type") === "BROADCAST")
      .groupBy("evt_mid", "evt_date")
      .agg(sum("evt_play_count_over_30s").as("streaming_playcount_over_30s"))
      .filter(col("streaming_playcount_over_30s") >= 100)
      .groupBy("evt_mid").agg(min("evt_date").as("first_stream_day"))

    // New-release derivation (lines 42-67): linear date, else the
    // 90-day-rule pick between scheduled date and first streaming day.
    val releaseDate = coalesce(col("first_broadcast_date"),
      when(datediff(col("start_linear_first_broadcast").cast("date"),
        col("first_stream_day")) >= 90, col("first_stream_day"))
        .otherwise(col("start_linear_first_broadcast").cast("date")))
    val seasonW = Window.partitionBy("season_ref")
    val newReleases = dimPoms
      .join(newTvEps.select(col("mediaId"), col("first_broadcast_date")),
        col("episode_id") === col("mediaId"), "left")
      .join(firstStreamingDays, col("evt_mid") === col("episode_id"), "left")
      .filter(col("episode_type") === "BROADCAST")
      .select(col("episode_id").as("mediaid"), col("series_ref"), col("series_title"),
        col("episode_type"), col("season_ref"), col("index").as("eps_nr"),
        col("season_index").as("season_nr"),
        releaseDate.as("first_broadcast_date"),
        when(col("first_broadcast_date").isNull, 0).otherwise(1).as("has_had_linear_release"),
        when(coalesce(col("first_broadcast_date"),
          col("start_linear_first_broadcast").cast("date")).isNull, 0).otherwise(1)
          .as("has_scheduled_lineair_release"),
        min(releaseDate).over(seasonW).as("first_broadcast_season"),
        max(releaseDate).over(seasonW).as("last_known_broadcast_season"))
      .distinct()

    // streaming_info (lines 68-125): release-week KDH branch UNION ALL
    // stream-week consumption branch, with typed NULL placeholders.
    val dimSel = dimPoms.select(col("episode_id"),
      col("series_ref").as("p_series_ref"), col("series_title").as("p_series_title"))

    val within28 = col("mtd_type") === "BROADCAST" &&
      datediff(col("evt_date"), col("last_known_broadcast_season")) <= 28

    val branchA = streamsDaily
      .join(newReleases, col("mediaid") === col("evt_mid"), "left")
      .join(dimSel, col("episode_id") === col("evt_mid"), "left")
      .groupBy(col("evt_mid"), col("p_series_ref").as("series_ref"),
        col("p_series_title").as("series_title"), col("evt_programme"),
        isoWeek(col("first_broadcast_date")).as("evt_weeknr"),
        isoYear(col("first_broadcast_date")).as("evt_year"))
      .agg(
        avg("mtd_duration_in_sec").as("streaming_duration_sec"),
        sum(when(within28, col("evt_playback_time_total_in_sec")).otherwise(0.0))
          .divide(nullif(max(when(within28, col("mtd_duration_in_sec")).otherwise(0L)), lit(0L)))
          .as("streaming_kdh_for_new_released_episode"),
        max(when(within28, col("evt_mid"))).as("mid_counts_for_new_release"),
        max(when(col("has_had_linear_release") === 1, 1).otherwise(0))
          .as("has_had_linear_release"),
        max(when(col("has_had_linear_release") === 0 &&
          col("has_scheduled_lineair_release") === 1, 1).otherwise(0))
          .as("has_scheduled_lineair_release"),
        max(when(col("has_had_linear_release") === 0 &&
          col("has_scheduled_lineair_release") === 0, 1).otherwise(0))
          .as("vod_only_release"))
      .select(col("evt_mid"), col("series_ref"), col("series_title"), col("evt_programme"),
        col("evt_weeknr"), col("evt_year"), col("streaming_duration_sec"),
        lit(null).cast("long").as("streaming_playcount_over_30s"),
        lit(null).cast("long").as("streaming_playcount_over_30s_broadcastsonly"),
        lit(null).cast("double").as("streaming_time_spent_sec"),
        col("streaming_kdh_for_new_released_episode"),
        col("mid_counts_for_new_release"),
        lit(null).cast("double").as("streaming_kdh_per_episode"),
        col("has_had_linear_release"), col("has_scheduled_lineair_release"),
        col("vod_only_release"))

    val branchB = streamsDaily
      .join(dimSel, col("episode_id") === col("evt_mid"), "left")
      .groupBy(col("evt_mid"), col("p_series_ref").as("series_ref"),
        col("p_series_title").as("series_title"), col("evt_programme"),
        isoWeek(col("evt_date")).as("evt_weeknr"),
        isoYear(col("evt_date")).as("evt_year"))
      .agg(
        avg("mtd_duration_in_sec").as("streaming_duration_sec"),
        sum("evt_play_count_over_30s").as("streaming_playcount_over_30s"),
        sum(when(col("mtd_type") === "BROADCAST", col("evt_play_count_over_30s"))
          .otherwise(0L)).as("streaming_playcount_over_30s_broadcastsonly"),
        sum("evt_playback_time_total_in_sec").as("streaming_time_spent_sec"),
        (sum("evt_playback_time_total_in_sec") / nullif(avg("mtd_duration_in_sec"), lit(0.0)))
          .as("streaming_kdh_per_episode"))
      .select(col("evt_mid"), col("series_ref"), col("series_title"), col("evt_programme"),
        col("evt_weeknr"), col("evt_year"), col("streaming_duration_sec"),
        col("streaming_playcount_over_30s"),
        col("streaming_playcount_over_30s_broadcastsonly"),
        col("streaming_time_spent_sec"),
        lit(null).cast("double").as("streaming_kdh_for_new_released_episode"),
        lit(null).cast("string").as("mid_counts_for_new_release"),
        col("streaming_kdh_per_episode"),
        lit(null).cast("int").as("has_had_linear_release"),
        lit(null).cast("int").as("has_scheduled_lineair_release"),
        lit(null).cast("int").as("vod_only_release"))

    val streamingInfo = branchA.unionAll(branchB)

    // Spine-driven weekly rollup (lines 127-158).
    weekSpine(spark, today)
      .join(streamingInfo,
        col("evt_year") === isoYear(col("weekdate")) &&
          col("evt_weeknr") === isoWeek(col("weekdate")), "left")
      .join(vertaal.select(col("Stream_Titel"), col("Serie_mid")),
        col("Serie_mid") === col("series_ref"), "left")
      .groupBy(coalesce(col("Stream_Titel"), col("series_title")).as("Stream_join_title"),
        col("series_title").as("POMS_series_title"),
        col("series_ref").as("POMS_series_id"),
        when(col("Stream_Titel").isNull, 0).otherwise(1).as("has_intekening"),
        col("weekdate"))
      .agg(
        countDistinct(col("evt_mid")).as("streaming_number_of_episodes"),
        sum("streaming_duration_sec").as("streaming_duration_sec"),
        sum("streaming_playcount_over_30s").as("streaming_playcount_over_30s"),
        sum("streaming_playcount_over_30s_broadcastsonly")
          .as("streaming_playcount_over_30s_broadcastsonly"),
        sum("streaming_time_spent_sec").as("streaming_time_spent_sec"),
        sum("streaming_kdh_per_episode").as("streaming_sum_kdh_per_week"),
        sum("streaming_kdh_for_new_released_episode")
          .as("streaming_kdh_for_new_released_episode"),
        countDistinct(col("mid_counts_for_new_release"))
          .as("streaming_number_of_new_released_eps"),
        max("has_had_linear_release").as("week_with_new_lineair_release"),
        max(when(col("has_had_linear_release") === 1 ||
          col("has_scheduled_lineair_release") === 1 ||
          col("vod_only_release") === 1, 1).otherwise(0)).as("week_with_new_release"))
      .withColumn("weeknr", isoWeek(col("weekdate")))
      .withColumn("year", isoYear(col("weekdate")))
      .orderBy(col("weekdate").desc)
  }

  /** The three Quintly social models share one spine-align shape
    * (`integral_reporting_{youtube,facebook,instagram}.sql`): vertaal ×
    * week spine LEFT JOIN weekly stats on (profile, ISO year, ISO week).
    */
  private def socialJoin(spark: org.apache.spark.sql.SparkSession, vertaal: DataFrame,
                         weekly: DataFrame, vertaalKey: String, today: Date): DataFrame =
    vertaal.filter(col("Naam").isNotNull)
      .crossJoin(weekSpine(spark, today))
      .join(weekly,
        col(vertaalKey) === col("profileId") &&
          isoYear(col("intervalBegin")) === isoYear(col("weekdate")) &&
          isoWeek(col("intervalBegin")) === isoWeek(col("weekdate")), "left")

  /** `integral_reporting_youtube.sql:1-27`. */
  def youtube(spark: org.apache.spark.sql.SparkSession, vertaal: DataFrame,
              yt: DataFrame, today: Date): DataFrame =
    socialJoin(spark, vertaal, yt, "QL_YT_ID", today)
      .select(col("Target_YT_subscribers"), col("Target_YT_views"), col("QL_YT_ID"),
        col("weekdate"), isoWeek(col("weekdate")).as("weeknr"),
        isoYear(col("weekdate")).as("year"),
        col("totalSubscribers").as("yt_total_subscribers"),
        col("totalSubscribersChange").as("yt_total_subscribers_change"),
        col("totalVideos").as("yt_number_of_videos"),
        col("views").as("yt_views_per_week"),
        col("estimatedminuteswatched").as("yt_time_spent_per_week_min"),
        col("totalengagement").as("yt_engagement_per_week"),
        col("averageViewPercentage").as("yt_view_percentage"),
        col("averageViewDuration").as("yt_view_duration"),
        ((col("averageViewPercentage") / 100) * col("views")).as("yt_kdh_per_week"))

  /** `integral_reporting_facebook.sql:1-23`. */
  def facebook(spark: org.apache.spark.sql.SparkSession, vertaal: DataFrame,
               fb: DataFrame, today: Date): DataFrame =
    socialJoin(spark, vertaal, fb, "QL_FB_ID", today)
      .select(col("Target_FB_pagelikes"), col("Target_FB_reachperpost"), col("QL_FB_ID"),
        col("weekdate"), isoWeek(col("weekdate")).as("weeknr"),
        isoYear(col("weekdate")).as("year"),
        col("fans").as("fb_fans"), col("fansChange").as("fb_fans_change"),
        col("ownPosts").as("fb_number_of_posts"),
        col("pageImpressionsUnique").as("fb_reach_per_week"),
        col("ownPostsEngagement").as("fb_engagement_per_week"))

  /** `integral_reporting_instagram.sql:1-24`. */
  def instagram(spark: org.apache.spark.sql.SparkSession, vertaal: DataFrame,
                ig: DataFrame, today: Date): DataFrame =
    socialJoin(spark, vertaal, ig, "QL_IG_ID", today)
      .select(col("Target_IG_followers"), col("Target_IG_reachperpost"), col("QL_IG_ID"),
        col("weekdate"), isoWeek(col("weekdate")).as("weeknr"),
        isoYear(col("weekdate")).as("year"),
        col("followers").as("ig_followers"),
        col("followersChange").as("ig_followers_change"),
        col("posts").as("ig_number_of_posts"),
        col("postschange").as("ig_number_of_posts_change"),
        col("reach").as("ig_reach_per_week"),
        col("totalengagement").as("ig_engagement_per_week"))

  /** `integral_reporting_sites_and_apps.sql:1-49`. */
  def sitesAndApps(spark: org.apache.spark.sql.SparkSession, vertaal: DataFrame,
                   pagesWeekly: DataFrame, pagesProgrammesWeekly: DataFrame,
                   today: Date): DataFrame = {
    val cols = Seq("platform", "weekdate", "weeknum", "year",
      "weekly_visitors", "daily_visitors", "visits")
    val ati = pagesWeekly.select((col("level_2") +: cols.map(col)): _*)
      .unionAll(pagesProgrammesWeekly.select(
        (concat(col("level_2"), lit(" - "), col("programme")).as("level_2") +:
          cols.map(col)): _*))
      .withColumnRenamed("weekdate", "ati_weekdate")
    vertaal.filter(col("Naam").isNotNull)
      .crossJoin(weekSpine(spark, today))
      .join(ati,
        col("ATI_Titel") === col("level_2") &&
          col("year") === isoYear(col("weekdate")) &&
          col("weeknum") === isoWeek(col("weekdate")), "left")
      .groupBy(col("Target_AT_app"), col("Target_AT_site"), col("ATI_Titel"),
        col("weekdate"), isoWeek(col("weekdate")).as("weeknr"),
        isoYear(col("weekdate")).as("year"))
      .agg(
        sum(when(col("platform").like("app"), col("weekly_visitors"))).as("app_weekly_visitors"),
        sum(when(col("platform").like("site"), col("weekly_visitors"))).as("site_weekly_visitors"),
        sum(when(col("platform").like("app"), col("daily_visitors"))).as("app_daily_visitors"),
        sum(when(col("platform").like("site"), col("daily_visitors"))).as("site_daily_visitors"),
        sum(when(col("platform").like("app"), col("visits"))).as("app_visits"),
        sum(when(col("platform").like("site"), col("visits"))).as("site_visits"))
  }
}
