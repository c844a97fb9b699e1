package graft.models

import java.sql.Date

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dialect.Dialect._

/** `integral_reporting_dashboard_channel_weekly` — the 6-way channel
  * stack: conform facebook / instagram / sites / apps / youtube / lineair
  * / VOD to one layout, then window-derive title-level flags.
  * Reference: `/root/reference/models/datamarts/npo-data-hub/reporting/
  * integral_reporting/integral_reporting_dashboard_channel_weekly.sql:1-283`.
  */
object Dashboard {

  private val layout = Seq("Naam", "Net", "Omroep", "CCC", "weekdate", "weeknr", "year",
    "has_intekening", "is_tv_week", "new_releases", "reporting_channel",
    "n_items_per_week", "media_item_type", "weekly_reach_per_week",
    "daily_reach_per_week", "visits_per_week", "engagement_per_week",
    "views_per_week", "hours_watched", "video_kdh_per_week", "video_kdh_per_release")

  private def conform(df: DataFrame): DataFrame = df.select(layout.map(col): _*)

  def build(spark: SparkSession, vertaal: DataFrame, vod: DataFrame, tvb: DataFrame,
            fb: DataFrame, ig: DataFrame, online: DataFrame, yt: DataFrame,
            today: Date): DataFrame = {

    // basis: every title × every week (dashboard:1-11).
    val basis = vertaal.crossJoin(Reporting.weekSpine(spark, today))
      .withColumn("weeknr", isoWeek(col("weekdate")))
      .withColumn("year", isoYear(col("weekdate")))

    // intekening cleaning: series with >=1000 yearly views or >=1
    // broadcast (dashboard:18-34).
    val ssAgg = vod.select(col("POMS_series_id").as("ss_id"), col("year").as("ss_year"),
      col("weeknr").as("ss_weeknr"),
      col("streaming_playcount_over_30s_broadcastsonly").as("ss_views"))
    val tvbAgg = tvb.select(col("poms_series_id").as("tvb_id"), col("year").as("tvb_year"),
      col("weeknr").as("tvb_weeknr"), col("tv_number_of_broadcasts").as("tvb_n"))
    val intekeningCleaning = ssAgg
      .join(tvbAgg, col("tvb_id") === col("ss_id") && col("tvb_year") === col("ss_year") &&
        col("tvb_weeknr") === col("ss_weeknr"), "full_outer")
      .groupBy(coalesce(col("ss_id"), col("tvb_id")).as("POMS_series_id"),
        coalesce(col("ss_year"), col("tvb_year")).as("year"))
      .agg(sum("ss_views").as("n_views_in_reportingyear"),
        sum("tvb_n").as("n_broadcasts_in_year"))
      .filter(col("n_views_in_reportingyear") >= 1000 || col("n_broadcasts_in_year") >= 1)
      .select(col("POMS_series_id").as("scc_id"), col("year").as("scc_year"))

    def nullL = lit(null).cast("long")
    def nullD = lit(null).cast("double")
    def nullI = lit(null).cast("int")
    def nullS = lit(null).cast("string")
    val hasIntekening = when(col("Naam").isNotNull, 1).otherwise(0)

    // facebook branch (dashboard:43-70).
    val fbB = conform(basis
      .join(fb.select(col("QL_FB_ID").as("fb_key"), col("weekdate").as("fb_week"),
        col("fb_number_of_posts"), col("fb_reach_per_week"), col("fb_engagement_per_week")),
        col("QL_FB_ID") === col("fb_key") && col("weekdate") === col("fb_week"), "left")
      .withColumn("has_intekening", hasIntekening)
      .withColumn("is_tv_week", nullI).withColumn("new_releases", nullL)
      .withColumn("reporting_channel", lit("facebook"))
      .withColumn("n_items_per_week", col("fb_number_of_posts"))
      .withColumn("media_item_type", lit("posts"))
      .withColumn("weekly_reach_per_week", col("fb_reach_per_week"))
      .withColumn("daily_reach_per_week", nullL).withColumn("visits_per_week", nullL)
      .withColumn("engagement_per_week", col("fb_engagement_per_week"))
      .withColumn("views_per_week", nullL).withColumn("hours_watched", nullD)
      .withColumn("video_kdh_per_week", nullD).withColumn("video_kdh_per_release", nullD))

    // instagram branch (dashboard:74-99).
    val igB = conform(basis
      .join(ig.select(col("QL_IG_ID").as("ig_key"), col("weekdate").as("ig_week"),
        col("ig_number_of_posts"), col("ig_reach_per_week"), col("ig_engagement_per_week")),
        col("QL_IG_ID") === col("ig_key") && col("weekdate") === col("ig_week"), "left")
      .withColumn("has_intekening", hasIntekening)
      .withColumn("is_tv_week", nullI).withColumn("new_releases", nullL)
      .withColumn("reporting_channel", lit("instagram"))
      .withColumn("n_items_per_week", col("ig_number_of_posts"))
      .withColumn("media_item_type", lit("posts"))
      .withColumn("weekly_reach_per_week", col("ig_reach_per_week"))
      .withColumn("daily_reach_per_week", nullL).withColumn("visits_per_week", nullL)
      .withColumn("engagement_per_week", col("ig_engagement_per_week"))
      .withColumn("views_per_week", nullL).withColumn("hours_watched", nullD)
      .withColumn("video_kdh_per_week", nullD).withColumn("video_kdh_per_release", nullD))

    // sites + apps branches share the online join (dashboard:101-157).
    def onlineBranch(channel: String, weekly: String, daily: String, visits: String) =
      conform(basis
        .join(online.select(col("ATI_Titel").as("on_key"), col("weekdate").as("on_week"),
          col("app_weekly_visitors"), col("site_weekly_visitors"), col("app_daily_visitors"),
          col("site_daily_visitors"), col("app_visits"), col("site_visits")),
          col("ATI_Titel") === col("on_key") && col("weekdate") === col("on_week"), "left")
        .withColumn("has_intekening", hasIntekening)
        .withColumn("is_tv_week", nullI).withColumn("new_releases", nullL)
        .withColumn("reporting_channel", lit(channel))
        .withColumn("n_items_per_week", nullL).withColumn("media_item_type", nullS)
        .withColumn("weekly_reach_per_week", col(weekly))
        .withColumn("daily_reach_per_week", col(daily))
        .withColumn("visits_per_week", col(visits))
        .withColumn("engagement_per_week", nullL)
        .withColumn("views_per_week", nullL).withColumn("hours_watched", nullD)
        .withColumn("video_kdh_per_week", nullD).withColumn("video_kdh_per_release", nullD))
    val sitesB = onlineBranch("sites", "site_weekly_visitors", "site_daily_visitors", "site_visits")
    val appsB = onlineBranch("apps", "app_weekly_visitors", "app_daily_visitors", "app_visits")

    // youtube branch (dashboard:160-186).
    val ytB = conform(basis
      .join(yt.select(col("QL_YT_ID").as("yt_key"), col("weekdate").as("yt_week"),
        col("yt_number_of_videos"), col("yt_engagement_per_week"), col("yt_views_per_week"),
        col("yt_time_spent_per_week_min"), col("yt_kdh_per_week")),
        col("QL_YT_ID") === col("yt_key") && col("weekdate") === col("yt_week"), "left")
      .withColumn("has_intekening", hasIntekening)
      .withColumn("is_tv_week", nullI).withColumn("new_releases", nullL)
      .withColumn("reporting_channel", lit("youtube"))
      .withColumn("n_items_per_week", col("yt_number_of_videos"))
      .withColumn("media_item_type", lit("videos"))
      .withColumn("weekly_reach_per_week", nullL)
      .withColumn("daily_reach_per_week", nullL).withColumn("visits_per_week", nullL)
      .withColumn("engagement_per_week", col("yt_engagement_per_week"))
      .withColumn("views_per_week", col("yt_views_per_week"))
      .withColumn("hours_watched", roundTo(col("yt_time_spent_per_week_min") / 60, 2))
      .withColumn("video_kdh_per_week", roundTo(col("yt_kdh_per_week"), 0))
      .withColumn("video_kdh_per_release", nullD))

    // lineair branch: tv LEFT JOIN basis (dashboard:190-217).
    val tvbB = conform(tvb
      .join(basis.select(col("Naam").as("b_naam"), col("Net").as("b_net"),
        col("Omroep").as("b_omroep"), col("CCC").as("b_ccc"), col("Serie_mid"),
        col("weekdate").as("b_week"), col("weeknr").as("b_weeknr"), col("year").as("b_year")),
        col("Serie_mid") === col("poms_series_id") && col("b_week") === col("weekdate"), "left")
      .withColumn("Naam", coalesce(col("b_naam"), col("poms_series_title")))
      .withColumn("Net", col("b_net")).withColumn("Omroep", col("b_omroep"))
      .withColumn("CCC", col("b_ccc"))
      .withColumn("weekdate", coalesce(col("b_week"), col("weekdate")))
      .withColumn("weeknr", coalesce(col("b_weeknr"), col("weeknr")))
      .withColumn("year", coalesce(col("b_year"), col("year")))
      .withColumn("has_intekening", when(col("b_naam").isNotNull, 1).otherwise(0))
      .withColumn("is_tv_week", col("tv_broadcast_week"))
      .withColumn("new_releases", col("tv_number_of_broadcasts"))
      .withColumn("reporting_channel", lit("lineair"))
      .withColumn("n_items_per_week", col("tv_number_of_broadcasts"))
      .withColumn("media_item_type", lit("videos"))
      .withColumn("weekly_reach_per_week", nullL)
      .withColumn("daily_reach_per_week", nullL).withColumn("visits_per_week", nullL)
      .withColumn("engagement_per_week", nullL).withColumn("views_per_week", nullL)
      .withColumn("hours_watched", roundTo(col("tv_time_spent_per_week_min") / 60, 2))
      .withColumn("video_kdh_per_week", roundTo(col("tv_sum_kdh_per_week"), 0))
      .withColumn("video_kdh_per_release",
        roundTo(col("tv_sum_kdh_per_week") / nullif(col("tv_number_of_broadcasts"), lit(0L)), 0)))

    // VOD branch: stream ⋈ cleaning, grouped (dashboard:219-257).
    val vodB = conform(vod
      .join(intekeningCleaning,
        col("scc_id") === col("POMS_series_id") && col("scc_year") === col("year"), "inner")
      .join(basis.select(col("Naam").as("b_naam"), col("Net").as("b_net"),
        col("Omroep").as("b_omroep"), col("CCC").as("b_ccc"), col("Serie_mid"),
        col("weekdate").as("b_week"), col("weeknr").as("b_weeknr"), col("year").as("b_year")),
        col("Serie_mid") === col("POMS_series_id") && col("b_week") === col("weekdate"), "left")
      .groupBy(coalesce(col("b_naam"), col("POMS_series_title")).as("Naam"),
        col("b_net").as("Net"), col("b_omroep").as("Omroep"), col("b_ccc").as("CCC"),
        coalesce(col("b_week"), col("weekdate")).as("weekdate"),
        coalesce(col("b_weeknr"), col("weeknr")).as("weeknr"),
        coalesce(col("b_year"), col("year")).as("year"))
      .agg(max(when(col("b_naam").isNotNull, 1).otherwise(0)).as("has_intekening"),
        sum("streaming_number_of_episodes").as("n_items_per_week"),
        sum("streaming_playcount_over_30s").as("views_per_week"),
        roundTo(sum(col("streaming_time_spent_sec") / 60 / 60), 2).as("hours_watched"),
        roundTo(sum("streaming_sum_kdh_per_week"), 0).as("video_kdh_per_week"),
        roundTo(sum("streaming_kdh_for_new_released_episode") /
          nullif(sum("streaming_number_of_new_released_eps"), lit(0L)), 0)
          .as("video_kdh_per_release"))
      .withColumn("is_tv_week", nullI).withColumn("new_releases", nullL)
      .withColumn("reporting_channel", lit("VOD"))
      .withColumn("media_item_type", lit("videos"))
      .withColumn("weekly_reach_per_week", nullL)
      .withColumn("daily_reach_per_week", nullL).withColumn("visits_per_week", nullL)
      .withColumn("engagement_per_week", nullL))

    val union = fbB.unionAll(igB).unionAll(sitesB).unionAll(appsB)
      .unionAll(ytB).unionAll(tvbB).unionAll(vodB)

    // Final window post-processing + * EXCEPT(...) (dashboard:260-283).
    val wTitleWeek = Window.partitionBy("weekdate", "Naam")
    val wTitle = Window.partitionBy("Naam")
    val avgKdh = avg(when(col("reporting_channel") === "lineair",
      col("video_kdh_per_release")).otherwise(0.0)).over(wTitle)
    union
      .withColumn("engagement_ratio", roundTo(col("engagement_per_week") /
        nullif(when(col("reporting_channel") === "youtube", col("views_per_week"))
          .otherwise(col("weekly_reach_per_week")), lit(0L)), 3))
      .withColumn("dau_mau_ratio",
        roundTo(col("daily_reach_per_week") / nullif(col("weekly_reach_per_week"), lit(0L)), 2))
      .withColumn("is_tv_week_w", max("is_tv_week").over(wTitleWeek))
      .withColumn("n_total_tv_broadcasts",
        sum(when(col("reporting_channel") === "lineair", col("new_releases"))
          .otherwise(0L)).over(wTitle))
      .withColumn("has_intekening_w", max("has_intekening").over(wTitle))
      .withColumn("lineair_kdh_bucket",
        when(avgKdh < 100000, "avg lineaire KDH < 100.000")
          .when(avgKdh >= 4000000, "avg lineaire KDH > 4.000.000")
          .when(avg(when(col("reporting_channel") === "lineair" &&
            col("video_kdh_per_release").isNotNull, 1).otherwise(0)).over(wTitle) === 0,
            "no lineair KDH in this week")
          .otherwise("avg lineaire KDH >= 100.000 and < 4.0000.000"))
      .drop("is_tv_week", "new_releases", "has_intekening")
      .withColumnRenamed("is_tv_week_w", "is_tv_week")
      .withColumnRenamed("has_intekening_w", "has_intekening")
  }
}
