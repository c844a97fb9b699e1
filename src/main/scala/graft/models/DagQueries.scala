package graft.models

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.models.testkit.{NpoFixtures, NpoParquet}
import graft.operators.QueryDef

/** End-to-end DuckDB-oracle checks for the 13-model NPO DAG (VERDICT r2
  * "Next round" item 1): every model runs over the persisted fixture
  * parquet ([[NpoParquet]]) and is compared against an INDEPENDENT
  * hand-port of the reference SQL to DuckDB reading the SAME files.
  * Downstream models read their upstream inputs from the materialized
  * `model_*.parquet`, so each oracle isolates exactly one model's
  * transform — compositionally the whole DAG is covered, and a
  * transcription slip in any model fails its own row.
  *
  * Reference SQL anchors are cited per query; `today` is pinned to
  * `NpoFixtures.today` (2021-01-12) in both engines.
  */
object DagQueries {

  private val D = NpoParquet.dir
  private val today = NpoFixtures.today

  /** DuckDB scan of a fixture source table. */
  private def srcq(name: String) = s"read_parquet('$D/src_$name.parquet/*.parquet')"
  /** DuckDB scan of a materialized model output. */
  private def modelq(name: String) = s"read_parquet('$D/model_$name.parquet/*.parquet')"

  private def srcDf(s: SparkSession, name: String): DataFrame = {
    NpoParquet.ensure(s)
    s.read.parquet(NpoParquet.src(name))
  }
  private def modelDf(s: SparkSession, name: String): DataFrame = {
    NpoParquet.ensure(s)
    s.read.parquet(NpoParquet.model(name))
  }

  /** Deterministic total order over every output column (the driver's
    * hash is row-order-sensitive); DuckDB side mirrors with
    * `ORDER BY ALL NULLS FIRST` (Spark's asc-nulls-first default).
    */
  private def ordered(df: DataFrame): DataFrame =
    df.orderBy(df.columns.toIndexedSeq.map(col): _*)

  /** DuckDB ISO-week spine matching `Reporting.weekSpine` (reference
    * GENERATE_DATE_ARRAY('2018-12-31', CURRENT_DATE(), INTERVAL 1 WEEK)).
    */
  private val spineSql =
    s"SELECT CAST(unnest(generate_series(DATE '2018-12-31', DATE '$today', INTERVAL 7 DAY)) AS DATE) AS weekdate"

  // ---------------------------------------------------------------- poms

  /** `poms_flattened.sql:1-94` — 5 stacked outer UNNESTs + positional
    * broadcaster UNNEST, MIT-939 filter, main-broadcaster pick, age rules.
    */
  private val pomsFlattened = QueryDef(
    "dag_poms_flattened",
    (s, _) => ordered(
      PomsFlattened.build(srcDf(s, "audiovisual_metadata_poms_metadata_v1"))),
    Some(s"""WITH poms AS (SELECT * FROM ${srcq("audiovisual_metadata_poms_metadata_v1")}),
       |e1 AS (SELECT id AS mid, type, sort_date, duration, age_rating,
       |  descendant_of, member_of, genres, schedule_events, broadcasters,
       |  unnest(CASE WHEN episode_of IS NULL OR len(episode_of)=0 THEN [NULL] ELSE episode_of END) AS episode_of_e
       |  FROM poms),
       |e2 AS (SELECT *, unnest(CASE WHEN descendant_of IS NULL OR len(descendant_of)=0 THEN [NULL] ELSE descendant_of END) AS descendant_of_e FROM e1),
       |e3 AS (SELECT *, unnest(CASE WHEN member_of IS NULL OR len(member_of)=0 THEN [NULL] ELSE member_of END) AS member_of_e FROM e2),
       |e4 AS (SELECT *, unnest(CASE WHEN genres IS NULL OR len(genres)=0 THEN [NULL] ELSE genres END) AS genres_e FROM e3),
       |e5 AS (SELECT *, unnest(CASE WHEN schedule_events IS NULL OR len(schedule_events)=0 THEN [NULL] ELSE schedule_events END) AS schedule_events_e FROM e4),
       |e6 AS (SELECT *,
       |  unnest(CASE WHEN broadcasters IS NULL OR len(broadcasters)=0 THEN [NULL] ELSE broadcasters END) AS broadcasters_e,
       |  unnest(CASE WHEN broadcasters IS NULL OR len(broadcasters)=0 THEN [CAST(NULL AS BIGINT)] ELSE generate_series(0, len(broadcasters)-1) END) AS broadcaster_offset
       |  FROM e5),
       |grouped AS (
       |  SELECT mid, type, age_rating, sort_date, duration,
       |    broadcasters_e.id AS broadcaster_id, broadcaster_offset,
       |    MAX(CASE WHEN broadcasters_e.id = 'NOS' THEN TRUE ELSE FALSE END) AS is_nos_content,
       |    MAX(CASE WHEN starts_with(genres_e.id, '3.0.1.1') THEN TRUE ELSE FALSE END) AS is_youth_genre,
       |    MAX(CASE WHEN schedule_events_e.net = 'ZAPP' THEN TRUE ELSE FALSE END) AS is_zapp_net,
       |    MAX(CASE WHEN schedule_events_e.net = 'ZAPPE' THEN TRUE ELSE FALSE END) AS is_zappelin_net,
       |    MAX(CASE WHEN episode_of_e.type = 'SERIES' THEN episode_of_e.mid_ref END) AS episode_of_series,
       |    MAX(CASE WHEN episode_of_e.type = 'SEASON' THEN episode_of_e.mid_ref END) AS episode_of_season,
       |    MAX(CASE WHEN descendant_of_e.type = 'SERIES' THEN descendant_of_e.mid_ref END) AS descendant_of_series,
       |    MAX(CASE WHEN descendant_of_e.type = 'SEASON' THEN descendant_of_e.mid_ref END) AS descendant_of_season,
       |    MAX(CASE WHEN member_of_e.type = 'SERIES' THEN member_of_e.mid_ref END) AS member_of_series,
       |    MAX(CASE WHEN member_of_e.type = 'SEASON' THEN member_of_e.mid_ref END) AS member_of_season
       |  FROM e6
       |  WHERE broadcasters_e.id NOT IN ('PP','RVD','RNW','SOCU','BVN','MTNL','EXT')
       |     OR broadcasters_e.id IS NULL
       |  GROUP BY mid, type, age_rating, sort_date, duration, broadcaster_id, broadcaster_offset),
       |defined AS (
       |  SELECT mid, type,
       |    CASE WHEN type = 'BROADCAST' THEN COALESCE(episode_of_series, member_of_series, descendant_of_series)
       |         WHEN type = 'SEASON' THEN member_of_series
       |         WHEN type = 'SEGMENT' THEN descendant_of_series END AS series_ref,
       |    CASE WHEN type = 'BROADCAST' THEN COALESCE(member_of_season, descendant_of_season, episode_of_season)
       |         WHEN type = 'SEGMENT' THEN descendant_of_season END AS season_ref,
       |    duration, sort_date, age_rating, is_youth_genre, is_zapp_net, is_zappelin_net,
       |    broadcaster_id, is_nos_content,
       |    ROW_NUMBER() OVER (PARTITION BY mid ORDER BY broadcaster_offset ASC NULLS FIRST) AS broadcaster_row_number
       |  FROM grouped)
       |SELECT mid, type,
       |  CASE WHEN series_ref IS NULL OR series_ref = '' THEN mid ELSE series_ref END AS series_id,
       |  CASE WHEN season_ref IS NULL OR season_ref = '' THEN mid ELSE season_ref END AS season_id,
       |  CASE WHEN is_zappelin_net OR (age_rating = 'ALL' AND is_youth_genre) THEN 6
       |       WHEN is_zappelin_net OR (age_rating IN ('ALL','6') AND is_youth_genre) THEN 9
       |       WHEN is_zapp_net OR is_zappelin_net OR (age_rating IN ('ALL','6','9') AND is_youth_genre) THEN 12
       |  END AS min_age_classification,
       |  sort_date, duration, broadcaster_id AS first_broadcaster, is_nos_content
       |FROM defined WHERE broadcaster_row_number = 1
       |ORDER BY ALL NULLS FIRST""".stripMargin))

  // -------------------------------------------------------- tvbroadcasts

  /** `integral_reporting_tvbroadcasts.sql:1-56` — episode grain →
    * title-ISO-week grain → week spine LEFT JOIN + vertaaltabel.
    */
  private val tvBroadcasts = QueryDef(
    "dag_tvbroadcasts",
    (s, _) => ordered(Reporting.tvBroadcasts(s,
      srcDf(s, "advantedge_tv_viewer_density_per_show_daily_v1"),
      srcDf(s, "dim_poms_episodes"),
      srcDf(s, "360_graden_rapportage_vertaaltabel_upload_20_21"), today)),
    Some(s"""WITH tv_ep AS (
       |  SELECT title, date, mediaId,
       |    poms.series_ref AS poms_series_id, poms.series_title AS poms_series_title, channel,
       |    CAST(floor((epoch_us(MIN(endTimeCET)) - epoch_us(MIN(beginTimeCET))) / 60000000.0) AS BIGINT) AS ep_duration_min,
       |    SUM(kdh) AS kdh,
       |    CAST(floor((epoch_us(MIN(endTimeCET)) - epoch_us(MIN(beginTimeCET))) / 60000000.0) AS BIGINT) * SUM(kdh) AS time_spent
       |  FROM ${srcq("advantedge_tv_viewer_density_per_show_daily_v1")} tvb
       |  LEFT JOIN (SELECT episode_id, series_ref, series_title FROM ${srcq("dim_poms_episodes")}) poms
       |    ON poms.episode_id = tvb.mediaId
       |  WHERE regexp_matches(channel, 'NPO') AND RepeatType = 'FIRST' AND audience = '6+'
       |    AND universe = 'Nat[SKO]' AND date_part('isoyear', date) >= 2019
       |  GROUP BY 1,2,3,4,5,6),
       |tv_title AS (
       |  SELECT poms_series_id, poms_series_title,
       |    date_part('week', date) AS weeknr, date_part('isoyear', date) AS year,
       |    COUNT(DISTINCT mediaId || ' - ' || CAST(date AS VARCHAR)) AS tv_number_of_broadcasts,
       |    CAST(SUM(ep_duration_min) AS BIGINT) AS tv_duration_min,
       |    SUM(kdh) AS tv_sum_kdh_per_week,
       |    SUM(time_spent) AS tv_time_spent_per_week_min
       |  FROM tv_ep GROUP BY 1,2,3,4)
       |SELECT vertaal.Naam, vertaal.Net, vertaal.Omroep, vertaal.CCC, weekdate,
       |  tv_title.weeknr, tv_title.year,
       |  CASE WHEN tv_title.poms_series_title IS NOT NULL THEN 1 ELSE 0 END AS tv_broadcast_week,
       |  tv_title.poms_series_id, tv_title.poms_series_title, tv_number_of_broadcasts,
       |  tv_duration_min, tv_sum_kdh_per_week, tv_time_spent_per_week_min
       |FROM ($spineSql) spine
       |LEFT JOIN tv_title ON date_part('week', weekdate) = tv_title.weeknr
       |  AND tv_title.year = date_part('isoyear', weekdate)
       |LEFT JOIN (SELECT Naam, Net, Omroep, CCC, Serie_mid FROM ${srcq("360_graden_rapportage_vertaaltabel_upload_20_21")}) vertaal
       |  ON vertaal.Serie_mid = tv_title.poms_series_id
       |ORDER BY ALL NULLS FIRST""".stripMargin))

  // ------------------------------------------------------------- social

  /** `integral_reporting_youtube.sql:1-27` + the `quintly_youtube_
    * allchannels_weekly` latest-partition source model it refs
    * (`source/ingest_latest/quintly_youtube_allchannels_weekly.sql:1-13`).
    */
  private val youtube = QueryDef(
    "dag_youtube",
    (s, _) => {
      val raw = srcDf(s, "src_quintly_youtube_v1")
      val latest = raw
        .join(raw.groupBy().agg(max(col("partitionDate")).as("mx")),
          col("partitionDate") === col("mx"))
        .drop("mx", "partitionDate")
      ordered(Reporting.youtube(s,
        srcDf(s, "360_graden_rapportage_vertaaltabel_upload_20_21"), latest, today))
    },
    Some(s"""WITH yt AS (
       |  SELECT * EXCLUDE (partitionDate) FROM ${srcq("src_quintly_youtube_v1")}
       |  WHERE partitionDate = (SELECT MAX(partitionDate) FROM ${srcq("src_quintly_youtube_v1")})),
       |vertaal AS (SELECT * FROM ${srcq("360_graden_rapportage_vertaaltabel_upload_20_21")} WHERE Naam IS NOT NULL)
       |SELECT v.Target_YT_subscribers, v.Target_YT_views, v.QL_YT_ID, weekdate,
       |  date_part('week', weekdate) AS weeknr, date_part('isoyear', weekdate) AS year,
       |  y.totalSubscribers AS yt_total_subscribers,
       |  y.totalSubscribersChange AS yt_total_subscribers_change,
       |  y.totalVideos AS yt_number_of_videos,
       |  y.views AS yt_views_per_week,
       |  y.estimatedminuteswatched AS yt_time_spent_per_week_min,
       |  y.totalengagement AS yt_engagement_per_week,
       |  y.averageViewPercentage AS yt_view_percentage,
       |  y.averageViewDuration AS yt_view_duration,
       |  (y.averageViewPercentage / 100) * y.views AS yt_kdh_per_week
       |FROM vertaal v CROSS JOIN ($spineSql) spine
       |LEFT JOIN yt y ON v.QL_YT_ID = y.profileId
       |  AND date_part('isoyear', y.intervalBegin) = date_part('isoyear', weekdate)
       |  AND date_part('week', y.intervalBegin) = date_part('week', weekdate)
       |ORDER BY ALL NULLS FIRST""".stripMargin))

  /** `integral_reporting_facebook.sql:1-23`. */
  private val facebook = QueryDef(
    "dag_facebook",
    (s, _) => ordered(Reporting.facebook(s,
      srcDf(s, "360_graden_rapportage_vertaaltabel_upload_20_21"),
      srcDf(s, "quintly_facebook_pages_weekly"), today)),
    Some(s"""WITH vertaal AS (SELECT * FROM ${srcq("360_graden_rapportage_vertaaltabel_upload_20_21")} WHERE Naam IS NOT NULL)
       |SELECT v.Target_FB_pagelikes, v.Target_FB_reachperpost, v.QL_FB_ID, weekdate,
       |  date_part('week', weekdate) AS weeknr, date_part('isoyear', weekdate) AS year,
       |  f.fans AS fb_fans, f.fansChange AS fb_fans_change,
       |  f.ownPosts AS fb_number_of_posts,
       |  f.pageImpressionsUnique AS fb_reach_per_week,
       |  f.ownPostsEngagement AS fb_engagement_per_week
       |FROM vertaal v CROSS JOIN ($spineSql) spine
       |LEFT JOIN ${srcq("quintly_facebook_pages_weekly")} f ON v.QL_FB_ID = f.profileId
       |  AND date_part('isoyear', f.intervalBegin) = date_part('isoyear', weekdate)
       |  AND date_part('week', f.intervalBegin) = date_part('week', weekdate)
       |ORDER BY ALL NULLS FIRST""".stripMargin))

  /** `integral_reporting_instagram.sql:1-24`. */
  private val instagram = QueryDef(
    "dag_instagram",
    (s, _) => ordered(Reporting.instagram(s,
      srcDf(s, "360_graden_rapportage_vertaaltabel_upload_20_21"),
      srcDf(s, "quintly_instagram_pages_weekly"), today)),
    Some(s"""WITH vertaal AS (SELECT * FROM ${srcq("360_graden_rapportage_vertaaltabel_upload_20_21")} WHERE Naam IS NOT NULL)
       |SELECT v.Target_IG_followers, v.Target_IG_reachperpost, v.QL_IG_ID, weekdate,
       |  date_part('week', weekdate) AS weeknr, date_part('isoyear', weekdate) AS year,
       |  i.followers AS ig_followers, i.followersChange AS ig_followers_change,
       |  i.posts AS ig_number_of_posts, i.postschange AS ig_number_of_posts_change,
       |  i.reach AS ig_reach_per_week, i.totalengagement AS ig_engagement_per_week
       |FROM vertaal v CROSS JOIN ($spineSql) spine
       |LEFT JOIN ${srcq("quintly_instagram_pages_weekly")} i ON v.QL_IG_ID = i.profileId
       |  AND date_part('isoyear', i.intervalBegin) = date_part('isoyear', weekdate)
       |  AND date_part('week', i.intervalBegin) = date_part('week', weekdate)
       |ORDER BY ALL NULLS FIRST""".stripMargin))

  /** `integral_reporting_sites_and_apps.sql:1-49` — pages + programme
    * pages UNION, spine align, app/site conditional sums.
    */
  private val sitesAndApps = QueryDef(
    "dag_sites_and_apps",
    (s, _) => ordered(Reporting.sitesAndApps(s,
      srcDf(s, "360_graden_rapportage_vertaaltabel_upload_20_21"),
      srcDf(s, "atinternet_smarttag_pages_weekly_v2"),
      srcDf(s, "atinternet_smarttag_pages_programmes_weekly_v2"), today)),
    Some(s"""WITH ati AS (
       |  SELECT level_2, platform, weekdate AS ati_weekdate, weeknum, year,
       |    weekly_visitors, daily_visitors, visits
       |  FROM ${srcq("atinternet_smarttag_pages_weekly_v2")}
       |  UNION ALL
       |  SELECT level_2 || ' - ' || programme AS level_2, platform, weekdate AS ati_weekdate,
       |    weeknum, year, weekly_visitors, daily_visitors, visits
       |  FROM ${srcq("atinternet_smarttag_pages_programmes_weekly_v2")}),
       |vertaal AS (SELECT * FROM ${srcq("360_graden_rapportage_vertaaltabel_upload_20_21")} WHERE Naam IS NOT NULL)
       |SELECT v.Target_AT_app, v.Target_AT_site, v.ATI_Titel, weekdate,
       |  date_part('week', weekdate) AS weeknr, date_part('isoyear', weekdate) AS year,
       |  CAST(SUM(CASE WHEN platform LIKE 'app' THEN weekly_visitors END) AS BIGINT) AS app_weekly_visitors,
       |  CAST(SUM(CASE WHEN platform LIKE 'site' THEN weekly_visitors END) AS BIGINT) AS site_weekly_visitors,
       |  CAST(SUM(CASE WHEN platform LIKE 'app' THEN daily_visitors END) AS BIGINT) AS app_daily_visitors,
       |  CAST(SUM(CASE WHEN platform LIKE 'site' THEN daily_visitors END) AS BIGINT) AS site_daily_visitors,
       |  CAST(SUM(CASE WHEN platform LIKE 'app' THEN visits END) AS BIGINT) AS app_visits,
       |  CAST(SUM(CASE WHEN platform LIKE 'site' THEN visits END) AS BIGINT) AS site_visits
       |FROM vertaal v CROSS JOIN ($spineSql) spine
       |LEFT JOIN ati ON v.ATI_Titel = ati.level_2
       |  AND ati.year = date_part('isoyear', weekdate)
       |  AND ati.weeknum = date_part('week', weekdate)
       |GROUP BY 1,2,3,4,5,6
       |ORDER BY ALL NULLS FIRST""".stripMargin))

  val all: Seq[QueryDef] = Seq(
    pomsFlattened, tvBroadcasts, youtube, facebook, instagram, sitesAndApps)
}
