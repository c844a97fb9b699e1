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
      val latest = NpoDag.latestYoutube(s, srcDf(s, "src_quintly_youtube_v1"))
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

  // ------------------------------------------------------- streams_daily

  /** String-typed window list: DuckDB 1.0 mis-evaluates
    * `ts_col::DATE IN (DATE ...)` (returns false), so the oracle compares
    * date STRINGS — which is also exactly what the Spark side does
    * (`StreamsDaily.build`'s `cast("date").cast("string").isin`).
    */
  private val partsSql =
    StreamsDaily.partitionsFor(today).map(d => s"'$d'").mkString(", ")

  /** `atinternet_smarttag_streams_daily_v4.sql:24-244` — minute-densified
    * livestream as-of matching, payload split/clean, stream→day rollup,
    * POMS metadata enrichment. Window list pinned to
    * `StreamsDaily.partitionsFor(2021-01-12)` in both engines.
    */
  private val streamsDaily = QueryDef(
    "dag_streams_daily",
    (s, _) => ordered(StreamsDaily.build(
      srcDf(s, "advantedge_tv_viewer_density_per_show_daily_v1"),
      srcDf(s, "media_events"),
      srcDf(s, "live_stream_name_mapping_v1"),
      srcDf(s, "audiovisual_metadata_poms_metadata_v1"),
      StreamsDaily.partitionsFor(today))),
    Some(s"""WITH adv_src AS (SELECT * FROM ${srcq("advantedge_tv_viewer_density_per_show_daily_v1")}),
       |me AS (SELECT * FROM ${srcq("media_events")}),
       |mapping AS (SELECT * FROM ${srcq("live_stream_name_mapping_v1")}),
       |poms AS (SELECT * FROM ${srcq("audiovisual_metadata_poms_metadata_v1")}),
       |adv_events AS (
       |  SELECT DISTINCT date AS adv_date, beginTimeCET AS adv_beginTimeCET,
       |    endTimeCET AS adv_endTimeCET, adv_minute, title AS adv_title,
       |    channel AS adv_channel, mediaId AS adv_mid
       |  FROM (SELECT *, unnest(generate_series(CAST(beginTimeCET AS TIMESTAMP),
       |          CAST(endTimeCET AS TIMESTAMP), INTERVAL 1 MINUTE)) AS adv_minute
       |        FROM adv_src WHERE regexp_matches(channel, 'NPO'))),
       |live AS (
       |  SELECT e.d_rm_playid,
       |    e.d_visit_id || e.d_uv_id AS unique_user_id,
       |    e.d_date_hour_event, e.d_rm_action, e.d_rm_l2, e.d_rm_playback_time,
       |    string_split(e.d_rm_content, '_||_') AS content,
       |    a.adv_mid AS matched_livestream_id,
       |    string_split(e.d_rm_theme1, '_||_') AS theme1,
       |    CASE WHEN regexp_matches(e.d_rm_theme2, '_/|/|_')
       |         THEN string_split(e.d_rm_theme2, '_||_') END AS theme2,
       |    string_split(e.d_rm_theme3, '_||_') AS theme3,
       |    CASE WHEN a.adv_mid IS NOT NULL THEN 'livetvzender - streamID_matched'
       |         ELSE 'livetvzender - no_streamID_to_match' END AS stream_match_type,
       |    ROW_NUMBER() OVER (
       |      PARTITION BY e.d_rm_playid, e.d_visit_id || e.d_uv_id, e.d_date_hour_event,
       |                   e.d_rm_action, e.d_rm_playback_time
       |      ORDER BY CAST(floor((epoch_us(e.d_date_hour_event) - epoch_us(a.adv_beginTimeCET)) / 1000000.0) AS BIGINT) ASC NULLS FIRST) AS dedup
       |  FROM me e
       |  INNER JOIN mapping cm ON cm.channel_id = NULLIF(string_split(e.d_rm_content, '_||_')[2], '')
       |  LEFT JOIN adv_events a ON cm.channel = a.adv_channel
       |    AND date_trunc('minute', e.d_date_hour_event) = a.adv_minute
       |  WHERE e.d_rm_type <> 'Animations' AND e.d_rm_theme1 = 'livetvzender'
       |    AND CAST(CAST(e.d_date_hour_event AS DATE) AS VARCHAR) IN ($partsSql)),
       |regular AS (
       |  SELECT d_rm_playid, d_visit_id || d_uv_id AS unique_user_id, d_date_hour_event,
       |    d_rm_action, d_rm_l2, d_rm_playback_time,
       |    string_split(d_rm_content, '_||_') AS content,
       |    CAST(NULL AS VARCHAR) AS matched_livestream_id,
       |    string_split(d_rm_theme1, '_||_') AS theme1,
       |    CASE WHEN regexp_matches(d_rm_theme2, '_/|/|_')
       |         THEN string_split(d_rm_theme2, '_||_') END AS theme2,
       |    string_split(d_rm_theme3, '_||_') AS theme3,
       |    'regular streamid' AS stream_match_type, 1 AS dedup
       |  FROM me
       |  WHERE d_rm_type <> 'Animations'
       |    AND (d_rm_theme1 IS NULL OR d_rm_theme1 <> 'livetvzender')
       |    AND CAST(CAST(d_date_hour_event AS DATE) AS VARCHAR) IN ($partsSql)),
       |raw_events AS (SELECT * FROM live UNION ALL BY NAME SELECT * FROM regular),
       |per_stream AS (
       |  SELECT d_rm_playid, unique_user_id, CAST(d_date_hour_event AS DATE) AS evt_date,
       |    NULLIF(content[2], '') AS evt_base_mid,
       |    stream_match_type,
       |    COALESCE(matched_livestream_id, NULLIF(content[2], '')) AS evt_mid,
       |    NULLIF(content[1], '') AS evt_media_name,
       |    NULLIF(NULLIF(theme1[1], ''), 'null') AS evt_stream_type,
       |    NULLIF(theme2[1], 'null') AS evt_programme,
       |    NULLIF(theme2[2], 'null') AS evt_broadcaster,
       |    theme2[3] AS evt_programme_podcast,
       |    theme3[1] AS evt_player_platform,
       |    theme3[2] AS evt_player_version,
       |    d_rm_l2 AS evt_brand,
       |    SUM(d_rm_playback_time) AS evt_playback_time_total_in_sec,
       |    COUNT(DISTINCT CASE WHEN d_rm_action = 'Play'
       |      OR stream_match_type = 'livetvzender - streamID_matched'
       |      THEN d_rm_playid END) AS evt_play_count_total
       |  FROM raw_events WHERE dedup = 1
       |  GROUP BY 1,2,3,4,5,6,7,8,9,10,11,12,13,14),
       |per_date AS (
       |  SELECT evt_date, evt_mid, evt_base_mid, evt_media_name, stream_match_type,
       |    evt_stream_type, evt_programme, evt_broadcaster, evt_programme_podcast,
       |    evt_player_platform, evt_player_version, evt_brand,
       |    COUNT(DISTINCT unique_user_id) AS n_unique_userids,
       |    SUM(evt_playback_time_total_in_sec) AS evt_playback_time_total_in_sec,
       |    CAST(SUM(evt_play_count_total) AS BIGINT) AS evt_play_count_total,
       |    CAST(SUM(CASE WHEN evt_playback_time_total_in_sec >= 30
       |      THEN evt_play_count_total ELSE 0 END) AS BIGINT) AS evt_play_count_over_30s
       |  FROM per_stream GROUP BY 1,2,3,4,5,6,7,8,9,10,11,12),
       |md AS (
       |  SELECT id, d.type AS type, d.mid_ref AS mid_ref,
       |    ROW_NUMBER() OVER (PARTITION BY id, d.type
       |      ORDER BY id, d.type, d.mid_ref) AS idx
       |  FROM (SELECT id, unnest(descendant_of) AS d FROM poms)
       |  WHERE d.type IN ('SEASON', 'SERIES')),
       |episode AS (
       |  SELECT id, MAX(CASE WHEN e.type = 'SEASON' THEN e."index" END) AS mtd_episode_of_index
       |  FROM (SELECT id, unnest(episode_of) AS e FROM poms) GROUP BY id),
       |bc AS (
       |  SELECT id, string_agg(b."value", ',' ORDER BY b."value") AS mtd_broadcasters
       |  FROM (SELECT id, unnest(broadcasters) AS b FROM poms) GROUP BY id),
       |ch AS (
       |  SELECT id, channel, ROW_NUMBER() OVER (PARTITION BY id ORDER BY id, channel) AS idx
       |  FROM (SELECT DISTINCT id, s.channel AS channel
       |        FROM (SELECT id, unnest(schedule_events) AS s FROM poms)
       |        WHERE s.channel IN ('NED1', 'NED2', 'NED3'))),
       |metadata AS (
       |  SELECT p.id,
       |    p.duration // 1000 AS mtd_duration_in_sec,
       |    p.sort_date AS mtd_sort_date,
       |    p.type AS mtd_type,
       |    p.genres[1].terms[1] AS mtd_genre_main,
       |    p.genres[1].terms[2] AS mtd_genre_sub,
       |    p.titles[1]."value" AS mtd_title_main,
       |    p.titles[2]."value" AS mtd_title_sub,
       |    season.mid_ref AS mtd_season_mid,
       |    series.mid_ref AS mtd_series_mid,
       |    episode.mtd_episode_of_index,
       |    ch.channel AS mtd_channel,
       |    bc.mtd_broadcasters
       |  FROM poms p
       |  LEFT JOIN md season ON season.id = p.id AND season.type = 'SEASON' AND season.idx = 1
       |  LEFT JOIN md series ON series.id = p.id AND series.type = 'SERIES' AND series.idx = 1
       |  LEFT JOIN episode ON episode.id = p.id
       |  LEFT JOIN bc ON bc.id = p.id
       |  LEFT JOIN ch ON ch.id = p.id AND ch.idx = 1)
       |SELECT per_date.*, metadata.mtd_duration_in_sec, metadata.mtd_sort_date,
       |  metadata.mtd_type, metadata.mtd_genre_main, metadata.mtd_genre_sub,
       |  metadata.mtd_title_main, metadata.mtd_title_sub, metadata.mtd_season_mid,
       |  metadata.mtd_series_mid, metadata.mtd_episode_of_index, metadata.mtd_channel,
       |  metadata.mtd_broadcasters
       |FROM per_date LEFT JOIN metadata ON metadata.id = per_date.evt_mid
       |ORDER BY ALL NULLS FIRST""".stripMargin))

  // ------------------------------------------------------- vodstreaming

  /** `integral_reporting_vodstreaming.sql:1-158` — new-release derivation
    * (90-day rule), release-week KDH branch UNION stream-week consumption
    * branch, spine rollup. Reads the materialized upstream outputs
    * (`model_poms_flattened`, `model_atinternet_smarttag_streams_daily_v4`)
    * so this oracle isolates the vodstreaming transform.
    */
  private val vodStreaming = QueryDef(
    "dag_vodstreaming",
    (s, _) => ordered(Reporting.vodStreaming(s,
      srcDf(s, "advantedge_tv_viewer_density_per_show_daily_v1"),
      modelDf(s, "poms_flattened"),
      modelDf(s, "atinternet_smarttag_streams_daily_v4"),
      srcDf(s, "dim_poms_episodes"),
      srcDf(s, "360_graden_rapportage_vertaaltabel_upload_20_21"), today)),
    Some(s"""WITH adv AS (SELECT * FROM ${srcq("advantedge_tv_viewer_density_per_show_daily_v1")}),
       |pf AS (SELECT * FROM ${modelq("poms_flattened")}),
       |sd AS (SELECT * FROM ${modelq("atinternet_smarttag_streams_daily_v4")}),
       |dim AS (SELECT * FROM ${srcq("dim_poms_episodes")}),
       |vertaal AS (SELECT * FROM ${srcq("360_graden_rapportage_vertaaltabel_upload_20_21")}),
       |new_tv_eps AS (
       |  SELECT tveps.title, tveps.date AS first_broadcast_date, tveps.beginTimeCET AS start_eps,
       |    tveps.mediaId, pi.season_id AS channel,
       |    CAST(floor((epoch_us(tveps.endTimeCET) - epoch_us(tveps.beginTimeCET)) / 60000000.0) AS BIGINT) AS ep_duration_min,
       |    MIN(tveps.date) OVER (PARTITION BY pi.season_id) AS first_known_eps_date_season,
       |    MAX(tveps.date) OVER (PARTITION BY pi.season_id) AS last_known_eps_date_season
       |  FROM adv tveps
       |  LEFT JOIN (SELECT mid, season_id FROM pf) pi ON pi.mid = tveps.mediaId
       |  WHERE regexp_matches(tveps.channel, 'NPO') AND RepeatType = 'FIRST'
       |    AND audience = '6+' AND universe = 'Nat[SKO]'
       |    AND date_part('isoyear', tveps.date) >= 2019),
       |fsd AS (
       |  SELECT evt_mid, MIN(evt_date) AS first_stream_day
       |  FROM (SELECT evt_mid, evt_date,
       |          CAST(SUM(evt_play_count_over_30s) AS BIGINT) AS s30
       |        FROM sd WHERE mtd_type = 'BROADCAST' GROUP BY evt_mid, evt_date)
       |  WHERE s30 >= 100 GROUP BY evt_mid),
       |new_releases AS (
       |  SELECT DISTINCT poms.episode_id AS mediaid, poms.series_ref, poms.series_title,
       |    poms.episode_type, poms.season_ref, poms."index" AS eps_nr,
       |    poms.season_index AS season_nr,
       |    COALESCE(nte.first_broadcast_date,
       |      CASE WHEN (CAST(poms.start_linear_first_broadcast AS DATE) - fsd.first_stream_day) >= 90
       |           THEN fsd.first_stream_day
       |           ELSE CAST(poms.start_linear_first_broadcast AS DATE) END) AS first_broadcast_date,
       |    CASE WHEN nte.first_broadcast_date IS NULL THEN 0 ELSE 1 END AS has_had_linear_release,
       |    CASE WHEN COALESCE(nte.first_broadcast_date, CAST(poms.start_linear_first_broadcast AS DATE)) IS NULL
       |         THEN 0 ELSE 1 END AS has_scheduled_lineair_release,
       |    MIN(COALESCE(nte.first_broadcast_date,
       |      CASE WHEN (CAST(poms.start_linear_first_broadcast AS DATE) - fsd.first_stream_day) >= 90
       |           THEN fsd.first_stream_day
       |           ELSE CAST(poms.start_linear_first_broadcast AS DATE) END))
       |      OVER (PARTITION BY poms.season_ref) AS first_broadcast_season,
       |    MAX(COALESCE(nte.first_broadcast_date,
       |      CASE WHEN (CAST(poms.start_linear_first_broadcast AS DATE) - fsd.first_stream_day) >= 90
       |           THEN fsd.first_stream_day
       |           ELSE CAST(poms.start_linear_first_broadcast AS DATE) END))
       |      OVER (PARTITION BY poms.season_ref) AS last_known_broadcast_season
       |  FROM dim poms
       |  LEFT JOIN (SELECT mediaId, first_broadcast_date FROM new_tv_eps) nte
       |    ON poms.episode_id = nte.mediaId
       |  LEFT JOIN fsd ON fsd.evt_mid = poms.episode_id
       |  WHERE poms.episode_type = 'BROADCAST'),
       |sia AS (
       |  SELECT se.evt_mid, poms.series_ref, poms.series_title, se.evt_programme,
       |    date_part('week', nr.first_broadcast_date) AS evt_weeknr,
       |    date_part('isoyear', nr.first_broadcast_date) AS evt_year,
       |    AVG(se.mtd_duration_in_sec) AS streaming_duration_sec,
       |    CAST(NULL AS BIGINT) AS streaming_playcount_over_30s,
       |    CAST(NULL AS BIGINT) AS streaming_playcount_over_30s_broadcastsonly,
       |    CAST(NULL AS DOUBLE) AS streaming_time_spent_sec,
       |    SUM(CASE WHEN se.mtd_type = 'BROADCAST' AND (se.evt_date - nr.last_known_broadcast_season) <= 28
       |        THEN se.evt_playback_time_total_in_sec ELSE 0 END)
       |      / NULLIF(MAX(CASE WHEN se.mtd_type = 'BROADCAST' AND (se.evt_date - nr.last_known_broadcast_season) <= 28
       |        THEN se.mtd_duration_in_sec ELSE 0 END), 0) AS streaming_kdh_for_new_released_episode,
       |    MAX(CASE WHEN se.mtd_type = 'BROADCAST' AND (se.evt_date - nr.last_known_broadcast_season) <= 28
       |        THEN se.evt_mid END) AS mid_counts_for_new_release,
       |    CAST(NULL AS DOUBLE) AS streaming_kdh_per_episode,
       |    MAX(CASE WHEN nr.has_had_linear_release = 1 THEN 1 ELSE 0 END) AS has_had_linear_release,
       |    MAX(CASE WHEN nr.has_had_linear_release = 0 AND nr.has_scheduled_lineair_release = 1
       |        THEN 1 ELSE 0 END) AS has_scheduled_lineair_release,
       |    MAX(CASE WHEN nr.has_had_linear_release = 0 AND nr.has_scheduled_lineair_release = 0
       |        THEN 1 ELSE 0 END) AS vod_only_release
       |  FROM sd se
       |  LEFT JOIN new_releases nr ON nr.mediaid = se.evt_mid
       |  LEFT JOIN (SELECT episode_id, series_ref, series_title FROM dim) poms
       |    ON poms.episode_id = se.evt_mid
       |  GROUP BY 1,2,3,4,5,6),
       |sib AS (
       |  SELECT se.evt_mid, poms.series_ref, poms.series_title, se.evt_programme,
       |    date_part('week', se.evt_date) AS evt_weeknr,
       |    date_part('isoyear', se.evt_date) AS evt_year,
       |    AVG(se.mtd_duration_in_sec) AS streaming_duration_sec,
       |    CAST(SUM(se.evt_play_count_over_30s) AS BIGINT) AS streaming_playcount_over_30s,
       |    CAST(SUM(CASE WHEN se.mtd_type = 'BROADCAST' THEN se.evt_play_count_over_30s ELSE 0 END) AS BIGINT)
       |      AS streaming_playcount_over_30s_broadcastsonly,
       |    SUM(se.evt_playback_time_total_in_sec) AS streaming_time_spent_sec,
       |    CAST(NULL AS DOUBLE) AS streaming_kdh_for_new_released_episode,
       |    CAST(NULL AS VARCHAR) AS mid_counts_for_new_release,
       |    SUM(se.evt_playback_time_total_in_sec) / NULLIF(AVG(se.mtd_duration_in_sec), 0)
       |      AS streaming_kdh_per_episode,
       |    CAST(NULL AS INTEGER) AS has_had_linear_release,
       |    CAST(NULL AS INTEGER) AS has_scheduled_lineair_release,
       |    CAST(NULL AS INTEGER) AS vod_only_release
       |  FROM sd se
       |  LEFT JOIN (SELECT episode_id, series_ref, series_title FROM dim) poms
       |    ON poms.episode_id = se.evt_mid
       |  GROUP BY 1,2,3,4,5,6),
       |si AS (SELECT * FROM sia UNION ALL BY NAME SELECT * FROM sib)
       |SELECT
       |  COALESCE(vt.Stream_Titel, str.series_title) AS Stream_join_title,
       |  str.series_title AS POMS_series_title,
       |  str.series_ref AS POMS_series_id,
       |  CASE WHEN vt.Stream_Titel IS NULL THEN 0 ELSE 1 END AS has_intekening,
       |  weekdate,
       |  COUNT(DISTINCT str.evt_mid) AS streaming_number_of_episodes,
       |  SUM(str.streaming_duration_sec) AS streaming_duration_sec,
       |  CAST(SUM(str.streaming_playcount_over_30s) AS BIGINT) AS streaming_playcount_over_30s,
       |  CAST(SUM(str.streaming_playcount_over_30s_broadcastsonly) AS BIGINT)
       |    AS streaming_playcount_over_30s_broadcastsonly,
       |  SUM(str.streaming_time_spent_sec) AS streaming_time_spent_sec,
       |  SUM(str.streaming_kdh_per_episode) AS streaming_sum_kdh_per_week,
       |  SUM(str.streaming_kdh_for_new_released_episode) AS streaming_kdh_for_new_released_episode,
       |  COUNT(DISTINCT str.mid_counts_for_new_release) AS streaming_number_of_new_released_eps,
       |  MAX(str.has_had_linear_release) AS week_with_new_lineair_release,
       |  MAX(CASE WHEN str.has_had_linear_release = 1 OR str.has_scheduled_lineair_release = 1
       |      OR str.vod_only_release = 1 THEN 1 ELSE 0 END) AS week_with_new_release,
       |  date_part('week', weekdate) AS weeknr,
       |  date_part('isoyear', weekdate) AS year
       |FROM ($spineSql) spine
       |LEFT JOIN si str ON str.evt_year = date_part('isoyear', weekdate)
       |  AND str.evt_weeknr = date_part('week', weekdate)
       |LEFT JOIN (SELECT Stream_Titel, Serie_mid FROM vertaal) vt ON vt.Serie_mid = str.series_ref
       |GROUP BY 1,2,3,4,5
       |ORDER BY ALL NULLS FIRST""".stripMargin))

  // ---------------------------------------------------------- dashboard

  /** `integral_reporting_dashboard_channel_weekly.sql:1-283` — the
    * 7-channel conforming stack + title-level window flags. Reads all 6
    * upstream reporting model outputs, isolating the dashboard transform.
    * Rounding uses the engine-portable `floor(x*10^n+0.5)/10^n`
    * (`Dialect.roundTo`) in both engines.
    */
  private val dashboard = QueryDef(
    "dag_dashboard",
    (s, _) => ordered(Dashboard.build(s,
      srcDf(s, "360_graden_rapportage_vertaaltabel_upload_20_21"),
      modelDf(s, "integral_reporting_vodstreaming"),
      modelDf(s, "integral_reporting_tvbroadcasts"),
      modelDf(s, "integral_reporting_facebook"),
      modelDf(s, "integral_reporting_instagram"),
      modelDf(s, "integral_reporting_sites_and_apps"),
      modelDf(s, "integral_reporting_youtube"), today)),
    Some(s"""WITH vertaal AS (SELECT * FROM ${srcq("360_graden_rapportage_vertaaltabel_upload_20_21")}),
       |vod AS (SELECT * FROM ${modelq("integral_reporting_vodstreaming")}),
       |tvb AS (SELECT * FROM ${modelq("integral_reporting_tvbroadcasts")}),
       |fb AS (SELECT * FROM ${modelq("integral_reporting_facebook")}),
       |ig AS (SELECT * FROM ${modelq("integral_reporting_instagram")}),
       |online AS (SELECT * FROM ${modelq("integral_reporting_sites_and_apps")}),
       |yt AS (SELECT * FROM ${modelq("integral_reporting_youtube")}),
       |basis AS (
       |  SELECT v.*, weekdate, date_part('week', weekdate) AS weeknr,
       |    date_part('isoyear', weekdate) AS year
       |  FROM vertaal v CROSS JOIN ($spineSql) spine),
       |scc AS (
       |  SELECT COALESCE(ss.POMS_series_id, t.poms_series_id) AS poms_series_id,
       |         COALESCE(ss.year, t.year) AS year
       |  FROM (SELECT POMS_series_id, year, weeknr,
       |          streaming_playcount_over_30s_broadcastsonly FROM vod) ss
       |  FULL OUTER JOIN (SELECT poms_series_id, year, weeknr,
       |          tv_number_of_broadcasts FROM tvb) t
       |    ON t.poms_series_id = ss.POMS_series_id AND t.year = ss.year
       |       AND t.weeknr = ss.weeknr
       |  GROUP BY 1,2
       |  HAVING SUM(ss.streaming_playcount_over_30s_broadcastsonly) >= 1000
       |      OR SUM(t.tv_number_of_broadcasts) >= 1),
       |u AS (
       |  SELECT b.Naam, b.Net, b.Omroep, b.CCC, b.weekdate, b.weeknr, b.year,
       |    CASE WHEN b.Naam IS NOT NULL THEN 1 ELSE 0 END AS has_intekening,
       |    CAST(NULL AS INTEGER) AS is_tv_week,
       |    CAST(NULL AS BIGINT) AS new_releases,
       |    'facebook' AS reporting_channel,
       |    f.fb_number_of_posts AS n_items_per_week,
       |    'posts' AS media_item_type,
       |    f.fb_reach_per_week AS weekly_reach_per_week,
       |    CAST(NULL AS BIGINT) AS daily_reach_per_week,
       |    CAST(NULL AS BIGINT) AS visits_per_week,
       |    f.fb_engagement_per_week AS engagement_per_week,
       |    CAST(NULL AS BIGINT) AS views_per_week,
       |    CAST(NULL AS DOUBLE) AS hours_watched,
       |    CAST(NULL AS DOUBLE) AS video_kdh_per_week,
       |    CAST(NULL AS DOUBLE) AS video_kdh_per_release
       |  FROM basis b
       |  LEFT JOIN fb f ON b.QL_FB_ID = f.QL_FB_ID AND b.weekdate = f.weekdate
       |  UNION ALL BY NAME
       |  SELECT b.Naam, b.Net, b.Omroep, b.CCC, b.weekdate, b.weeknr, b.year,
       |    CASE WHEN b.Naam IS NOT NULL THEN 1 ELSE 0 END AS has_intekening,
       |    CAST(NULL AS INTEGER) AS is_tv_week,
       |    CAST(NULL AS BIGINT) AS new_releases,
       |    'instagram' AS reporting_channel,
       |    i.ig_number_of_posts AS n_items_per_week,
       |    'posts' AS media_item_type,
       |    i.ig_reach_per_week AS weekly_reach_per_week,
       |    CAST(NULL AS BIGINT) AS daily_reach_per_week,
       |    CAST(NULL AS BIGINT) AS visits_per_week,
       |    i.ig_engagement_per_week AS engagement_per_week,
       |    CAST(NULL AS BIGINT) AS views_per_week,
       |    CAST(NULL AS DOUBLE) AS hours_watched,
       |    CAST(NULL AS DOUBLE) AS video_kdh_per_week,
       |    CAST(NULL AS DOUBLE) AS video_kdh_per_release
       |  FROM basis b
       |  LEFT JOIN ig i ON b.QL_IG_ID = i.QL_IG_ID AND b.weekdate = i.weekdate
       |  UNION ALL BY NAME
       |  SELECT b.Naam, b.Net, b.Omroep, b.CCC, b.weekdate, b.weeknr, b.year,
       |    CASE WHEN b.Naam IS NOT NULL THEN 1 ELSE 0 END AS has_intekening,
       |    CAST(NULL AS INTEGER) AS is_tv_week,
       |    CAST(NULL AS BIGINT) AS new_releases,
       |    'sites' AS reporting_channel,
       |    CAST(NULL AS BIGINT) AS n_items_per_week,
       |    CAST(NULL AS VARCHAR) AS media_item_type,
       |    o.site_weekly_visitors AS weekly_reach_per_week,
       |    o.site_daily_visitors AS daily_reach_per_week,
       |    o.site_visits AS visits_per_week,
       |    CAST(NULL AS BIGINT) AS engagement_per_week,
       |    CAST(NULL AS BIGINT) AS views_per_week,
       |    CAST(NULL AS DOUBLE) AS hours_watched,
       |    CAST(NULL AS DOUBLE) AS video_kdh_per_week,
       |    CAST(NULL AS DOUBLE) AS video_kdh_per_release
       |  FROM basis b
       |  LEFT JOIN online o ON b.ATI_Titel = o.ATI_Titel AND b.weekdate = o.weekdate
       |  UNION ALL BY NAME
       |  SELECT b.Naam, b.Net, b.Omroep, b.CCC, b.weekdate, b.weeknr, b.year,
       |    CASE WHEN b.Naam IS NOT NULL THEN 1 ELSE 0 END AS has_intekening,
       |    CAST(NULL AS INTEGER) AS is_tv_week,
       |    CAST(NULL AS BIGINT) AS new_releases,
       |    'apps' AS reporting_channel,
       |    CAST(NULL AS BIGINT) AS n_items_per_week,
       |    CAST(NULL AS VARCHAR) AS media_item_type,
       |    o.app_weekly_visitors AS weekly_reach_per_week,
       |    o.app_daily_visitors AS daily_reach_per_week,
       |    o.app_visits AS visits_per_week,
       |    CAST(NULL AS BIGINT) AS engagement_per_week,
       |    CAST(NULL AS BIGINT) AS views_per_week,
       |    CAST(NULL AS DOUBLE) AS hours_watched,
       |    CAST(NULL AS DOUBLE) AS video_kdh_per_week,
       |    CAST(NULL AS DOUBLE) AS video_kdh_per_release
       |  FROM basis b
       |  LEFT JOIN online o ON b.ATI_Titel = o.ATI_Titel AND b.weekdate = o.weekdate
       |  UNION ALL BY NAME
       |  SELECT b.Naam, b.Net, b.Omroep, b.CCC, b.weekdate, b.weeknr, b.year,
       |    CASE WHEN b.Naam IS NOT NULL THEN 1 ELSE 0 END AS has_intekening,
       |    CAST(NULL AS INTEGER) AS is_tv_week,
       |    CAST(NULL AS BIGINT) AS new_releases,
       |    'youtube' AS reporting_channel,
       |    y.yt_number_of_videos AS n_items_per_week,
       |    'videos' AS media_item_type,
       |    CAST(NULL AS BIGINT) AS weekly_reach_per_week,
       |    CAST(NULL AS BIGINT) AS daily_reach_per_week,
       |    CAST(NULL AS BIGINT) AS visits_per_week,
       |    y.yt_engagement_per_week AS engagement_per_week,
       |    y.yt_views_per_week AS views_per_week,
       |    floor((y.yt_time_spent_per_week_min / 60) * 100 + 0.5) / 100 AS hours_watched,
       |    floor(y.yt_kdh_per_week + 0.5) AS video_kdh_per_week,
       |    CAST(NULL AS DOUBLE) AS video_kdh_per_release
       |  FROM basis b
       |  LEFT JOIN yt y ON b.QL_YT_ID = y.QL_YT_ID AND b.weekdate = y.weekdate
       |  UNION ALL BY NAME
       |  SELECT COALESCE(b.Naam, t.poms_series_title) AS Naam, b.Net, b.Omroep, b.CCC,
       |    COALESCE(b.weekdate, t.weekdate) AS weekdate,
       |    COALESCE(b.weeknr, t.weeknr) AS weeknr,
       |    COALESCE(b.year, t.year) AS year,
       |    CASE WHEN b.Naam IS NOT NULL THEN 1 ELSE 0 END AS has_intekening,
       |    t.tv_broadcast_week AS is_tv_week,
       |    t.tv_number_of_broadcasts AS new_releases,
       |    'lineair' AS reporting_channel,
       |    t.tv_number_of_broadcasts AS n_items_per_week,
       |    'videos' AS media_item_type,
       |    CAST(NULL AS BIGINT) AS weekly_reach_per_week,
       |    CAST(NULL AS BIGINT) AS daily_reach_per_week,
       |    CAST(NULL AS BIGINT) AS visits_per_week,
       |    CAST(NULL AS BIGINT) AS engagement_per_week,
       |    CAST(NULL AS BIGINT) AS views_per_week,
       |    floor((t.tv_time_spent_per_week_min / 60) * 100 + 0.5) / 100 AS hours_watched,
       |    floor(t.tv_sum_kdh_per_week + 0.5) AS video_kdh_per_week,
       |    floor(t.tv_sum_kdh_per_week / NULLIF(t.tv_number_of_broadcasts, 0) + 0.5) AS video_kdh_per_release
       |  FROM tvb t
       |  LEFT JOIN basis b ON b.Serie_mid = t.poms_series_id AND b.weekdate = t.weekdate
       |  UNION ALL BY NAME
       |  SELECT COALESCE(b.Naam, s.POMS_series_title) AS Naam, b.Net, b.Omroep, b.CCC,
       |    COALESCE(b.weekdate, s.weekdate) AS weekdate,
       |    COALESCE(b.weeknr, s.weeknr) AS weeknr,
       |    COALESCE(b.year, s.year) AS year,
       |    MAX(CASE WHEN b.Naam IS NOT NULL THEN 1 ELSE 0 END) AS has_intekening,
       |    CAST(NULL AS INTEGER) AS is_tv_week,
       |    CAST(NULL AS BIGINT) AS new_releases,
       |    'VOD' AS reporting_channel,
       |    CAST(SUM(s.streaming_number_of_episodes) AS BIGINT) AS n_items_per_week,
       |    'videos' AS media_item_type,
       |    CAST(NULL AS BIGINT) AS weekly_reach_per_week,
       |    CAST(NULL AS BIGINT) AS daily_reach_per_week,
       |    CAST(NULL AS BIGINT) AS visits_per_week,
       |    CAST(NULL AS BIGINT) AS engagement_per_week,
       |    CAST(SUM(s.streaming_playcount_over_30s) AS BIGINT) AS views_per_week,
       |    floor(SUM(s.streaming_time_spent_sec / 60 / 60) * 100 + 0.5) / 100 AS hours_watched,
       |    floor(SUM(s.streaming_sum_kdh_per_week) + 0.5) AS video_kdh_per_week,
       |    floor(SUM(s.streaming_kdh_for_new_released_episode)
       |      / NULLIF(SUM(s.streaming_number_of_new_released_eps), 0) + 0.5) AS video_kdh_per_release
       |  FROM vod s
       |  INNER JOIN scc ON scc.poms_series_id = s.POMS_series_id AND scc.year = s.year
       |  LEFT JOIN basis b ON b.Serie_mid = s.POMS_series_id AND b.weekdate = s.weekdate
       |  GROUP BY 1,2,3,4,5,6,7)
       |SELECT Naam, Net, Omroep, CCC, weekdate, weeknr, year, reporting_channel,
       |  n_items_per_week, media_item_type, weekly_reach_per_week, daily_reach_per_week,
       |  visits_per_week, engagement_per_week, views_per_week, hours_watched,
       |  video_kdh_per_week, video_kdh_per_release,
       |  floor(engagement_per_week / NULLIF(CASE WHEN reporting_channel = 'youtube'
       |    THEN views_per_week ELSE weekly_reach_per_week END, 0) * 1000 + 0.5) / 1000 AS engagement_ratio,
       |  floor(daily_reach_per_week / NULLIF(weekly_reach_per_week, 0) * 100 + 0.5) / 100 AS dau_mau_ratio,
       |  MAX(is_tv_week) OVER (PARTITION BY weekdate, Naam) AS is_tv_week,
       |  CAST(SUM(CASE WHEN reporting_channel = 'lineair' THEN new_releases ELSE 0 END)
       |    OVER (PARTITION BY Naam) AS BIGINT) AS n_total_tv_broadcasts,
       |  MAX(has_intekening) OVER (PARTITION BY Naam) AS has_intekening,
       |  CASE WHEN AVG(CASE WHEN reporting_channel = 'lineair' THEN video_kdh_per_release ELSE 0 END)
       |         OVER (PARTITION BY Naam) < 100000 THEN 'avg lineaire KDH < 100.000'
       |       WHEN AVG(CASE WHEN reporting_channel = 'lineair' THEN video_kdh_per_release ELSE 0 END)
       |         OVER (PARTITION BY Naam) >= 4000000 THEN 'avg lineaire KDH > 4.000.000'
       |       WHEN AVG(CASE WHEN reporting_channel = 'lineair' AND video_kdh_per_release IS NOT NULL
       |         THEN 1 ELSE 0 END) OVER (PARTITION BY Naam) = 0 THEN 'no lineair KDH in this week'
       |       ELSE 'avg lineaire KDH >= 100.000 and < 4.0000.000' END AS lineair_kdh_bucket
       |FROM u
       |ORDER BY ALL NULLS FIRST""".stripMargin))

  // ------------------------------------------------- SQL-text frontend

  /** Build one reporting model through the SQL-TEXT path: the `.sql`
    * resource via [[graft.engine.SqlModel]] (templating → temp views →
    * `spark.sql`), inputs wired by the refs the template itself
    * declares.
    */
  private def sqlTextModel(s: SparkSession, name: String,
      inputs: Map[String, DataFrame]): DataFrame = {
    val m = SqlReporting.allModels(today).find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(s"no SQL-text model $name"))
    m.build(s, m.refs.map(r => r -> inputs(r)).toMap)
  }

  /** `dag_youtube`'s oracle re-run against the SQL-TEXT frontend — the
    * simplest reporting model proving the text path (ref extraction,
    * view registration, var injection) end-to-end against DuckDB, not
    * merely spec-equivalent to the compiled builder.
    */
  private val sqlYoutube = QueryDef(
    "dag_sql_youtube",
    (s, _) => ordered(sqlTextModel(s, "integral_reporting_youtube", Map(
      "360_graden_rapportage_vertaaltabel_upload_20_21" ->
        srcDf(s, "360_graden_rapportage_vertaaltabel_upload_20_21"),
      "quintly_youtube_allchannels_weekly" ->
        NpoDag.latestYoutube(s, srcDf(s, "src_quintly_youtube_v1"))))),
    youtube.oracle)

  /** `dag_vodstreaming`'s oracle against the SQL-TEXT frontend — the
    * most complex reporting model (window functions, 90-day release
    * rule, typed-NULL union branches) through the same text path.
    */
  private val sqlVodStreaming = QueryDef(
    "dag_sql_vodstreaming",
    (s, _) => ordered(sqlTextModel(s, "integral_reporting_vodstreaming", Map(
      "advantedge_tv_viewer_density_per_show_daily_v1" ->
        srcDf(s, "advantedge_tv_viewer_density_per_show_daily_v1"),
      "poms_flattened" -> modelDf(s, "poms_flattened"),
      "atinternet_smarttag_streams_daily_v4" ->
        modelDf(s, "atinternet_smarttag_streams_daily_v4"),
      "dim_poms_episodes" -> srcDf(s, "dim_poms_episodes"),
      "360_graden_rapportage_vertaaltabel_upload_20_21" ->
        srcDf(s, "360_graden_rapportage_vertaaltabel_upload_20_21")))),
    vodStreaming.oracle)

  /** `dag_poms_flattened`'s oracle against the SQL-TEXT frontend — the
    * five stacked LATERAL VIEW OUTER explodes + positional broadcaster
    * explode through the text path (VERDICT r7 #3).
    */
  private val sqlPomsFlattened = QueryDef(
    "dag_sql_poms_flattened",
    (s, _) => ordered(sqlTextModel(s, "poms_flattened", Map(
      "audiovisual_metadata_poms_metadata_v1" ->
        srcDf(s, "audiovisual_metadata_poms_metadata_v1")))),
    pomsFlattened.oracle)

  /** `dag_streams_daily`'s oracle against the SQL-TEXT frontend — the
    * incremental model whose reference authoring needs Jinja
    * `{% set %}` list + `| join` partition templating (VERDICT r7 #3):
    * proves the templating renders the SAME rolling window the compiled
    * builder computes, end-to-end against DuckDB.
    */
  private val sqlStreamsDaily = QueryDef(
    "dag_sql_streams_daily",
    (s, _) => ordered(sqlTextModel(s, "atinternet_smarttag_streams_daily_v4", Map(
      "advantedge_tv_viewer_density_per_show_daily_v1" ->
        srcDf(s, "advantedge_tv_viewer_density_per_show_daily_v1"),
      "media_events" -> srcDf(s, "media_events"),
      "live_stream_name_mapping_v1" -> srcDf(s, "live_stream_name_mapping_v1"),
      "audiovisual_metadata_poms_metadata_v1" ->
        srcDf(s, "audiovisual_metadata_poms_metadata_v1")))),
    streamsDaily.oracle)

  // ---------------------------------------------------------------- seeds

  /** Deterministic seed CSV fixture (the dbt `data/` dir analogue);
    * written once, content-stable so the seed model's file-bytes
    * fingerprint is reproducible across runs.
    */
  private[models] def seedCsvPath: String = {
    val p = java.nio.file.Paths.get("/root/repo/fixtures/seeds/channel_map.csv")
    if (!java.nio.file.Files.exists(p)) {
      java.nio.file.Files.createDirectories(p.getParent)
      val body = "channel,region,priority\n" +
        "npo1,north,1\nnpo2,north,2\nnpo3,south,3\nzapp,south,4\nzappelin,south,5\n"
      java.nio.file.Files.write(p, body.getBytes("UTF-8"))
    }
    p.toString
  }

  /** dbt SEED node kind end-to-end (VERDICT r8 ask #5): a CSV seed
    * materializes as a warehouse table and a downstream SQL-text view
    * `ref()`s it; DuckDB judges the rollup against `read_csv_auto` over
    * the SAME file.
    */
  private val seedRollup = QueryDef(
    "dag_seed_rollup",
    (s, _) => {
      val csv = seedCsvPath
      val seed = graft.engine.Seeds.fromCsv(csv)
      val view = graft.engine.SqlModel.fromSqlText("seed_rollup",
        """SELECT region, count(*) AS n_channels,
          |  CAST(min(priority) AS BIGINT) AS top_priority
          |FROM {{ ref('channel_map') }} GROUP BY region""".stripMargin)
      val wh = s"${sys.props("java.io.tmpdir")}/graft-seedwh-${s.sparkContext.applicationId}"
      val built = graft.engine.DagRunner.run(s, Seq(seed, view),
        n => sys.error(s"unexpected source $n"), wh)
      ordered(built("seed_rollup"))
    },
    Some(s"""SELECT region, CAST(count(*) AS BIGINT) AS n_channels,
            |  CAST(min(priority) AS BIGINT) AS top_priority
            |FROM read_csv_auto('/root/repo/fixtures/seeds/channel_map.csv')
            |GROUP BY region ORDER BY ALL NULLS FIRST""".stripMargin))

  /** dbt `{% macro %}` authoring end-to-end: a SQL-text model whose
    * aggregate expressions come from project-level macros (one calling
    * the other) runs through DagRunner over the TPC-H tables and is
    * judged against plain-SQL DuckDB — the expansion must be
    * semantically invisible.
    */
  private val sqlMacroPricing = QueryDef(
    "dag_sql_macro_pricing",
    (s, dir) => {
      val projectMacros =
        """{% macro discounted(p, d) %}{{ p }} * (1 - {{ d }}){% endmacro %}
          |{% macro revenue(p, d) %}sum({{ discounted(p, d) }}){% endmacro %}""".stripMargin
      val model = graft.engine.SqlModel.fromSqlText("macro_pricing",
        """SELECT l_returnflag, l_linestatus,
          |  round({{ revenue('l_extendedprice', 'l_discount') }}, 2) AS revenue,
          |  count(*) AS n
          |FROM {{ ref('lineitem') }}
          |GROUP BY l_returnflag, l_linestatus""".stripMargin,
        macros = projectMacros)
      val built = graft.engine.DagRunner.run(s, Seq(model),
        n => graft.sources.Tables.load(s, dir, n))
      ordered(built("macro_pricing"))
    },
    Some("""SELECT l_returnflag, l_linestatus,
           |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           |  CAST(count(*) AS BIGINT) AS n
           |FROM lineitem GROUP BY 1, 2 ORDER BY ALL NULLS FIRST""".stripMargin))

  /** The PROJECT-DIRECTORY frontend end-to-end: the entire 20-model DAG
    * is loaded from the checked-in `fixtures/npo_project` tree (a layout
    * mirror of the reference — `dbt_project.yml`, `sources.yml`,
    * `schema.yml`, 20 `.sql` files) by [[graft.engine.ProjectLoader]],
    * run through DagRunner off the fixture parquet, and the FINAL node
    * (the dashboard, which transitively exercises every other model) is
    * judged against the same independent DuckDB oracle as
    * `dag_dashboard`. Physical BigQuery table refs resolve to the
    * source parquet through `NpoFixtures.physicalAliases` — the
    * warehouse-table interface a dropped-in dbt project expects.
    */
  private val projectDashboard = QueryDef(
    "dag_project_dashboard",
    (s, _) => {
      val proj = SqlReporting.project(today, s)
      // Threaded materialization (optimization round 14, guide §2.6 —
      // overlap independent jobs): the project's six reporting models
      // are one wide independent DAG level, and sequential DagRunner.run
      // serializes their builds (each a small job whose tail leaves the
      // other 31 cores idle, PLUS the per-model driver-side Catalyst
      // analysis, which dominates this row at bench scale and is
      // single-threaded per model). runParallel is output-identical by
      // construction (each model depends only on its refs — pinned on
      // this exact ProjectLoader DAG in ProjectLoaderSpec and on the
      // compiled DAG in NpoDagSpec); `spark.graft.dagThreads` = 1
      // restores the sequential runner.
      val threads = s.conf.get("spark.graft.dagThreads", "4").toInt
      val resolve = (n: String) =>
        srcDf(s, graft.models.testkit.NpoFixtures.physicalAliases.getOrElse(n, n))
      val wh = s"${sys.props("java.io.tmpdir")}/graft-projwh-${s.sparkContext.applicationId}"
      val built =
        if (threads > 1) graft.engine.DagRunner.runParallel(s, proj.models, resolve, wh, threads)
        else graft.engine.DagRunner.run(s, proj.models, resolve, wh)
      ordered(built("integral_reporting_dashboard_channel_weekly"))
    },
    dashboard.oracle)

  /** General Jinja `{% if %}`/`{% elif %}`/`{% else %}` conditionals
    * end-to-end: a SQL-text model switches its grouping CTE on a var
    * (`granularity`) and gates an extra discount column on
    * `target.name` — the feature-flag authoring idiom. The var binding
    * selects the returnflag+linestatus branch and the prod target
    * enables the column; DuckDB judges the rendered result. Branch
    * choice, fingerprint stability, nesting, and error paths are pinned
    * in `SqlModelSpec`.
    */
  private val sqlIfPricing = QueryDef(
    "dag_sql_if_pricing",
    (s, dir) => {
      val model = graft.engine.SqlModel.fromSqlText("if_pricing",
        """{% if var('granularity') == 'flag' %}
          |SELECT l_returnflag AS grp,
          |{% elif var('granularity') == 'flag_status' %}
          |SELECT concat(l_returnflag, '/', l_linestatus) AS grp,
          |{% else %}
          |SELECT 'all' AS grp,
          |{% endif %}
          |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
          |  count(*) AS n
          |{% if target.name == 'prod' %}
          |  , round(sum(l_extendedprice * (1 - l_discount)), 2) AS net_revenue
          |{% endif %}
          |FROM {{ ref('lineitem') }}
          |GROUP BY grp""".stripMargin,
        vars = Map("granularity" -> "flag_status"),
        target = "prod")
      val built = graft.engine.DagRunner.run(s, Seq(model),
        n => graft.sources.Tables.load(s, dir, n))
      ordered(built("if_pricing"))
    },
    Some("""SELECT l_returnflag || '/' || l_linestatus AS grp,
           |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
           |  CAST(count(*) AS BIGINT) AS n,
           |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS net_revenue
           |FROM lineitem GROUP BY 1 ORDER BY ALL NULLS FIRST""".stripMargin))

  /** dbt 1.9 microbatch end-to-end: a 5-day back-fill over the events
    * table (begin=2024-01-26, asOf=2024-01-30), one insert-overwrite
    * per day with the evt_date partition derived from the event time by
    * the RUNNER; DuckDB judges the final state against a plain windowed
    * SELECT. The warehouse is wiped per invocation so every run (and
    * every bench rerun) exercises the same deterministic back-fill;
    * lookback/late-row/resume semantics are pinned in `EngineSpec`.
    */
  private val microbatchDaily = QueryDef(
    "dag_microbatch_daily",
    (s, dir) => {
      val model = graft.engine.Model("mb_events", Seq("events"),
        (_, r) => r("events").select(col("ts"), col("event_type"), col("user_id")),
        materialization = graft.engine.IncrementalMicrobatch("ts", "evt_date",
          begin = "2024-01-26", asOf = "2024-01-30"))
      val wh = s"${sys.props("java.io.tmpdir")}/graft-mbwh-${s.sparkContext.applicationId}"
      val root = new org.apache.hadoop.fs.Path(s"$wh/main/main/mb_events")
      val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(root)) fs.delete(root, true)
      val built = graft.engine.DagRunner.run(s, Seq(model),
        n => graft.sources.Tables.load(s, dir, n), wh)
      ordered(built("mb_events"))
    },
    Some("""SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, user_id,
           |  CAST(CAST(ts AS DATE) AS VARCHAR) AS evt_date
           |FROM events
           |WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-26' AND DATE '2024-01-30'
           |ORDER BY ALL NULLS FIRST""".stripMargin))

  // -------------------------------------------------- packages.yml (r12)

  /** The checked-in `fixtures/pkg_project` — a dbt project whose models
    * call dbt_utils macros resolved through `packages.yml`
    * ([[graft.engine.Packages]], VERDICT r11 ask #5). Each dag_pkg_*
    * row loads the project through the file frontend, runs the DAG over
    * the driver's TPC-H parquet (source('tpch','orders') resolves via
    * Tables.load), and DuckDB re-derives the macro's semantics from
    * plain SQL — the expansion must be semantically invisible.
    */
  private def pkgProjectDir: java.nio.file.Path =
    Seq(java.nio.file.Paths.get("fixtures/pkg_project"),
      java.nio.file.Paths.get("/root/repo/fixtures/pkg_project"))
      .find(java.nio.file.Files.isDirectory(_))
      .getOrElse(throw new IllegalStateException(
        "fixtures/pkg_project not found (run from the repo root)"))

  private val pkgWhCache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def pkgModel(s: SparkSession, dir: String, name: String): DataFrame = {
    val proj = graft.engine.ProjectLoader.load(s, pkgProjectDir)
    // Build only the requested model's ancestor closure (dbt run
    // --select +name): the project also contains pivot models whose
    // get_column_values runs a real introspection query at build time —
    // paying that for every UNRELATED dag_pkg_* row was most of the
    // file-frontend fixed cost (measured via tools/PkgProfile: full run
    // 1.1-1.25 s warm vs ~0.1 s for a single view's closure; load
    // itself is 0.03 s warm).
    val sel = graft.engine.DagRunner.withLazyUpstreams(proj.models,
      graft.engine.DagRunner.select(proj.models, s"+$name"))
    // The pkg fixture is view-family except the python model (dbt python
    // models are table-only); a table in the selection needs a warehouse
    // to land in. ONE temp dir per (sf dir, model) per JVM, reused on
    // re-invocation (table writes are overwrite) and removed at JVM
    // exit — a per-call dir would accumulate parquet for every bench
    // iteration on a long-lived host.
    val wh =
      if (sel.forall(_.materialization == graft.engine.View)) ""
      else pkgWhCache.computeIfAbsent(s"$dir::$name", _ => {
        val d = java.nio.file.Files.createTempDirectory("graft_pkgwh")
        sys.addShutdownHook {
          def rm(p: java.io.File): Unit = {
            Option(p.listFiles()).foreach(_.foreach(rm))
            p.delete(): Unit
          }
          rm(d.toFile)
        }
        d.toString
      })
    val built = graft.engine.DagRunner.run(s, sel,
      n => graft.sources.Tables.load(s, dir, n.stripPrefix("tpch.")), wh)
    ordered(built(name))
  }

  /** dbt_utils.date_spine end-to-end (the generated J9 spine). The
    * model pre-aggregates orders to the day grain BEFORE the spine
    * join (SCALE.md spine rule) — the oracle mirrors that shape.
    */
  private val pkgDateSpine = QueryDef(
    "dag_pkg_date_spine",
    (s, dir) => pkgModel(s, dir, "spine_orders_daily"),
    Some("""WITH spine AS (
           |  SELECT CAST(unnest(generate_series(DATE '1995-01-01',
           |    DATE '1995-01-31', INTERVAL 1 DAY)) AS DATE) AS date_day),
           |daily AS (
           |  SELECT CAST(o_orderdate AS DATE) AS d,
           |    count(*) AS n_orders, sum(o_totalprice) AS rev
           |  FROM orders GROUP BY 1)
           |SELECT spine.date_day,
           |  CAST(coalesce(daily.n_orders, 0) AS BIGINT) AS n_orders,
           |  round(coalesce(daily.rev, 0.0), 2) AS revenue
           |FROM spine LEFT JOIN daily ON daily.d = spine.date_day
           |ORDER BY ALL NULLS FIRST""".stripMargin))

  /** dbt_utils.pivot end-to-end (the generated A11 pivot). */
  private val pkgPivot = QueryDef(
    "dag_pkg_pivot",
    (s, dir) => pkgModel(s, dir, "orders_status_pivot"),
    Some("""SELECT o_orderpriority,
           |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS "n_F",
           |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS "n_O",
           |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS "n_P"
           |FROM orders GROUP BY o_orderpriority ORDER BY ALL NULLS FIRST""".stripMargin))

  /** `{% for %}` over a list-valued var() end-to-end (the dbt-tutorial
    * payment-methods pivot): the loop stamps one conditional aggregate
    * per item of dbt_project.yml's `vars: pivot_statuses`; the oracle
    * re-derives the unrolled SQL, so the loop expansion must be
    * semantically invisible.
    */
  private val pkgForPivot = QueryDef(
    "dag_pkg_for_pivot",
    (s, dir) => pkgModel(s, dir, "orders_method_pivot"),
    Some("""SELECT o_orderpriority,
           |  round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END), 2) AS amt_F,
           |  round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END), 2) AS amt_O,
           |  round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0 END), 2) AS amt_P
           |FROM orders GROUP BY o_orderpriority ORDER BY ALL NULLS FIRST""".stripMargin))

  /** A dbt PYTHON model end-to-end ([[graft.engine.PyModel]]): the
    * fixture's `orders_py_summary.py` reads source('tpch','orders')
    * through `dbt.source`, registers a temp view, aggregates via
    * `session.sql`, and chains whitelisted DataFrame methods — the
    * oracle re-derives the same aggregate in plain SQL.
    */
  private val pkgPySummary = QueryDef(
    "dag_py_summary",
    (s, dir) => pkgModel(s, dir, "orders_py_summary"),
    Some("""SELECT o_orderstatus,
           |  CAST(count(*) AS BIGINT) AS n_orders,
           |  round(sum(o_totalprice), 2) AS total_price
           |FROM orders GROUP BY o_orderstatus
           |HAVING count(*) > 0
           |ORDER BY ALL NULLS FIRST""".stripMargin))

  /** dbt_utils.generate_surrogate_key end-to-end (null-sentinel md5). */
  private val pkgSurrogateKey = QueryDef(
    "dag_pkg_surrogate_key",
    (s, dir) => pkgModel(s, dir, "orders_keyed"),
    Some("""SELECT md5(concat_ws('-',
           |    coalesce(CAST(o_orderkey AS VARCHAR), '_dbt_utils_surrogate_key_null_'),
           |    coalesce(CAST(o_orderstatus AS VARCHAR), '_dbt_utils_surrogate_key_null_'))) AS order_sk,
           |  o_orderkey, o_orderstatus
           |FROM orders ORDER BY ALL NULLS FIRST""".stripMargin))

  /** dbt_utils.union_relations end-to-end: provenance column + DAG edges
    * from the refs inside the expansion.
    */
  private val pkgUnionRelations = QueryDef(
    "dag_pkg_union_relations",
    (s, dir) => pkgModel(s, dir, "all_orders_rollup"),
    Some("""WITH u AS (
           |  SELECT 'stg_orders_fulfilled' AS _dbt_source_relation,
           |    o_orderkey, o_orderstatus, o_totalprice
           |  FROM orders WHERE o_orderstatus = 'F'
           |  UNION ALL
           |  SELECT 'stg_orders_open', o_orderkey, o_orderstatus, o_totalprice
           |  FROM orders WHERE o_orderstatus = 'O')
           |SELECT _dbt_source_relation, o_orderstatus,
           |  CAST(count(*) AS BIGINT) AS n, round(sum(o_totalprice), 2) AS total
           |FROM u GROUP BY 1, 2 ORDER BY ALL NULLS FIRST""".stripMargin))

  /** dbt_utils cross-database macros end-to-end: dateadd / datediff /
    * split_part / safe_cast / hash rendered to the Spark dialect
    * (timestampadd / timestampdiff / split_part / try_cast / md5);
    * DuckDB re-derives each from its own builtins. `datediff` is pinned
    * at day granularity on DATE-precision values, where complete-unit
    * (Spark) and boundary-count (DuckDB/BigQuery) semantics coincide.
    */
  private val pkgDateMath = QueryDef(
    "dag_pkg_datemath",
    (s, dir) => pkgModel(s, dir, "orders_dateparts"),
    Some("""SELECT o_orderkey,
           |  CAST(o_orderdate + INTERVAL 7 DAY AS DATE) AS due_date,
           |  CAST(date_diff('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00') AS BIGINT) AS days_to_y2k,
           |  split_part(o_orderpriority, '-', 1) AS prio_code,
           |  try_cast(o_orderstatus AS INT) AS status_int,
           |  md5(CAST(o_orderkey AS VARCHAR)) AS key_hash
           |FROM orders ORDER BY ALL NULLS FIRST""".stripMargin))

  /** env_var() default-argument form end-to-end (VERDICT r11 ask #6):
    * GRAFT_PKG_REGION is unset in any sane run, so the declared default
    * renders — deterministically — and DuckDB pins it.
    */
  private val pkgEnvVar = QueryDef(
    "dag_pkg_env_var",
    (s, dir) => pkgModel(s, dir, "env_orders_flag"),
    Some("""SELECT 'eu' AS region, CAST(count(*) AS BIGINT) AS n
           |FROM orders ORDER BY ALL NULLS FIRST""".stripMargin))

  /** dbt_utils.star end-to-end: the model's select list is introspected
    * from the resolved source schema at BUILD time
    * ([[graft.engine.CatalogMacros]]) — `except` drops two columns by
    * name; the oracle hand-writes the surviving list.
    */
  private val pkgStar = QueryDef(
    "dag_pkg_star",
    (s, dir) => pkgModel(s, dir, "orders_slim"),
    Some("""SELECT o_orderkey, o_orderstatus, o_orderdate, o_orderpriority
           |FROM orders ORDER BY ALL NULLS FIRST""".stripMargin))

  /** dbt_utils.pivot over dbt_utils.get_column_values: the pivot axis
    * is QUERIED from the relation at build time (dbt's compile-time
    * run_query — one distinct-aggregate, collected, ordered by value).
    * The oracle stamps the five TPC-H priorities explicitly — the
    * introspected expansion must be semantically invisible.
    */
  private val pkgPivotDynamic = QueryDef(
    "dag_pkg_pivot_dynamic",
    (s, dir) => pkgModel(s, dir, "orders_prio_pivot"),
    Some("""SELECT o_orderstatus,
           |  CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS "n_1-URGENT",
           |  CAST(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS "n_2-HIGH",
           |  CAST(sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS "n_3-MEDIUM",
           |  CAST(sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS "n_4-NOT SPECIFIED",
           |  CAST(sum(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS "n_5-LOW"
           |FROM orders GROUP BY o_orderstatus ORDER BY ALL NULLS FIRST""".stripMargin))

  /** tests/ directory singular tests end-to-end: ProjectLoader ingests
    * the tests dir's .sql files as [[graft.engine.DataTests.Singular]]
    * checks — one
    * passing error-severity test and one DELIBERATELY-violating
    * warn-severity test (severity routes to warnChecks, so a build
    * would record, not fail). The summary frame is the oracle surface.
    */
  private val pkgSingularTests = QueryDef(
    "dag_pkg_singular_tests",
    (s, dir) => {
      val proj = graft.engine.ProjectLoader.load(s, pkgProjectDir)
      val resolve = (n: String) => graft.sources.Tables.load(s, dir, n.stripPrefix("tpch."))
      val singular = (proj.checks ++ proj.warnChecks)
        .collect { case x: graft.engine.DataTests.Singular => x }
      ordered(graft.engine.DataTests.run(resolve, singular))
    },
    Some("""SELECT * FROM (
           |  SELECT 'singular' AS test, 'tpch.orders' AS model,
           |    'assert_no_negative_totals' AS "column", CAST(0 AS BIGINT) AS n_violations
           |  UNION ALL
           |  SELECT 'singular', 'tpch.orders', 'warn_pending_orders',
           |    (SELECT count(*) FROM orders WHERE o_orderstatus = 'P'))
           |ORDER BY ALL NULLS FIRST""".stripMargin))

  /** sources.yml freshness config end-to-end: the YAML's warn_after /
    * error_after / loaded_at_field parse into a
    * [[graft.engine.DataTests.Freshness]] spec and the collect_freshness
    * aggregate runs at a pinned asOf — max(o_orderdate) is 2001-08-01
    * at every SF, so 2001-08-15 lands deterministically in the warn
    * window (14 d: > 7 d warn, < 30 d error).
    */
  private val pkgFreshness = QueryDef(
    "dag_pkg_freshness",
    (s, dir) => {
      val proj = graft.engine.ProjectLoader.load(s, pkgProjectDir)
      val resolve = (n: String) => graft.sources.Tables.load(s, dir, n.stripPrefix("tpch."))
      ordered(graft.engine.DataTests.freshness(resolve, proj.freshness,
        "2001-08-15 00:00:00"))
    },
    Some("""SELECT 'tpch.orders' AS source, mx AS max_loaded_at,
           |  CAST(age AS BIGINT) AS age_sec,
           |  CASE WHEN mx IS NULL THEN 'error'
           |       WHEN age > 2592000 THEN 'error'
           |       WHEN age > 604800 THEN 'warn'
           |       ELSE 'pass' END AS status
           |FROM (SELECT max(CAST(o_orderdate AS TIMESTAMP)) AS mx,
           |        epoch(TIMESTAMP '2001-08-15 00:00:00')
           |          - epoch(max(CAST(o_orderdate AS TIMESTAMP))) AS age
           |      FROM orders)
           |ORDER BY ALL NULLS FIRST""".stripMargin))

  /** dependencies.yml cross-project refs (dbt 1.6 mesh) end-to-end:
    * `fixtures/mesh_consumer` declares `fixtures/mesh_core` as an
    * upstream project; its dashboard model two-arg-refs mesh_core's
    * PUBLIC interface model and joins its own source. The load merges
    * both projects into one runnable DAG (access enforced at load);
    * DuckDB re-derives the whole mesh from plain SQL.
    */
  private val meshDashboard = QueryDef(
    "dag_mesh_dashboard",
    (s, dir) => {
      val consumerDir = Seq(java.nio.file.Paths.get("fixtures/mesh_consumer"),
        java.nio.file.Paths.get("/root/repo/fixtures/mesh_consumer"))
        .find(java.nio.file.Files.isDirectory(_))
        .getOrElse(throw new IllegalStateException(
          "fixtures/mesh_consumer not found (run from the repo root)"))
      val proj = graft.engine.ProjectLoader.load(s, consumerDir)
      val sel = graft.engine.DagRunner.withLazyUpstreams(proj.models,
        graft.engine.DagRunner.select(proj.models, "+mesh_dashboard"))
      val built = graft.engine.DagRunner.run(s, sel,
        n => graft.sources.Tables.load(s, dir, n.stripPrefix("tpch.")))
      ordered(built("mesh_dashboard"))
    },
    Some("""SELECT c.c_mktsegment,
           |  CASE WHEN o.o_totalprice >= 200000 THEN 'big' ELSE 'small' END AS size_class,
           |  CAST(count(*) AS BIGINT) AS n_orders,
           |  round(sum(o.o_totalprice), 2) AS total_price
           |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
           |GROUP BY 1, 2 ORDER BY ALL NULLS FIRST""".stripMargin))

  /** dbt 1.5 MODEL VERSIONS end-to-end through the file frontend
    * (`fixtures/ver_project`): the rev_daily family ships v1 and v2
    * side by side (v2 is a breaking revision — filter + added column).
    * `dag_ver_latest` pins the UNPINNED ref('rev_daily') resolving to
    * the latest version; `dag_ver_pinned` pins ref('rev_daily', v=1)
    * staying on the old contract. DuckDB re-derives each version's
    * semantics from plain SQL.
    */
  private def verModel(s: SparkSession, dir: String, name: String): DataFrame = {
    val projDir = Seq(java.nio.file.Paths.get("fixtures/ver_project"),
      java.nio.file.Paths.get("/root/repo/fixtures/ver_project"))
      .find(java.nio.file.Files.isDirectory(_))
      .getOrElse(throw new IllegalStateException(
        "fixtures/ver_project not found (run from the repo root)"))
    val proj = graft.engine.ProjectLoader.load(s, projDir)
    val resolved = graft.engine.DagRunner.resolveVersionRefs(proj.models)
    val sel = graft.engine.DagRunner.withLazyUpstreams(resolved,
      graft.engine.DagRunner.select(resolved, s"+$name"))
    val built = graft.engine.DagRunner.run(s, sel,
      n => graft.sources.Tables.load(s, dir, n.stripPrefix("tpch.")))
    ordered(built(name))
  }

  private val verLatest = QueryDef(
    "dag_ver_latest",
    (s, dir) => verModel(s, dir, "rev_latest_wide"),
    Some("""SELECT o_orderdate, round(sum(o_totalprice), 2) AS rev,
           |  CAST(count(*) AS BIGINT) AS n_orders
           |FROM orders WHERE o_orderstatus = 'F'
           |GROUP BY 1 ORDER BY ALL NULLS FIRST""".stripMargin))

  private val verPinned = QueryDef(
    "dag_ver_pinned",
    (s, dir) => verModel(s, dir, "rev_pinned_v1"),
    Some("""SELECT o_orderdate, round(sum(o_totalprice), 2) AS rev
           |FROM orders GROUP BY 1 ORDER BY ALL NULLS FIRST""".stripMargin))

  val all: Seq[QueryDef] = Seq(
    pomsFlattened, tvBroadcasts, youtube, facebook, instagram, sitesAndApps,
    streamsDaily, vodStreaming, dashboard, sqlYoutube, sqlVodStreaming,
    sqlPomsFlattened, sqlStreamsDaily, seedRollup, sqlMacroPricing,
    sqlIfPricing, projectDashboard, microbatchDaily,
    pkgDateSpine, pkgPivot, pkgForPivot, pkgPySummary, pkgSurrogateKey, pkgUnionRelations, pkgEnvVar,
    pkgDateMath, pkgStar, pkgPivotDynamic, pkgSingularTests, pkgFreshness,
    meshDashboard, verLatest, verPinned)
}
