{{ config(materialized='view', schema='integral_reporting') }}
-- Spark-SQL text port of /root/reference/models/datamarts/npo-data-hub/
-- reporting/integral_reporting/integral_reporting_dashboard_channel_weekly
-- .sql:1-283 for the SqlModel frontend: conform facebook / instagram /
-- sites / apps / youtube / lineair / VOD to one 21-column layout, union,
-- then window-derive the title-level flags. ISOWEEK/ISOYEAR, the weekly
-- spine and the portable fixed-point rounding follow the same dialect
-- mapping as the other reporting ports ({{ var('today') }} where the
-- reference calls CURRENT_DATE()).
WITH spine AS (
  SELECT explode(sequence(DATE '2018-12-31', {{ var('today') }}, interval 7 days)) AS weekdate
),

-- basis: every title x every week (reference lines 1-11).
basis AS (
  SELECT v.*, weekdate,
    weekofyear(weekdate) AS weeknr,
    date_part('YEAROFWEEK', weekdate) AS year
  FROM {{ ref('360_graden_rapportage_vertaaltabel_upload_20_21') }} v
  CROSS JOIN spine
),

-- intekening cleaning: series with >=1000 yearly views or >=1 broadcast
-- (lines 18-34).
intekening_cleaning AS (
  SELECT POMS_series_id AS scc_id, year AS scc_year FROM (
    SELECT
      coalesce(ss_id, tvb_id) AS POMS_series_id,
      coalesce(ss_year, tvb_year) AS year,
      SUM(ss_views) AS n_views_in_reportingyear,
      SUM(tvb_n) AS n_broadcasts_in_year
    FROM (SELECT POMS_series_id AS ss_id, year AS ss_year, weeknr AS ss_weeknr,
                 streaming_playcount_over_30s_broadcastsonly AS ss_views
          FROM {{ ref('integral_reporting_vodstreaming') }}) ss
    FULL OUTER JOIN (SELECT poms_series_id AS tvb_id, year AS tvb_year,
                            weeknr AS tvb_weeknr, tv_number_of_broadcasts AS tvb_n
                     FROM {{ ref('integral_reporting_tvbroadcasts') }}) tvb
      ON tvb_id = ss_id AND tvb_year = ss_year AND tvb_weeknr = ss_weeknr
    GROUP BY 1, 2
  ) WHERE n_views_in_reportingyear >= 1000 OR n_broadcasts_in_year >= 1
),

-- facebook branch (lines 43-70).
fb_branch AS (
  SELECT
    b.Naam, b.Net, b.Omroep, b.CCC, b.weekdate, b.weeknr, b.year,
    CASE WHEN b.Naam IS NOT NULL THEN 1 ELSE 0 END AS has_intekening,
    CAST(NULL AS INT) AS is_tv_week,
    CAST(NULL AS BIGINT) AS new_releases,
    'facebook' AS reporting_channel,
    f.fb_number_of_posts AS n_items_per_week,
    'posts' AS media_item_type,
    f.fb_reach_per_week AS weekly_reach_per_week,
    CAST(NULL AS BIGINT) AS daily_reach_per_week,
    CAST(NULL AS BIGINT) AS visits_per_week,
    f.fb_engagement_per_week AS engagement_per_week,
    CAST(NULL AS BIGINT) AS views_per_week,
    CAST(NULL AS DOUBLE) AS hours_watched,
    CAST(NULL AS DOUBLE) AS video_kdh_per_week,
    CAST(NULL AS DOUBLE) AS video_kdh_per_release
  FROM basis b
  LEFT JOIN (SELECT QL_FB_ID AS fb_key, weekdate AS fb_week, fb_number_of_posts,
                    fb_reach_per_week, fb_engagement_per_week
             FROM {{ ref('integral_reporting_facebook') }}) f
    ON b.QL_FB_ID = f.fb_key AND b.weekdate = f.fb_week
),

-- instagram branch (lines 74-99).
ig_branch AS (
  SELECT
    b.Naam, b.Net, b.Omroep, b.CCC, b.weekdate, b.weeknr, b.year,
    CASE WHEN b.Naam IS NOT NULL THEN 1 ELSE 0 END AS has_intekening,
    CAST(NULL AS INT) AS is_tv_week,
    CAST(NULL AS BIGINT) AS new_releases,
    'instagram' AS reporting_channel,
    i.ig_number_of_posts AS n_items_per_week,
    'posts' AS media_item_type,
    i.ig_reach_per_week AS weekly_reach_per_week,
    CAST(NULL AS BIGINT) AS daily_reach_per_week,
    CAST(NULL AS BIGINT) AS visits_per_week,
    i.ig_engagement_per_week AS engagement_per_week,
    CAST(NULL AS BIGINT) AS views_per_week,
    CAST(NULL AS DOUBLE) AS hours_watched,
    CAST(NULL AS DOUBLE) AS video_kdh_per_week,
    CAST(NULL AS DOUBLE) AS video_kdh_per_release
  FROM basis b
  LEFT JOIN (SELECT QL_IG_ID AS ig_key, weekdate AS ig_week, ig_number_of_posts,
                    ig_reach_per_week, ig_engagement_per_week
             FROM {{ ref('integral_reporting_instagram') }}) i
    ON b.QL_IG_ID = i.ig_key AND b.weekdate = i.ig_week
),

-- sites + apps branches share the online join (lines 101-157).
online_joined AS (
  SELECT b.*, o.app_weekly_visitors, o.site_weekly_visitors, o.app_daily_visitors,
         o.site_daily_visitors, o.app_visits, o.site_visits
  FROM basis b
  LEFT JOIN (SELECT ATI_Titel AS on_key, weekdate AS on_week, app_weekly_visitors,
                    site_weekly_visitors, app_daily_visitors, site_daily_visitors,
                    app_visits, site_visits
             FROM {{ ref('integral_reporting_sites_and_apps') }}) o
    ON b.ATI_Titel = o.on_key AND b.weekdate = o.on_week
),
sites_branch AS (
  SELECT
    Naam, Net, Omroep, CCC, weekdate, weeknr, year,
    CASE WHEN Naam IS NOT NULL THEN 1 ELSE 0 END AS has_intekening,
    CAST(NULL AS INT) AS is_tv_week,
    CAST(NULL AS BIGINT) AS new_releases,
    'sites' AS reporting_channel,
    CAST(NULL AS BIGINT) AS n_items_per_week,
    CAST(NULL AS STRING) AS media_item_type,
    site_weekly_visitors AS weekly_reach_per_week,
    site_daily_visitors AS daily_reach_per_week,
    site_visits AS visits_per_week,
    CAST(NULL AS BIGINT) AS engagement_per_week,
    CAST(NULL AS BIGINT) AS views_per_week,
    CAST(NULL AS DOUBLE) AS hours_watched,
    CAST(NULL AS DOUBLE) AS video_kdh_per_week,
    CAST(NULL AS DOUBLE) AS video_kdh_per_release
  FROM online_joined
),
apps_branch AS (
  SELECT
    Naam, Net, Omroep, CCC, weekdate, weeknr, year,
    CASE WHEN Naam IS NOT NULL THEN 1 ELSE 0 END AS has_intekening,
    CAST(NULL AS INT) AS is_tv_week,
    CAST(NULL AS BIGINT) AS new_releases,
    'apps' AS reporting_channel,
    CAST(NULL AS BIGINT) AS n_items_per_week,
    CAST(NULL AS STRING) AS media_item_type,
    app_weekly_visitors AS weekly_reach_per_week,
    app_daily_visitors AS daily_reach_per_week,
    app_visits AS visits_per_week,
    CAST(NULL AS BIGINT) AS engagement_per_week,
    CAST(NULL AS BIGINT) AS views_per_week,
    CAST(NULL AS DOUBLE) AS hours_watched,
    CAST(NULL AS DOUBLE) AS video_kdh_per_week,
    CAST(NULL AS DOUBLE) AS video_kdh_per_release
  FROM online_joined
),

-- youtube branch (lines 160-186).
yt_branch AS (
  SELECT
    b.Naam, b.Net, b.Omroep, b.CCC, b.weekdate, b.weeknr, b.year,
    CASE WHEN b.Naam IS NOT NULL THEN 1 ELSE 0 END AS has_intekening,
    CAST(NULL AS INT) AS is_tv_week,
    CAST(NULL AS BIGINT) AS new_releases,
    'youtube' AS reporting_channel,
    y.yt_number_of_videos AS n_items_per_week,
    'videos' AS media_item_type,
    CAST(NULL AS BIGINT) AS weekly_reach_per_week,
    CAST(NULL AS BIGINT) AS daily_reach_per_week,
    CAST(NULL AS BIGINT) AS visits_per_week,
    y.yt_engagement_per_week AS engagement_per_week,
    y.yt_views_per_week AS views_per_week,
    floor(y.yt_time_spent_per_week_min / 60 * 100.0D + 0.5D) / 100.0D AS hours_watched,
    floor(y.yt_kdh_per_week * 1.0D + 0.5D) / 1.0D AS video_kdh_per_week,
    CAST(NULL AS DOUBLE) AS video_kdh_per_release
  FROM basis b
  LEFT JOIN (SELECT QL_YT_ID AS yt_key, weekdate AS yt_week, yt_number_of_videos,
                    yt_engagement_per_week, yt_views_per_week,
                    yt_time_spent_per_week_min, yt_kdh_per_week
             FROM {{ ref('integral_reporting_youtube') }}) y
    ON b.QL_YT_ID = y.yt_key AND b.weekdate = y.yt_week
),

-- lineair branch: tv LEFT JOIN basis (lines 190-217).
tvb_branch AS (
  SELECT
    coalesce(b.b_naam, t.poms_series_title) AS Naam,
    b.b_net AS Net, b.b_omroep AS Omroep, b.b_ccc AS CCC,
    coalesce(b.b_week, t.weekdate) AS weekdate,
    coalesce(b.b_weeknr, t.weeknr) AS weeknr,
    coalesce(b.b_year, t.year) AS year,
    CASE WHEN b.b_naam IS NOT NULL THEN 1 ELSE 0 END AS has_intekening,
    t.tv_broadcast_week AS is_tv_week,
    t.tv_number_of_broadcasts AS new_releases,
    'lineair' AS reporting_channel,
    t.tv_number_of_broadcasts AS n_items_per_week,
    'videos' AS media_item_type,
    CAST(NULL AS BIGINT) AS weekly_reach_per_week,
    CAST(NULL AS BIGINT) AS daily_reach_per_week,
    CAST(NULL AS BIGINT) AS visits_per_week,
    CAST(NULL AS BIGINT) AS engagement_per_week,
    CAST(NULL AS BIGINT) AS views_per_week,
    floor(t.tv_time_spent_per_week_min / 60 * 100.0D + 0.5D) / 100.0D AS hours_watched,
    floor(t.tv_sum_kdh_per_week * 1.0D + 0.5D) / 1.0D AS video_kdh_per_week,
    floor(t.tv_sum_kdh_per_week / nullif(t.tv_number_of_broadcasts, CAST(0 AS BIGINT))
          * 1.0D + 0.5D) / 1.0D AS video_kdh_per_release
  FROM {{ ref('integral_reporting_tvbroadcasts') }} t
  LEFT JOIN (SELECT Naam AS b_naam, Net AS b_net, Omroep AS b_omroep, CCC AS b_ccc,
                    Serie_mid, weekdate AS b_week, weeknr AS b_weeknr, year AS b_year
             FROM basis) b
    ON b.Serie_mid = t.poms_series_id AND b.b_week = t.weekdate
),

-- VOD branch: stream JOIN cleaning, grouped (lines 219-257).
vod_branch AS (
  SELECT
    Naam, Net, Omroep, CCC, weekdate, weeknr, year,
    has_intekening,
    CAST(NULL AS INT) AS is_tv_week,
    CAST(NULL AS BIGINT) AS new_releases,
    'VOD' AS reporting_channel,
    n_items_per_week,
    'videos' AS media_item_type,
    CAST(NULL AS BIGINT) AS weekly_reach_per_week,
    CAST(NULL AS BIGINT) AS daily_reach_per_week,
    CAST(NULL AS BIGINT) AS visits_per_week,
    CAST(NULL AS BIGINT) AS engagement_per_week,
    views_per_week, hours_watched, video_kdh_per_week, video_kdh_per_release
  FROM (
    SELECT
      coalesce(b.b_naam, v.POMS_series_title) AS Naam,
      b.b_net AS Net, b.b_omroep AS Omroep, b.b_ccc AS CCC,
      coalesce(b.b_week, v.weekdate) AS weekdate,
      coalesce(b.b_weeknr, v.weeknr) AS weeknr,
      coalesce(b.b_year, v.year) AS year,
      MAX(CASE WHEN b.b_naam IS NOT NULL THEN 1 ELSE 0 END) AS has_intekening,
      SUM(v.streaming_number_of_episodes) AS n_items_per_week,
      SUM(v.streaming_playcount_over_30s) AS views_per_week,
      floor(SUM(v.streaming_time_spent_sec / 60 / 60) * 100.0D + 0.5D) / 100.0D AS hours_watched,
      floor(SUM(v.streaming_sum_kdh_per_week) * 1.0D + 0.5D) / 1.0D AS video_kdh_per_week,
      floor(SUM(v.streaming_kdh_for_new_released_episode)
            / nullif(SUM(v.streaming_number_of_new_released_eps), CAST(0 AS BIGINT))
            * 1.0D + 0.5D) / 1.0D AS video_kdh_per_release
    FROM {{ ref('integral_reporting_vodstreaming') }} v
    INNER JOIN intekening_cleaning c
      ON c.scc_id = v.POMS_series_id AND c.scc_year = v.year
    LEFT JOIN (SELECT Naam AS b_naam, Net AS b_net, Omroep AS b_omroep, CCC AS b_ccc,
                      Serie_mid, weekdate AS b_week, weeknr AS b_weeknr, year AS b_year
               FROM basis) b
      ON b.Serie_mid = v.POMS_series_id AND b.b_week = v.weekdate
    GROUP BY 1, 2, 3, 4, 5, 6, 7
  )
),

unioned AS (
  SELECT * FROM fb_branch
  UNION ALL SELECT * FROM ig_branch
  UNION ALL SELECT * FROM sites_branch
  UNION ALL SELECT * FROM apps_branch
  UNION ALL SELECT * FROM yt_branch
  UNION ALL SELECT * FROM tvb_branch
  UNION ALL SELECT * FROM vod_branch
)

-- Final window post-processing + * EXCEPT(...) (lines 260-283).
SELECT
  Naam, Net, Omroep, CCC, weekdate, weeknr, year,
  reporting_channel, n_items_per_week, media_item_type, weekly_reach_per_week,
  daily_reach_per_week, visits_per_week, engagement_per_week, views_per_week,
  hours_watched, video_kdh_per_week, video_kdh_per_release,
  floor(engagement_per_week
        / nullif(CASE WHEN reporting_channel = 'youtube' THEN views_per_week
                      ELSE weekly_reach_per_week END, CAST(0 AS BIGINT))
        * 1000.0D + 0.5D) / 1000.0D AS engagement_ratio,
  floor(daily_reach_per_week / nullif(weekly_reach_per_week, CAST(0 AS BIGINT))
        * 100.0D + 0.5D) / 100.0D AS dau_mau_ratio,
  MAX(is_tv_week) OVER (PARTITION BY weekdate, Naam) AS is_tv_week,
  SUM(CASE WHEN reporting_channel = 'lineair' THEN new_releases
           ELSE CAST(0 AS BIGINT) END) OVER (PARTITION BY Naam) AS n_total_tv_broadcasts,
  MAX(has_intekening) OVER (PARTITION BY Naam) AS has_intekening,
  CASE
    WHEN AVG(CASE WHEN reporting_channel = 'lineair' THEN video_kdh_per_release
                  ELSE 0.0D END) OVER (PARTITION BY Naam) < 100000
      THEN 'avg lineaire KDH < 100.000'
    WHEN AVG(CASE WHEN reporting_channel = 'lineair' THEN video_kdh_per_release
                  ELSE 0.0D END) OVER (PARTITION BY Naam) >= 4000000
      THEN 'avg lineaire KDH > 4.000.000'
    WHEN AVG(CASE WHEN reporting_channel = 'lineair'
                   AND video_kdh_per_release IS NOT NULL THEN 1 ELSE 0 END)
           OVER (PARTITION BY Naam) = 0
      THEN 'no lineair KDH in this week'
    ELSE 'avg lineaire KDH >= 100.000 and < 4.0000.000'
  END AS lineair_kdh_bucket
FROM unioned
