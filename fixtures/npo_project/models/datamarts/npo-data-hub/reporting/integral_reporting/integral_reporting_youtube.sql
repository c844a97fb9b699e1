{{ config(materialized='view', schema='integral_reporting') }}
-- Spark-SQL text port of /root/reference/models/datamarts/npo-data-hub/
-- reporting/integral_reporting/integral_reporting_youtube.sql:1-27,
-- authored for the SqlModel frontend: ref()/var() are template calls,
-- the body is the engine's native Spark SQL dialect (ISOWEEK/ISOYEAR as
-- weekofyear/date_part, GENERATE_DATE_ARRAY as sequence+explode, the
-- injected {{ var('today') }} where the reference calls CURRENT_DATE()).
SELECT
  vertaaltabel.Target_YT_subscribers,
  vertaaltabel.Target_YT_views,
  vertaaltabel.QL_YT_ID,
  weekdate,
  weekofyear(weekdate) AS weeknr,
  date_part('YEAROFWEEK', weekdate) AS year,
  yt.totalSubscribers AS yt_total_subscribers,
  yt.totalSubscribersChange AS yt_total_subscribers_change,
  yt.totalVideos AS yt_number_of_videos,
  yt.views AS yt_views_per_week,
  yt.estimatedminuteswatched AS yt_time_spent_per_week_min,
  yt.totalengagement AS yt_engagement_per_week,
  yt.averageViewPercentage AS yt_view_percentage,
  yt.averageViewDuration AS yt_view_duration,
  (yt.averageViewPercentage / 100) * yt.views AS yt_kdh_per_week
FROM {{ ref('360_graden_rapportage_vertaaltabel_upload_20_21') }} AS vertaaltabel
CROSS JOIN (
  SELECT explode(sequence(DATE '2018-12-31', {{ var('today') }}, interval 7 days)) AS weekdate
) AS spine
LEFT JOIN {{ ref('quintly_youtube_allchannels_weekly') }} AS yt
  ON vertaaltabel.QL_YT_ID = yt.profileId
 AND date_part('YEAROFWEEK', yt.intervalBegin) = date_part('YEAROFWEEK', weekdate)
 AND weekofyear(yt.intervalBegin) = weekofyear(weekdate)
WHERE vertaaltabel.Naam IS NOT NULL
