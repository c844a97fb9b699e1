{{ config(materialized='view', schema='integral_reporting') }}
-- Spark-SQL text port of /root/reference/models/datamarts/npo-data-hub/
-- reporting/integral_reporting/integral_reporting_instagram.sql:1-24.
SELECT
  vertaaltabel.Target_IG_followers,
  vertaaltabel.Target_IG_reachperpost,
  vertaaltabel.QL_IG_ID,
  weekdate,
  weekofyear(weekdate) AS weeknr,
  date_part('YEAROFWEEK', weekdate) AS year,
  ig.followers AS ig_followers,
  ig.followersChange AS ig_followers_change,
  ig.posts AS ig_number_of_posts,
  ig.postschange AS ig_number_of_posts_change,
  ig.reach AS ig_reach_per_week,
  ig.totalengagement AS ig_engagement_per_week
FROM {{ ref('360_graden_rapportage_vertaaltabel_upload_20_21') }} AS vertaaltabel
CROSS JOIN (
  SELECT explode(sequence(DATE '2018-12-31', {{ var('today') }}, interval 7 days)) AS weekdate
) AS spine
LEFT JOIN {{ ref('quintly_instagram_pages_weekly') }} AS ig
  ON vertaaltabel.QL_IG_ID = ig.profileId
 AND date_part('YEAROFWEEK', ig.intervalBegin) = date_part('YEAROFWEEK', weekdate)
 AND weekofyear(ig.intervalBegin) = weekofyear(weekdate)
WHERE vertaaltabel.Naam IS NOT NULL
