{{ config(materialized='view', schema='integral_reporting') }}
-- Spark-SQL text port of /root/reference/models/datamarts/npo-data-hub/
-- reporting/integral_reporting/integral_reporting_facebook.sql:1-23.
SELECT
  vertaaltabel.Target_FB_pagelikes,
  vertaaltabel.Target_FB_reachperpost,
  vertaaltabel.QL_FB_ID,
  weekdate,
  weekofyear(weekdate) AS weeknr,
  date_part('YEAROFWEEK', weekdate) AS year,
  fb.fans AS fb_fans,
  fb.fansChange AS fb_fans_change,
  fb.ownPosts AS fb_number_of_posts,
  fb.pageImpressionsUnique AS fb_reach_per_week,
  fb.ownPostsEngagement AS fb_engagement_per_week
FROM {{ ref('360_graden_rapportage_vertaaltabel_upload_20_21') }} AS vertaaltabel
CROSS JOIN (
  SELECT explode(sequence(DATE '2018-12-31', {{ var('today') }}, interval 7 days)) AS weekdate
) AS spine
LEFT JOIN {{ ref('quintly_facebook_pages_weekly') }} AS fb
  ON vertaaltabel.QL_FB_ID = fb.profileId
 AND date_part('YEAROFWEEK', fb.intervalBegin) = date_part('YEAROFWEEK', weekdate)
 AND weekofyear(fb.intervalBegin) = weekofyear(weekdate)
WHERE vertaaltabel.Naam IS NOT NULL
