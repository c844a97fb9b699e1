{{ config(materialized='view', schema='integral_reporting') }}
-- Spark-SQL text port of /root/reference/models/datamarts/npo-data-hub/
-- reporting/integral_reporting/integral_reporting_sites_and_apps.sql:1-49:
-- pages + per-programme pages union (programme suffixed into the title
-- key), spine-aligned per ISO week, app/site measures split by the
-- platform column.
WITH ati AS (
  SELECT level_2, platform, weekdate AS ati_weekdate, weeknum, year,
         weekly_visitors, daily_visitors, visits
  FROM {{ ref('atinternet_smarttag_pages_weekly_v2') }}
  UNION ALL
  SELECT concat(level_2, ' - ', programme) AS level_2, platform,
         weekdate AS ati_weekdate, weeknum, year,
         weekly_visitors, daily_visitors, visits
  FROM {{ ref('atinternet_smarttag_pages_programmes_weekly_v2') }}
)
SELECT
  vertaaltabel.Target_AT_app,
  vertaaltabel.Target_AT_site,
  vertaaltabel.ATI_Titel,
  weekdate,
  weekofyear(weekdate) AS weeknr,
  date_part('YEAROFWEEK', weekdate) AS year,
  sum(CASE WHEN ati.platform LIKE 'app' THEN ati.weekly_visitors END) AS app_weekly_visitors,
  sum(CASE WHEN ati.platform LIKE 'site' THEN ati.weekly_visitors END) AS site_weekly_visitors,
  sum(CASE WHEN ati.platform LIKE 'app' THEN ati.daily_visitors END) AS app_daily_visitors,
  sum(CASE WHEN ati.platform LIKE 'site' THEN ati.daily_visitors END) AS site_daily_visitors,
  sum(CASE WHEN ati.platform LIKE 'app' THEN ati.visits END) AS app_visits,
  sum(CASE WHEN ati.platform LIKE 'site' THEN ati.visits END) AS site_visits
FROM {{ ref('360_graden_rapportage_vertaaltabel_upload_20_21') }} AS vertaaltabel
CROSS JOIN (
  SELECT explode(sequence(DATE '2018-12-31', {{ var('today') }}, interval 7 days)) AS weekdate
) AS spine
LEFT JOIN ati
  ON vertaaltabel.ATI_Titel = ati.level_2
 AND ati.year = date_part('YEAROFWEEK', weekdate)
 AND ati.weeknum = weekofyear(weekdate)
WHERE vertaaltabel.Naam IS NOT NULL
GROUP BY vertaaltabel.Target_AT_app, vertaaltabel.Target_AT_site,
  vertaaltabel.ATI_Titel, weekdate, weekofyear(weekdate),
  date_part('YEAROFWEEK', weekdate)
