{{ config(materialized='view', schema='integral_reporting') }}
-- Spark-SQL text port of /root/reference/models/datamarts/npo-data-hub/
-- reporting/integral_reporting/integral_reporting_tvbroadcasts.sql:1-56:
-- episode grain (first-broadcast NPO showings, 6+ national audience),
-- title-week rollup, then the weekly spine LEFT JOINed to facts and the
-- vertaaltabel intekening dimension.
WITH tv_eps AS (
  SELECT
    adv.title,
    adv.date,
    adv.mediaId,
    poms.series_ref AS poms_series_id,
    poms.series_title AS poms_series_title,
    adv.channel,
    floor((unix_micros(min(CAST(adv.endTimeCET AS TIMESTAMP)))
         - unix_micros(min(CAST(adv.beginTimeCET AS TIMESTAMP)))) / 60000000.0D) AS ep_duration_min,
    sum(adv.kdh) AS kdh
  FROM {{ ref('advantedge_tv_viewer_density_per_show_daily_v1') }} AS adv
  LEFT JOIN {{ ref('dim_poms_episodes') }} AS poms
    ON poms.episode_id = adv.mediaId
  WHERE adv.channel RLIKE 'NPO' AND adv.RepeatType = 'FIRST'
    AND adv.audience = '6+' AND adv.universe = 'Nat[SKO]'
    AND date_part('YEAROFWEEK', adv.date) >= 2019
  GROUP BY adv.title, adv.date, adv.mediaId, poms.series_ref, poms.series_title, adv.channel
),
tv_title AS (
  SELECT
    poms_series_id,
    poms_series_title,
    weekofyear(date) AS weeknr,
    date_part('YEAROFWEEK', date) AS year,
    count(DISTINCT concat(mediaId, ' - ', CAST(date AS STRING))) AS tv_number_of_broadcasts,
    sum(ep_duration_min) AS tv_duration_min,
    sum(kdh) AS tv_sum_kdh_per_week,
    sum(ep_duration_min * kdh) AS tv_time_spent_per_week_min
  FROM tv_eps
  GROUP BY poms_series_id, poms_series_title, weekofyear(date), date_part('YEAROFWEEK', date)
)
SELECT
  vertaaltabel.Naam,
  vertaaltabel.Net,
  vertaaltabel.Omroep,
  vertaaltabel.CCC,
  weekdate,
  tv_title.weeknr,
  tv_title.year,
  CASE WHEN tv_title.poms_series_title IS NOT NULL THEN 1 ELSE 0 END AS tv_broadcast_week,
  tv_title.poms_series_id,
  tv_title.poms_series_title,
  tv_title.tv_number_of_broadcasts,
  tv_title.tv_duration_min,
  tv_title.tv_sum_kdh_per_week,
  tv_title.tv_time_spent_per_week_min
FROM (
  SELECT explode(sequence(DATE '2018-12-31', {{ var('today') }}, interval 7 days)) AS weekdate
) AS spine
LEFT JOIN tv_title
  ON weekofyear(weekdate) = tv_title.weeknr
 AND tv_title.year = date_part('YEAROFWEEK', weekdate)
LEFT JOIN {{ ref('360_graden_rapportage_vertaaltabel_upload_20_21') }} AS vertaaltabel
  ON vertaaltabel.Serie_mid = tv_title.poms_series_id
