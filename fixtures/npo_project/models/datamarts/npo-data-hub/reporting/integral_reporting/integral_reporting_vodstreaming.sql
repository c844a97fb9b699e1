{{ config(materialized='view', schema='integral_reporting') }}
-- Spark-SQL text port of /root/reference/models/datamarts/npo-data-hub/
-- reporting/integral_reporting/integral_reporting_vodstreaming.sql:1-158:
-- new linear episodes with season windows, the 100-plays first-streaming
-- day, the 90-day release-date rule, the release-week KDH branch UNION
-- ALL the consumption branch, and the spine-driven weekly rollup.
-- NOTE: `pf.season_id AS channel` mirrors the reference's missing-comma
-- alias (`poms_info.season_id channel`) deliberately — SURVEY.md §7.4.5.
WITH spine AS (
  SELECT explode(sequence(DATE '2018-12-31', {{ var('today') }}, interval 7 days)) AS weekdate
),
new_tv_eps AS (
  SELECT
    adv.title,
    adv.date AS first_broadcast_date,
    adv.beginTimeCET AS start_eps,
    adv.mediaId,
    pf.season_id AS channel,
    floor((unix_micros(CAST(adv.endTimeCET AS TIMESTAMP))
         - unix_micros(CAST(adv.beginTimeCET AS TIMESTAMP))) / 60000000.0D) AS ep_duration_min,
    min(adv.date) OVER (PARTITION BY pf.season_id) AS first_known_eps_date_season,
    max(adv.date) OVER (PARTITION BY pf.season_id) AS last_known_eps_date_season
  FROM {{ ref('advantedge_tv_viewer_density_per_show_daily_v1') }} AS adv
  LEFT JOIN (SELECT mid, season_id FROM {{ ref('poms_flattened') }}) AS pf
    ON pf.mid = adv.mediaId
  WHERE adv.channel RLIKE 'NPO' AND adv.RepeatType = 'FIRST'
    AND adv.audience = '6+' AND adv.universe = 'Nat[SKO]'
    AND date_part('YEAROFWEEK', adv.date) >= 2019
),
first_streaming_days AS (
  SELECT evt_mid, min(evt_date) AS first_stream_day
  FROM (
    SELECT evt_mid, evt_date
    FROM {{ ref('atinternet_smarttag_streams_daily_v4') }}
    WHERE mtd_type = 'BROADCAST'
    GROUP BY evt_mid, evt_date
    HAVING sum(evt_play_count_over_30s) >= 100
  )
  GROUP BY evt_mid
),
new_releases AS (
  SELECT DISTINCT * FROM (
    SELECT
      dim.episode_id AS mediaid,
      dim.series_ref,
      dim.series_title,
      dim.episode_type,
      dim.season_ref,
      dim.`index` AS eps_nr,
      dim.season_index AS season_nr,
      coalesce(eps.first_broadcast_date,
        CASE WHEN datediff(CAST(dim.start_linear_first_broadcast AS DATE), fsd.first_stream_day) >= 90
             THEN fsd.first_stream_day
             ELSE CAST(dim.start_linear_first_broadcast AS DATE) END) AS first_broadcast_date,
      CASE WHEN eps.first_broadcast_date IS NULL THEN 0 ELSE 1 END AS has_had_linear_release,
      CASE WHEN coalesce(eps.first_broadcast_date,
                         CAST(dim.start_linear_first_broadcast AS DATE)) IS NULL
           THEN 0 ELSE 1 END AS has_scheduled_lineair_release,
      min(coalesce(eps.first_broadcast_date,
        CASE WHEN datediff(CAST(dim.start_linear_first_broadcast AS DATE), fsd.first_stream_day) >= 90
             THEN fsd.first_stream_day
             ELSE CAST(dim.start_linear_first_broadcast AS DATE) END))
        OVER (PARTITION BY dim.season_ref) AS first_broadcast_season,
      max(coalesce(eps.first_broadcast_date,
        CASE WHEN datediff(CAST(dim.start_linear_first_broadcast AS DATE), fsd.first_stream_day) >= 90
             THEN fsd.first_stream_day
             ELSE CAST(dim.start_linear_first_broadcast AS DATE) END))
        OVER (PARTITION BY dim.season_ref) AS last_known_broadcast_season
    FROM {{ ref('dim_poms_episodes') }} AS dim
    LEFT JOIN (SELECT mediaId, first_broadcast_date FROM new_tv_eps) AS eps
      ON dim.episode_id = eps.mediaId
    LEFT JOIN first_streaming_days AS fsd
      ON fsd.evt_mid = dim.episode_id
    WHERE dim.episode_type = 'BROADCAST'
  )
),
dim_sel AS (
  SELECT episode_id, series_ref AS p_series_ref, series_title AS p_series_title
  FROM {{ ref('dim_poms_episodes') }}
),
branch_a AS (
  SELECT
    sd.evt_mid,
    dim_sel.p_series_ref AS series_ref,
    dim_sel.p_series_title AS series_title,
    sd.evt_programme,
    weekofyear(nr.first_broadcast_date) AS evt_weeknr,
    date_part('YEAROFWEEK', nr.first_broadcast_date) AS evt_year,
    avg(sd.mtd_duration_in_sec) AS streaming_duration_sec,
    CAST(NULL AS BIGINT) AS streaming_playcount_over_30s,
    CAST(NULL AS BIGINT) AS streaming_playcount_over_30s_broadcastsonly,
    CAST(NULL AS DOUBLE) AS streaming_time_spent_sec,
    sum(CASE WHEN sd.mtd_type = 'BROADCAST'
              AND datediff(sd.evt_date, nr.last_known_broadcast_season) <= 28
             THEN sd.evt_playback_time_total_in_sec ELSE CAST(0.0 AS DOUBLE) END)
      / nullif(max(CASE WHEN sd.mtd_type = 'BROADCAST'
                         AND datediff(sd.evt_date, nr.last_known_broadcast_season) <= 28
                        THEN sd.mtd_duration_in_sec ELSE CAST(0 AS BIGINT) END),
               CAST(0 AS BIGINT)) AS streaming_kdh_for_new_released_episode,
    max(CASE WHEN sd.mtd_type = 'BROADCAST'
              AND datediff(sd.evt_date, nr.last_known_broadcast_season) <= 28
             THEN sd.evt_mid END) AS mid_counts_for_new_release,
    CAST(NULL AS DOUBLE) AS streaming_kdh_per_episode,
    max(CASE WHEN nr.has_had_linear_release = 1 THEN 1 ELSE 0 END) AS has_had_linear_release,
    max(CASE WHEN nr.has_had_linear_release = 0
              AND nr.has_scheduled_lineair_release = 1 THEN 1 ELSE 0 END) AS has_scheduled_lineair_release,
    max(CASE WHEN nr.has_had_linear_release = 0
              AND nr.has_scheduled_lineair_release = 0 THEN 1 ELSE 0 END) AS vod_only_release
  FROM {{ ref('atinternet_smarttag_streams_daily_v4') }} AS sd
  LEFT JOIN new_releases AS nr ON nr.mediaid = sd.evt_mid
  LEFT JOIN dim_sel ON dim_sel.episode_id = sd.evt_mid
  GROUP BY sd.evt_mid, dim_sel.p_series_ref, dim_sel.p_series_title, sd.evt_programme,
    weekofyear(nr.first_broadcast_date), date_part('YEAROFWEEK', nr.first_broadcast_date)
),
branch_b AS (
  SELECT
    sd.evt_mid,
    dim_sel.p_series_ref AS series_ref,
    dim_sel.p_series_title AS series_title,
    sd.evt_programme,
    weekofyear(sd.evt_date) AS evt_weeknr,
    date_part('YEAROFWEEK', sd.evt_date) AS evt_year,
    avg(sd.mtd_duration_in_sec) AS streaming_duration_sec,
    sum(sd.evt_play_count_over_30s) AS streaming_playcount_over_30s,
    sum(CASE WHEN sd.mtd_type = 'BROADCAST' THEN sd.evt_play_count_over_30s
             ELSE CAST(0 AS BIGINT) END) AS streaming_playcount_over_30s_broadcastsonly,
    sum(sd.evt_playback_time_total_in_sec) AS streaming_time_spent_sec,
    CAST(NULL AS DOUBLE) AS streaming_kdh_for_new_released_episode,
    CAST(NULL AS STRING) AS mid_counts_for_new_release,
    sum(sd.evt_playback_time_total_in_sec)
      / nullif(avg(sd.mtd_duration_in_sec), CAST(0.0 AS DOUBLE)) AS streaming_kdh_per_episode,
    CAST(NULL AS INT) AS has_had_linear_release,
    CAST(NULL AS INT) AS has_scheduled_lineair_release,
    CAST(NULL AS INT) AS vod_only_release
  FROM {{ ref('atinternet_smarttag_streams_daily_v4') }} AS sd
  LEFT JOIN dim_sel ON dim_sel.episode_id = sd.evt_mid
  GROUP BY sd.evt_mid, dim_sel.p_series_ref, dim_sel.p_series_title, sd.evt_programme,
    weekofyear(sd.evt_date), date_part('YEAROFWEEK', sd.evt_date)
),
streaming_info AS (
  SELECT evt_mid, series_ref, series_title, evt_programme, evt_weeknr, evt_year,
         streaming_duration_sec, streaming_playcount_over_30s,
         streaming_playcount_over_30s_broadcastsonly, streaming_time_spent_sec,
         streaming_kdh_for_new_released_episode, mid_counts_for_new_release,
         streaming_kdh_per_episode, has_had_linear_release,
         has_scheduled_lineair_release, vod_only_release
  FROM branch_a
  UNION ALL
  SELECT evt_mid, series_ref, series_title, evt_programme, evt_weeknr, evt_year,
         streaming_duration_sec, streaming_playcount_over_30s,
         streaming_playcount_over_30s_broadcastsonly, streaming_time_spent_sec,
         streaming_kdh_for_new_released_episode, mid_counts_for_new_release,
         streaming_kdh_per_episode, has_had_linear_release,
         has_scheduled_lineair_release, vod_only_release
  FROM branch_b
)
SELECT
  coalesce(v.Stream_Titel, si.series_title) AS Stream_join_title,
  si.series_title AS POMS_series_title,
  si.series_ref AS POMS_series_id,
  CASE WHEN v.Stream_Titel IS NULL THEN 0 ELSE 1 END AS has_intekening,
  weekdate,
  count(DISTINCT si.evt_mid) AS streaming_number_of_episodes,
  sum(si.streaming_duration_sec) AS streaming_duration_sec,
  sum(si.streaming_playcount_over_30s) AS streaming_playcount_over_30s,
  sum(si.streaming_playcount_over_30s_broadcastsonly) AS streaming_playcount_over_30s_broadcastsonly,
  sum(si.streaming_time_spent_sec) AS streaming_time_spent_sec,
  sum(si.streaming_kdh_per_episode) AS streaming_sum_kdh_per_week,
  sum(si.streaming_kdh_for_new_released_episode) AS streaming_kdh_for_new_released_episode,
  count(DISTINCT si.mid_counts_for_new_release) AS streaming_number_of_new_released_eps,
  max(si.has_had_linear_release) AS week_with_new_lineair_release,
  max(CASE WHEN si.has_had_linear_release = 1 OR si.has_scheduled_lineair_release = 1
            OR si.vod_only_release = 1 THEN 1 ELSE 0 END) AS week_with_new_release,
  weekofyear(weekdate) AS weeknr,
  date_part('YEAROFWEEK', weekdate) AS year
FROM spine
LEFT JOIN streaming_info AS si
  ON si.evt_year = date_part('YEAROFWEEK', weekdate)
 AND si.evt_weeknr = weekofyear(weekdate)
LEFT JOIN (
  SELECT Stream_Titel, Serie_mid
  FROM {{ ref('360_graden_rapportage_vertaaltabel_upload_20_21') }}
) AS v ON v.Serie_mid = si.series_ref
GROUP BY coalesce(v.Stream_Titel, si.series_title), si.series_title, si.series_ref,
  CASE WHEN v.Stream_Titel IS NULL THEN 0 ELSE 1 END, weekdate
ORDER BY weekdate DESC
