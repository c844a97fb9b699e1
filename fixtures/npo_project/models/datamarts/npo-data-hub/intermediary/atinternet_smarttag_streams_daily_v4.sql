{% set partitions_to_replace = [
    'CAST({{ var("today") }} AS STRING)',
    'CAST(date_sub({{ var("today") }}, 1) AS STRING)',
    'CAST(date_sub({{ var("today") }}, 2) AS STRING)',
    'CAST(date_sub({{ var("today") }}, 3) AS STRING)',
    'CAST(date_sub({{ var("today") }}, 4) AS STRING)',
    'CAST(date_sub({{ var("today") }}, 5) AS STRING)',
    'CAST(date_sub({{ var("today") }}, 6) AS STRING)',
    'CAST(date_sub({{ var("today") }}, 7) AS STRING)',
    'CAST(date_sub({{ var("today") }}, 8) AS STRING)'
] %}

{{ config(
    schema='atinternet_smarttag_streams_daily',
    materialized='incremental',
    incremental_strategy='insert_overwrite',
    partition_by='evt_date',
    partitions = partitions_to_replace
  )
}}

-- Spark-SQL text port of /root/reference/models/datamarts/npo-data-hub/
-- intermediary/atinternet_smarttag_streams_daily_v4.sql:1-244 for the
-- SqlModel frontend: the reference's Jinja partition list (lines 1-12)
-- is the same {% set %} + `| join` templating, with the injected
-- {{ var("today") }} where the reference writes current_date so runs are
-- reproducible; SPLIT literal-delimiter, SAFE_OFFSET, TIMESTAMP_DIFF and
-- STRING_AGG semantics follow graft.dialect.Dialect.

-- Minute-densified broadcast rows, NPO channels only, deduped
-- (reference lines 26-41).
WITH adv_events AS (
  SELECT DISTINCT
    date AS adv_date,
    beginTimeCET AS adv_beginTimeCET,
    endTimeCET AS adv_endTimeCET,
    adv_minute,
    title AS adv_title,
    channel AS adv_channel,
    mediaId AS adv_mid
  FROM {{ ref('advantedge_tv_viewer_density_per_show_daily_v1') }}
  LATERAL VIEW explode(sequence(CAST(beginTimeCET AS TIMESTAMP),
                                CAST(endTimeCET AS TIMESTAMP),
                                interval 1 minute)) t AS adv_minute
  WHERE channel RLIKE 'NPO'
),

-- Cleaned + split AT Internet payload; keeps the raw d_rm_type /
-- d_rm_theme1 scalars for the branch filters (lines 43-62).
raw AS (
  SELECT
    d_rm_playid,
    concat(d_visit_id, d_uv_id) AS unique_user_id,
    d_date_hour_event,
    d_rm_action,
    d_rm_l2,
    d_rm_playback_time,
    split(d_rm_content, '_\\|\\|_') AS content,
    split(d_rm_theme1, '_\\|\\|_') AS theme1,
    -- theme2 sometimes holds a bogus hh:mm:ss value; the reference's
    -- regex gate keeps only values containing the delimiter (lines
    -- 56-59, pattern ported verbatim).
    CASE WHEN d_rm_theme2 RLIKE '_/|/|_'
         THEN split(d_rm_theme2, '_\\|\\|_')
         ELSE CAST(NULL AS ARRAY<STRING>) END AS theme2,
    split(d_rm_theme3, '_\\|\\|_') AS theme3,
    d_rm_type,
    d_rm_theme1 AS rm_theme1_scalar
  FROM {{ ref('media_events') }}
),

raw_events AS (
  -- Livestream branch: channel mapping on the mid split out of the
  -- payload, as-of match to the nearest started show (lines 43-75).
  SELECT
    r.d_rm_playid, r.unique_user_id, r.d_date_hour_event, r.d_rm_action,
    r.d_rm_l2, r.d_rm_playback_time, r.content,
    adv.adv_mid AS matched_livestream_id,
    r.theme1, r.theme2, r.theme3,
    CASE WHEN adv.adv_mid IS NOT NULL THEN 'livetvzender - streamID_matched'
         ELSE 'livetvzender - no_streamID_to_match' END AS stream_match_type,
    ROW_NUMBER() OVER (
      PARTITION BY r.d_rm_playid, r.unique_user_id, r.d_date_hour_event,
                   r.d_rm_action, r.d_rm_playback_time
      ORDER BY CAST(floor((unix_micros(r.d_date_hour_event)
                           - unix_micros(CAST(adv.adv_beginTimeCET AS TIMESTAMP)))
                          / 1000000.0D) AS BIGINT) ASC
    ) AS dedup
  FROM raw r
  INNER JOIN {{ ref('live_stream_name_mapping_v1') }} AS cm
    ON cm.channel_id = nullif(try_element_at(r.content, 2), '')
  LEFT JOIN adv_events adv
    ON cm.channel = adv.adv_channel
   AND date_trunc('minute', r.d_date_hour_event) = adv.adv_minute
  WHERE r.d_rm_type <> 'Animations'
    AND r.rm_theme1_scalar = 'livetvzender'
    AND CAST(CAST(r.d_date_hour_event AS DATE) AS STRING) IN ({{ partitions_to_replace | join(',') }})

  UNION ALL

  -- Regular (non-live) branch with a faked dedup (lines 77-101).
  SELECT
    r.d_rm_playid, r.unique_user_id, r.d_date_hour_event, r.d_rm_action,
    r.d_rm_l2, r.d_rm_playback_time, r.content,
    CAST(NULL AS STRING) AS matched_livestream_id,
    r.theme1, r.theme2, r.theme3,
    'regular streamid' AS stream_match_type,
    1 AS dedup
  FROM raw r
  WHERE r.d_rm_type <> 'Animations'
    AND (r.rm_theme1_scalar IS NULL OR r.rm_theme1_scalar <> 'livetvzender')
    AND CAST(CAST(r.d_date_hour_event AS DATE) AS STRING) IN ({{ partitions_to_replace | join(',') }})
),

-- Per-stream aggregation with payload cleaning (lines 104-137).
agg_events_per_stream AS (
  SELECT
    d_rm_playid,
    unique_user_id,
    CAST(d_date_hour_event AS DATE) AS evt_date,
    nullif(try_element_at(content, 2), '') AS evt_base_mid,
    stream_match_type,
    coalesce(matched_livestream_id, nullif(try_element_at(content, 2), '')) AS evt_mid,
    nullif(try_element_at(content, 1), '') AS evt_media_name,
    nullif(nullif(try_element_at(theme1, 1), ''), 'null') AS evt_stream_type,
    nullif(try_element_at(theme2, 1), 'null') AS evt_programme,
    nullif(try_element_at(theme2, 2), 'null') AS evt_broadcaster,
    try_element_at(theme2, 3) AS evt_programme_podcast,
    try_element_at(theme3, 1) AS evt_player_platform,
    try_element_at(theme3, 2) AS evt_player_version,
    d_rm_l2 AS evt_brand,
    SUM(d_rm_playback_time) AS evt_playback_time_total_in_sec,
    COUNT(DISTINCT CASE WHEN d_rm_action = 'Play'
                          OR stream_match_type = 'livetvzender - streamID_matched'
                        THEN d_rm_playid END) AS evt_play_count_total
  FROM raw_events
  WHERE dedup = 1
  GROUP BY 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14
),

-- Per-date aggregation with the 30s threshold (lines 139-161).
agg_events_per_date AS (
  SELECT
    evt_date, evt_mid, evt_base_mid, evt_media_name, stream_match_type,
    evt_stream_type, evt_programme, evt_broadcaster, evt_programme_podcast,
    evt_player_platform, evt_player_version, evt_brand,
    COUNT(DISTINCT unique_user_id) AS n_unique_userids,
    SUM(evt_playback_time_total_in_sec) AS evt_playback_time_total_in_sec,
    SUM(evt_play_count_total) AS evt_play_count_total,
    SUM(CASE WHEN evt_playback_time_total_in_sec >= 30
             THEN evt_play_count_total ELSE 0 END) AS evt_play_count_over_30s
  FROM agg_events_per_stream
  GROUP BY 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12
),

-- Indexable season/series descendants (lines 163-176).
metadata_descendants AS (
  SELECT
    id,
    d.`type` AS `type`,
    d.mid_ref AS mid_ref,
    ROW_NUMBER() OVER (PARTITION BY id, d.`type`
                       ORDER BY id, d.`type`, d.mid_ref) AS `index`
  FROM {{ ref('audiovisual_metadata_poms_metadata_v1') }}
  LATERAL VIEW explode(descendant_of) t AS d
  WHERE d.`type` IN ('SEASON', 'SERIES')
),

-- Highest SEASON index among episode_of entries (lines 206-213).
episode AS (
  SELECT id, MAX(CASE WHEN e.`type` = 'SEASON' THEN e.`index` END) AS mtd_episode_of_index
  FROM {{ ref('audiovisual_metadata_poms_metadata_v1') }}
  LATERAL VIEW explode(episode_of) t AS e
  GROUP BY id
),

-- Ordered broadcaster aggregate (lines 216-223).
broadcasters_agg AS (
  SELECT id, array_join(array_sort(collect_list(b.value)), ',') AS mtd_broadcasters
  FROM {{ ref('audiovisual_metadata_poms_metadata_v1') }}
  LATERAL VIEW explode(broadcasters) t AS b
  GROUP BY id
),

-- First NED1/2/3 channel (lines 226-237): distinct then rank.
channels AS (
  SELECT id, channel AS mtd_channel FROM (
    SELECT id, channel,
      ROW_NUMBER() OVER (PARTITION BY id ORDER BY id, channel) AS rn
    FROM (
      SELECT DISTINCT id, s.channel AS channel
      FROM {{ ref('audiovisual_metadata_poms_metadata_v1') }}
      LATERAL VIEW explode(schedule_events) t AS s
      WHERE s.channel IN ('NED1', 'NED2', 'NED3')
    )
  ) WHERE rn = 1
),

-- Enriched metadata (lines 178-238).
metadata AS (
  SELECT
    base.id,
    CAST(floor(CAST(base.duration AS DOUBLE) / CAST(1000 AS DOUBLE)) AS BIGINT) AS mtd_duration_in_sec,
    base.sort_date AS mtd_sort_date,
    base.`type` AS mtd_type,
    try_element_at(try_element_at(base.genres, 1).terms, 1) AS mtd_genre_main,
    try_element_at(try_element_at(base.genres, 1).terms, 2) AS mtd_genre_sub,
    try_element_at(base.titles, 1).value AS mtd_title_main,
    try_element_at(base.titles, 2).value AS mtd_title_sub,
    season.mid_ref AS mtd_season_mid,
    series.mid_ref AS mtd_series_mid,
    episode.mtd_episode_of_index,
    ba.mtd_broadcasters,
    ch.mtd_channel
  FROM {{ ref('audiovisual_metadata_poms_metadata_v1') }} base
  LEFT JOIN (SELECT id, mid_ref FROM metadata_descendants
             WHERE `type` = 'SEASON' AND `index` = 1) season ON season.id = base.id
  LEFT JOIN (SELECT id, mid_ref FROM metadata_descendants
             WHERE `type` = 'SERIES' AND `index` = 1) series ON series.id = base.id
  LEFT JOIN episode ON episode.id = base.id
  LEFT JOIN broadcasters_agg ba ON ba.id = base.id
  LEFT JOIN channels ch ON ch.id = base.id
)

-- Final enrichment join (lines 240-244): metadata.* EXCEPT(id).
SELECT
  d.evt_date, d.evt_mid, d.evt_base_mid, d.evt_media_name, d.stream_match_type,
  d.evt_stream_type, d.evt_programme, d.evt_broadcaster, d.evt_programme_podcast,
  d.evt_player_platform, d.evt_player_version, d.evt_brand,
  d.n_unique_userids, d.evt_playback_time_total_in_sec, d.evt_play_count_total,
  d.evt_play_count_over_30s,
  m.mtd_duration_in_sec, m.mtd_sort_date, m.mtd_type, m.mtd_genre_main,
  m.mtd_genre_sub, m.mtd_title_main, m.mtd_title_sub, m.mtd_season_mid,
  m.mtd_series_mid, m.mtd_episode_of_index, m.mtd_channel, m.mtd_broadcasters
FROM agg_events_per_date d
LEFT JOIN metadata m ON d.evt_mid = m.id
