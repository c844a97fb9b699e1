{{ config(materialized='view') }}
-- Spark-SQL text port of /root/reference/models/datamarts/npo-data-hub/
-- utils/poms_flattened.sql:1-94 for the SqlModel frontend. BigQuery's
-- five comma-stacked `LEFT JOIN UNNEST` clauses (lines 23-28) become
-- LATERAL VIEW OUTER explode chains (same nested-cartesian multiplicity,
-- NULL/empty arrays preserved as one NULL row), `UNNEST ... WITH OFFSET`
-- becomes posexplode, SAFE/array semantics per graft.dialect.Dialect.
WITH exploded_references AS (
  SELECT
    id AS mid,
    `type`,
    sort_date,
    duration,
    age_rating,
    broadcasters_e.id AS broadcaster_id,
    broadcaster_offset,
    MAX(CASE WHEN broadcasters_e.id = 'NOS' THEN TRUE ELSE FALSE END) AS is_nos_content,
    MAX(CASE WHEN startswith(genres_e.id, '3.0.1.1') THEN TRUE ELSE FALSE END) AS is_youth_genre,
    MAX(CASE WHEN schedule_events_e.net = 'ZAPP' THEN TRUE ELSE FALSE END) AS is_zapp_net,
    MAX(CASE WHEN schedule_events_e.net = 'ZAPPE' THEN TRUE ELSE FALSE END) AS is_zappelin_net,
    MAX(CASE WHEN episode_of_e.`type` = 'SERIES' THEN episode_of_e.mid_ref END) AS episode_of_series,
    MAX(CASE WHEN episode_of_e.`type` = 'SEASON' THEN episode_of_e.mid_ref END) AS episode_of_season,
    MAX(CASE WHEN descendant_of_e.`type` = 'SERIES' THEN descendant_of_e.mid_ref END) AS descendant_of_series,
    MAX(CASE WHEN descendant_of_e.`type` = 'SEASON' THEN descendant_of_e.mid_ref END) AS descendant_of_season,
    MAX(CASE WHEN member_of_e.`type` = 'SERIES' THEN member_of_e.mid_ref END) AS member_of_series,
    MAX(CASE WHEN member_of_e.`type` = 'SEASON' THEN member_of_e.mid_ref END) AS member_of_season
  FROM {{ ref('audiovisual_metadata_poms_metadata_v1') }}
  LATERAL VIEW OUTER explode(episode_of) t1 AS episode_of_e
  LATERAL VIEW OUTER explode(descendant_of) t2 AS descendant_of_e
  LATERAL VIEW OUTER explode(member_of) t3 AS member_of_e
  LATERAL VIEW OUTER explode(genres) t4 AS genres_e
  LATERAL VIEW OUTER explode(schedule_events) t5 AS schedule_events_e
  LATERAL VIEW OUTER posexplode(broadcasters) t6 AS broadcaster_offset, broadcasters_e
  -- MIT-939 broadcaster filter with the NULL escape (reference line 30).
  WHERE broadcasters_e.id NOT IN ('PP', 'RVD', 'RNW', 'SOCU', 'BVN', 'MTNL', 'EXT')
     OR broadcasters_e.id IS NULL
  GROUP BY mid, `type`, age_rating, sort_date, duration, broadcaster_id, broadcaster_offset
),

define_columns AS (
  SELECT
    mid,
    `type`,
    CASE
      WHEN `type` = 'BROADCAST' THEN coalesce(episode_of_series, member_of_series, descendant_of_series)
      WHEN `type` = 'SEASON' THEN member_of_series
      WHEN `type` = 'SEGMENT' THEN descendant_of_series
    END AS series_ref,
    CASE
      WHEN `type` = 'BROADCAST' THEN coalesce(member_of_season, descendant_of_season, episode_of_season)
      WHEN `type` = 'SEGMENT' THEN descendant_of_season
    END AS season_ref,
    duration,
    sort_date,
    age_rating,
    is_youth_genre,
    is_zapp_net,
    is_zappelin_net,
    broadcaster_id,
    is_nos_content,
    ROW_NUMBER() OVER (PARTITION BY mid ORDER BY broadcaster_offset ASC) AS broadcaster_row_number
  FROM exploded_references
)

SELECT
  mid,
  `type`,
  CASE WHEN series_ref IS NULL OR series_ref = '' THEN mid ELSE series_ref END AS series_id,
  CASE WHEN season_ref IS NULL OR season_ref = '' THEN mid ELSE season_ref END AS season_id,
  CASE WHEN is_zappelin_net OR (age_rating = 'ALL' AND is_youth_genre) THEN 6
       WHEN is_zappelin_net OR (age_rating IN ('ALL', '6') AND is_youth_genre) THEN 9
       WHEN is_zapp_net OR is_zappelin_net OR (age_rating IN ('ALL', '6', '9') AND is_youth_genre) THEN 12
  END AS min_age_classification,
  sort_date,
  duration,
  broadcaster_id AS first_broadcaster,
  is_nos_content
FROM define_columns
WHERE broadcaster_row_number = 1
