{{ config(materialized='view') }}
-- Spark-SQL text port of /root/reference/models/source/ingest_latest/
-- quintly_youtube_allchannels_weekly.sql:1-13 (latest-partition source
-- elimination): keep only the newest partitionDate, then drop the
-- partition column. The scalar subquery prunes to one partition at plan
-- time on a partitioned lake layout.
SELECT * EXCEPT (partitionDate)
FROM {{ ref('src_quintly_youtube_v1') }}
WHERE partitionDate = (SELECT MAX(partitionDate)
                       FROM {{ ref('src_quintly_youtube_v1') }})
