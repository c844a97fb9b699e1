{{ config(materialized='view') }}
-- Spark-SQL text port of /root/reference/models/source/ingest_latest/
-- quintly_youtube_allchannels_weekly.sql:1-13 (latest-partition source
-- elimination): keep only the newest partitionDate, then drop the
-- partition column. The scalar subquery prunes to one partition at plan
-- time on a partitioned lake layout. The {{ source() }} call resolves
-- through the sources.yml declaration in models/source/ingest_incremental/.
SELECT * EXCEPT (partitionDate)
FROM {{ source('quintly_youtube_allchannels_weekly', 'v1') }}
WHERE partitionDate = (SELECT MAX(partitionDate)
                       FROM {{ source('quintly_youtube_allchannels_weekly', 'v1') }})
