{{ config(materialized='view') }}
-- dbt_utils cross-database date/string/cast macros, rendered to the
-- engine's Spark dialect (timestampadd/timestampdiff/split_part/
-- try_cast); DuckDB re-derives each from its own builtins.
SELECT o_orderkey,
  CAST({{ dbt_utils.dateadd('day', 7, 'o_orderdate') }} AS DATE) AS due_date,
  {{ dbt_utils.datediff('o_orderdate', "TIMESTAMP '2000-01-01 00:00:00'", 'day') }} AS days_to_y2k,
  {{ dbt_utils.split_part('o_orderpriority', "'-'", 1) }} AS prio_code,
  {{ dbt_utils.safe_cast('o_orderstatus', 'int') }} AS status_int,
  {{ dbt_utils.hash('o_orderkey') }} AS key_hash
FROM {{ source('tpch', 'orders') }}
