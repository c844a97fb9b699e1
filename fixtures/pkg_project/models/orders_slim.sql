{{ config(materialized='view') }}
-- dbt_utils.star: the column list is INTROSPECTED from the resolved
-- relation at build time (the engine's analog of dbt's compile-time
-- get_columns_in_relation) — SELECT-*-EXCEPT by name, no hand-kept list.
SELECT {{ dbt_utils.star(from=source('tpch', 'orders'), except=['o_custkey', 'o_totalprice']) }}
FROM {{ source('tpch', 'orders') }}
