{{ config(materialized='view') }}
-- dbt_utils.pivot over dbt_utils.get_column_values: the pivot axis is
-- QUERIED from the relation at build time (dbt's compile-time
-- run_query), ordered deterministically by the value itself.
SELECT o_orderstatus,
  {{ dbt_utils.pivot('o_orderpriority', dbt_utils.get_column_values(source('tpch', 'orders'), 'o_orderpriority', order_by='value'), prefix='n_') }}
FROM {{ source('tpch', 'orders') }}
GROUP BY o_orderstatus
