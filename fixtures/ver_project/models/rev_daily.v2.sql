{{ config(materialized='view') }}
-- Version 2: a BREAKING revision of the family — fulfilled orders only
-- plus an added count column (the schema change is why dbt versions
-- models instead of editing them in place). An unpinned ref('rev_daily')
-- resolves HERE (latest_version); consumers still on v1 pin explicitly.
SELECT o_orderdate,
       round(sum(o_totalprice), 2) AS rev,
       count(*) AS n_orders
FROM {{ source('tpch', 'orders') }}
WHERE o_orderstatus = 'F'
GROUP BY o_orderdate
