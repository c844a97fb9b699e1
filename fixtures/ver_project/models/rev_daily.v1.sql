{{ config(materialized='view') }}
-- Version 1 of the rev_daily family (dbt 1.5 model versions): the
-- engine's canonical node name for a versioned model is `<base>.v<N>`,
-- carried here in the file basename. v1 aggregates ALL orders.
SELECT o_orderdate,
       round(sum(o_totalprice), 2) AS rev
FROM {{ source('tpch', 'orders') }}
GROUP BY o_orderdate
