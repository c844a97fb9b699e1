{{ config(materialized='view', access='public', group='core') }}
-- mesh_core's PUBLIC interface model: the stable contract downstream
-- projects are allowed to ref across the project boundary (dbt mesh).
SELECT o_orderkey,
       o_custkey,
       o_orderdate,
       o_totalprice,
       CASE WHEN o_totalprice >= 200000 THEN 'big' ELSE 'small' END AS size_class
FROM {{ source('tpch', 'orders') }}
