{{ config(materialized='view') }}
-- Cross-project consumption: mesh_core's public interface model joined
-- to this project's own source. The two-arg ref is the dbt-mesh form;
-- a bare ref('core_orders_enriched') here is a load-time error.
SELECT c.c_mktsegment,
       o.size_class,
       count(*)                     AS n_orders,
       round(sum(o.o_totalprice), 2) AS total_price
FROM {{ ref('mesh_core', 'core_orders_enriched') }} o
JOIN {{ source('tpch', 'customer') }} c
  ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment, o.size_class
