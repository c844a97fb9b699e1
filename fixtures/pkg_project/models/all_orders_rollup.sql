{{ config(materialized='view') }}
-- dbt_utils.union_relations: UNION ALL over same-layout relations with
-- the _dbt_source_relation provenance column the package adds; the
-- ref() calls inside the expansion contribute real DAG edges.
SELECT _dbt_source_relation,
       o_orderstatus,
       count(*) AS n,
       round(sum(o_totalprice), 2) AS total
FROM (
  {{ dbt_utils.union_relations([ref('stg_orders_fulfilled'), ref('stg_orders_open')]) }}
) u
GROUP BY _dbt_source_relation, o_orderstatus
