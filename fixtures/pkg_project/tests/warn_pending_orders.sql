{{ config(severity='warn') }}
-- warn-severity singular test: pending orders exist by construction,
-- so this DELIBERATELY reports violations — warn severity means the
-- run records them without failing the build (dbt semantics).
SELECT o_orderkey
FROM {{ source('tpch', 'orders') }}
WHERE o_orderstatus = 'P'
