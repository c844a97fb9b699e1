{{ config(materialized='view') }}
SELECT o_orderkey, o_orderstatus, o_totalprice
FROM {{ source('tpch', 'orders') }}
WHERE o_orderstatus = 'F'
