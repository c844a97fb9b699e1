{{ config(materialized='view') }}
-- dbt_utils.generate_surrogate_key: md5 over '-'-joined stringified
-- columns with the dbt_utils null sentinel — the portable surrogate-key
-- idiom (deterministic across engines, unlike sequences).
SELECT {{ dbt_utils.generate_surrogate_key(['o_orderkey', 'o_orderstatus']) }} AS order_sk,
       o_orderkey,
       o_orderstatus
FROM {{ source('tpch', 'orders') }}
