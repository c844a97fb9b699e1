-- dbt analysis: compiled (Jinja-resolved, lands in the compile
-- artifact) but NEVER run — ad-hoc SQL kept under version control.
SELECT o_orderpriority,
       sum(o_totalprice) AS open_value
FROM {{ source('tpch', 'orders') }}
WHERE o_orderstatus = 'O'
GROUP BY o_orderpriority
