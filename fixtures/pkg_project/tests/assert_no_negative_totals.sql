-- Singular test (dbt tests/ directory): result rows ARE the
-- violations. Passes on any sane corpus — order totals are positive.
SELECT o_orderkey, o_totalprice
FROM {{ source('tpch', 'orders') }}
WHERE o_totalprice < 0
