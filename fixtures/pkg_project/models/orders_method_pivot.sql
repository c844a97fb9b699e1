{{ config(materialized='view') }}
-- Jinja for-loop over a LIST-VALUED var (the dbt-tutorial
-- payment-methods idiom): one conditional aggregate per item of
-- var('pivot_statuses'), comma-separated via the loop.last idiom. The
-- list lives in dbt_project.yml vars; --vars may override it.
SELECT o_orderpriority,
{% for s in var('pivot_statuses') %}  round(sum(CASE WHEN o_orderstatus = '{{ s }}' THEN o_totalprice ELSE 0 END), 2) AS amt_{{ s }}{{ "," if not loop.last }}
{% endfor %}
FROM {{ source('tpch', 'orders') }}
GROUP BY o_orderpriority
