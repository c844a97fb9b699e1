{% macro orders_by_status() %}SELECT o_orderstatus, count(*) AS n FROM {{ source('tpch','orders') }} GROUP BY 1{% endmacro %}
