{{ config(materialized='view') }}
-- env_var() with the dbt default-argument form: the region tag defaults
-- when the variable is absent (the CI-toggle idiom); a missing variable
-- WITHOUT a default is dbt's compilation error (pinned in SqlModelSpec).
SELECT '{{ env_var("GRAFT_PKG_REGION", "eu") }}' AS region,
       count(*) AS n
FROM {{ source('tpch', 'orders') }}
