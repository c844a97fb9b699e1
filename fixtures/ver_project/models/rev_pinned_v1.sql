{{ config(materialized='view') }}
-- Version-PINNED ref (dbt: ref('rev_daily', v=1)): a consumer that has
-- not migrated to v2 keeps the old contract explicitly.
SELECT o_orderdate, rev
FROM {{ ref('rev_daily', v=1) }}
