{{ config(materialized='view') }}
-- Unpinned ref to a versioned family: dbt's latest_version default —
-- DagRunner.resolveVersionRefs rewrites this edge to rev_daily.v2.
SELECT o_orderdate, rev, n_orders
FROM {{ ref('rev_daily') }}
