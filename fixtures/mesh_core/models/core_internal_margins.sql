{{ config(materialized='view', group='core') }}
-- access defaults to 'protected': visible inside mesh_core only. A
-- downstream project's ref('mesh_core', 'core_internal_margins') must
-- fail at load time.
SELECT o_orderkey, o_totalprice * 0.1 AS margin
FROM {{ ref('core_orders_enriched') }}
