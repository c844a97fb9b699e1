# dbt PYTHON model (dbt 1.3): on this engine `session` is natively the
# SparkSession, so the model runs in-process — no Python runtime, no
# serialization boundary. Parsed by the graft.engine.PyModel structural
# frontend; anything outside the documented subset is a load-time error.
import pyspark.sql.functions as F  # tolerated scaffolding; nothing binds


def model(dbt, session):
    dbt.config(materialized="table")
    orders = dbt.source("tpch", "orders")
    orders.createOrReplaceTempView("py_orders")
    agg = session.sql("""
        SELECT o_orderstatus,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total_price
        FROM py_orders
        GROUP BY o_orderstatus
    """)
    return agg.filter("n_orders > 0").orderBy("o_orderstatus")
