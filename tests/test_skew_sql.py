"""Salted-join equivalence + the spark.sql surface over registered views."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_SMOKE


def test_salted_join_equals_plain_join(spark):
    from wde_spark.core.catalog import load_table
    from wde_spark.operators.skew import salted_join

    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_quantity")
    # manufacture heavy skew: collapse most keys onto one hot key
    skewed = li.withColumn(
        "l_orderkey",
        F.when(F.col("l_orderkey") % 10 != 0, F.lit(1)).otherwise(
            F.col("l_orderkey")))
    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_totalprice").withColumnRenamed(
        "o_orderkey", "l_orderkey")

    plain = (
        skewed.join(orders, "l_orderkey")
        .groupBy("l_orderkey")
        .agg(F.count("*").alias("n"),
             F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"))
    )
    salted = (
        salted_join(skewed, orders, "l_orderkey", n_salts=8)
        .groupBy("l_orderkey")
        .agg(F.count("*").alias("n"),
             F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"))
    )
    a = {r.l_orderkey: (r.n, r.q) for r in plain.collect()}
    b = {r.l_orderkey: (r.n, r.q) for r in salted.collect()}
    assert a == b and len(a) > 0


def test_sql_surface_over_registered_views(spark):
    """Every operator family is reachable from spark.sql over the catalog's
    temp views (the engine's second query surface)."""
    from wde_spark.core.catalog import register_views

    register_views(spark, SF_SMOKE, ["orders", "customer", "lineitem"])
    got = spark.sql("""
        WITH seg AS (
          SELECT c_mktsegment, count(*) AS n_cust
          FROM customer GROUP BY c_mktsegment
        ),
        top_orders AS (
          SELECT c_mktsegment, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                    ORDER BY o_totalprice DESC) AS rnk
          FROM orders JOIN customer ON o_custkey = c_custkey
        )
        SELECT s.c_mktsegment, s.n_cust, t.o_totalprice AS top_price
        FROM seg s JOIN top_orders t
          ON s.c_mktsegment = t.c_mktsegment AND t.rnk = 1
        ORDER BY s.c_mktsegment
    """).collect()
    assert len(got) == 5
    assert all(r.top_price is not None and r.n_cust > 0 for r in got)

    from wde_spark.functions.strings import SPARK_SQL_EXPRS

    expr = SPARK_SQL_EXPRS["norm_compare"].format("'  Hé! lLo,  World  '")
    r = spark.sql(f"SELECT {expr} AS v").collect()[0].v
    assert r == "hé llo world"
