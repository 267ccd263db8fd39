"""Warehouse layout proofs: bucketed co-located joins eliminate the join
exchange; partitioned writes turn predicates into PartitionFilters.

These are plan-shape tests (the point of the feature IS the plan), plus a
value check that the shuffle-free join returns the same rows as the
shuffled one.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wde_spark.sources import warehouse as W

SF = "/root/testdata/sf0.001"


def _executed_plan(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def no_broadcast(spark):
    """Force sort-merge joins so the test proves bucketing (not broadcast)
    removed the exchanges."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, tmp_path, no_broadcast):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    customer = spark.read.parquet(f"{SF}/customer.parquet")

    W.write_bucketed(orders, "wh_orders", ["o_custkey"], 8,
                     path=str(tmp_path / "orders"))
    W.write_bucketed(customer, "wh_customer", ["c_custkey"], 8,
                     path=str(tmp_path / "customer"))
    try:
        bo, bc = W.read_table(spark, "wh_orders"), W.read_table(spark, "wh_customer")
        joined = bo.join(bc, bo.o_custkey == bc.c_custkey) \
            .select("o_orderkey", "c_name")
        plan = _executed_plan(joined)
        assert "Exchange" not in plan, \
            f"bucketed co-located join must not shuffle:\n{plan}"

        # the plain path-based join DOES shuffle — proves the assertion bites
        plain = orders.join(customer,
                            orders.o_custkey == customer.c_custkey) \
            .select("o_orderkey", "c_name")
        assert "Exchange" in _executed_plan(plain)

        # and values are identical either way
        assert sorted(map(tuple, joined.collect())) == \
            sorted(map(tuple, plain.collect()))
    finally:
        spark.sql("DROP TABLE IF EXISTS wh_orders")
        spark.sql("DROP TABLE IF EXISTS wh_customer")


def test_bucketed_groupby_has_no_exchange(spark, tmp_path):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    W.write_bucketed(orders, "wh_orders_g", ["o_custkey"], 8,
                     path=str(tmp_path / "orders_g"))
    try:
        agg = W.read_table(spark, "wh_orders_g").groupBy("o_custkey") \
            .agg(F.sum("o_totalprice").alias("spend"))
        plan = _executed_plan(agg)
        assert "Exchange" not in plan, \
            f"groupBy on the bucket key must reuse the bucketing:\n{plan}"
    finally:
        spark.sql("DROP TABLE IF EXISTS wh_orders_g")


def test_partitioned_write_prunes(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    W.write_partitioned(docs, str(tmp_path / "docs_by_lang"), ["lang"])

    back = spark.read.parquet(str(tmp_path / "docs_by_lang"))
    one = back.filter(F.col("lang") == "en").select("doc_id")
    plan = _executed_plan(one)
    assert "PartitionFilters: [isnotnull(lang" in plan, \
        f"lang predicate must prune partitions, not filter rows:\n{plan}"
    # row-level correctness: pruned read == plain filtered read
    assert one.count() == docs.filter(F.col("lang") == "en").count()
