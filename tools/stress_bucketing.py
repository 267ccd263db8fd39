"""Bucketed-join stress: quantify what `sources/warehouse.write_bucketed`
buys on a recurring equi-join.

Writes the (multiplied) orders/customer tables twice — plain parquet and
bucketed-by-join-key catalog tables — then times the same join+agg against
both layouts and reports shuffle volume from the Spark listener. The write
cost is charged once; the join saving recurs per query, which is the whole
warehouse bargain.

Usage: python tools/stress_bucketing.py [multiply] [sf_dir] [buckets]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _run_join(spark, orders, customer):
    t0 = time.time()
    sm = spark.sparkContext.statusTracker()
    res = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.sum("o_totalprice").alias("seg_revenue"),
             F.count("*").alias("n"))
    )
    rows = res.collect()
    return time.time() - t0, len(rows)


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    buckets = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    from wde_spark.core.session import get_session
    from wde_spark.sources import warehouse as W

    spark = get_session("stress_bucketing")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    copies = spark.range(mult).select(F.col("id").alias("copy"))
    big_orders = (
        orders.crossJoin(copies)
        .select((F.col("o_orderkey") * mult + F.col("copy"))
                .alias("o_orderkey"), "o_custkey", "o_totalprice")
    )
    n_orders = big_orders.count()

    work = tempfile.mkdtemp(prefix="wh_stress_")
    try:
        t0 = time.time()
        big_orders.write.parquet(f"{work}/orders_plain")
        customer.write.parquet(f"{work}/customer_plain")
        t_write_plain = time.time() - t0

        t0 = time.time()
        W.write_bucketed(big_orders, "st_orders", ["o_custkey"], buckets,
                         path=f"{work}/orders_bkt")
        W.write_bucketed(customer, "st_customer", ["c_custkey"], buckets,
                         path=f"{work}/customer_bkt")
        t_write_bucketed = time.time() - t0

        po = spark.read.parquet(f"{work}/orders_plain")
        pc = spark.read.parquet(f"{work}/customer_plain")
        bo = W.read_table(spark, "st_orders")
        bc = W.read_table(spark, "st_customer")

        # warm both paths once, then measure min-of-2
        plain = min(_run_join(spark, po, pc)[0] for _ in range(3))
        bucketed = min(_run_join(spark, bo, bc)[0] for _ in range(3))

        joined = bo.join(bc, bo.o_custkey == bc.c_custkey) \
            .groupBy("c_mktsegment").agg(F.count("*"))
        joined.collect()
        # AQE's toString prints Final AND Initial plans — count only the
        # final one (the join must contribute zero; the groupBy's own
        # re-key exchange legitimately remains)
        plan = joined._jdf.queryExecution().executedPlan().toString() \
            .split("== Initial Plan ==")[0]
        print(json.dumps({
            "multiply": mult, "orders_rows": n_orders, "buckets": buckets,
            "t_join_plain_s": round(plain, 2),
            "t_join_bucketed_s": round(bucketed, 2),
            "t_write_plain_s": round(t_write_plain, 2),
            "t_write_bucketed_s": round(t_write_bucketed, 2),
            "bucketed_join_exchanges": plan.count("Exchange hashpartitioning"),
        }))
    finally:
        spark.sql("DROP TABLE IF EXISTS st_orders")
        spark.sql("DROP TABLE IF EXISTS st_customer")
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
