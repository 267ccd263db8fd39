"""Mergeable-sketch proofs: the property that makes stored sketch columns
trustworthy is the MERGE ALGEBRA — union of shard sketches must equal the
sketch of the union (no accuracy lost to sharding), and estimates must sit
inside the advertised error band against exact distincts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from wde_spark.operators import sketches as SK

SF = "/root/testdata/sf0.001"


def test_sharded_merge_equals_whole(spark):
    """Estimate from merged per-shard sketches == estimate from one global
    sketch — sharding must cost nothing (same underlying HLL state)."""
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    sharded = orders.withColumn("shard", F.col("o_orderkey") % 7)

    per_shard = SK.distinct_sketches(sharded, ["shard"], "o_custkey")
    merged_est = SK.global_estimate(per_shard).collect()[0][0]

    whole = SK.distinct_sketches(orders.withColumn("one", F.lit(1)),
                                 ["one"], "o_custkey")
    whole_est = whole.select(
        F.hll_sketch_estimate("distinct_sketch")).collect()[0][0]

    assert merged_est == whole_est


def test_estimates_within_error_band(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    exact = orders.select("o_custkey").distinct().count()
    sk = SK.distinct_sketches(orders.withColumn("one", F.lit(1)),
                              ["one"], "o_custkey")
    est = sk.select(F.hll_sketch_estimate("distinct_sketch")).collect()[0][0]
    # lg_k=12 → rse ~1.6%; allow 3 sigma
    assert abs(est - exact) <= max(3, 0.05 * exact), (est, exact)


def test_grouped_merge_rollup(spark):
    """Day-shard sketches roll up to status level without touching base
    data; estimates track exact grouped distincts."""
    orders = spark.read.parquet(f"{SF}/orders.parquet") \
        .withColumn("day", F.dayofmonth("o_orderdate"))
    shards = SK.distinct_sketches(orders, ["o_orderstatus", "day"],
                                  "o_custkey")
    rolled = {r["o_orderstatus"]: r["distinct_estimate"]
              for r in SK.merge_sketches(shards, ["o_orderstatus"]).collect()}
    exact = {r["o_orderstatus"]: r["n"]
             for r in orders.groupBy("o_orderstatus")
             .agg(F.count_distinct("o_custkey").alias("n")).collect()}
    assert set(rolled) == set(exact)
    for k in exact:
        assert abs(rolled[k] - exact[k]) <= max(3, 0.05 * exact[k]), \
            (k, rolled[k], exact[k])


def test_kll_quantile_merge(spark):
    """Quantiles read from merged per-shard KLL sketches must track exact
    interpolated quantiles of the full column within the sketch's rank
    error (k=200 → ~1.65% rank error → compare by rank, not value)."""
    orders = spark.read.parquet(f"{SF}/orders.parquet") \
        .withColumn("shard", F.col("o_orderkey") % 5)
    shards = SK.quantile_sketches(orders, ["shard"], "o_totalprice")
    got = SK.merge_quantiles(
        shards.withColumn("one", F.lit(1)), ["one"], [0.5, 0.99]
    ).collect()[0]

    vals = sorted(r[0] for r in orders.select("o_totalprice").collect())
    n = len(vals)

    def rank_of(v):
        import bisect
        return bisect.bisect_left(vals, v) / n

    assert abs(rank_of(got["q50"]) - 0.5) < 0.04
    assert abs(rank_of(got["q99"]) - 0.99) < 0.04


def test_theta_overlap_algebra(spark):
    """|A ∩ B| from stored theta sketches must track the exact overlap —
    the set-algebra capability HLL lacks."""
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    seg = orders.select(
        "o_custkey",
        F.when(F.col("o_orderstatus") == "F", "done")
        .otherwise("open").alias("seg"))
    sk = SK.audience_sketches(seg, ["seg"], "o_custkey")
    row = SK.audience_overlap(sk, "seg", "done", "open").collect()[0]

    a = {r[0] for r in seg.filter("seg = 'done'")
         .select("o_custkey").distinct().collect()}
    b = {r[0] for r in seg.filter("seg = 'open'")
         .select("o_custkey").distinct().collect()}
    for got, exact in [(row["n_a"], len(a)), (row["n_b"], len(b)),
                       (row["n_union"], len(a | b)),
                       (row["n_intersection"], len(a & b))]:
        assert abs(got - exact) <= max(3, 0.06 * exact), (got, exact)


def test_cms_counters_merge_and_one_sided_error(spark):
    """Count-min: (1) counter tables merge by addition — counters(A ∪ B)
    equals the groupBy-sum merge of counters(A) and counters(B); (2) the
    estimate NEVER undercounts any value (one-sided error)."""
    from pyspark.sql import functions as F

    from wde_spark.operators import sketches as SK

    a = spark.createDataFrame(
        [(f"v{i % 23}",) for i in range(600)], "w string")
    b = spark.createDataFrame(
        [(f"v{(i * 7) % 31}",) for i in range(400)], "w string")
    full = SK.cms_counters(a.unionAll(b), "w")
    merged = (
        SK.cms_counters(a, "w").unionAll(SK.cms_counters(b, "w"))
        .groupBy("seed", "bucket").agg(F.sum("c").alias("c"))
    )
    assert full.exceptAll(merged).unionAll(merged.exceptAll(full)) \
        .count() == 0

    exact = a.unionAll(b).groupBy("w").agg(F.count("*").alias("n"))
    est = SK.cms_estimate(exact, full, "w")
    bad = est.filter(F.col("n_cms") < F.col("n")).count()
    assert bad == 0 and est.count() == 31
