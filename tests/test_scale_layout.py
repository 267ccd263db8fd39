"""Scale-layout evidence: partitioned sinks prune at the source, and the
approximate aggregates (the 100 TB path where exact percentile/distinct
state would not fit) stay within their error bounds vs the exact answers.

These are the layout/aggregation choices a 100 TB deployment leans on:
- `partitionBy` on a low-cardinality column → queries filtering on it read
  only matching directories (PartitionFilters, not just PushedFilters).
- `approx_count_distinct` (HyperLogLog++) and `approx_percentile`
  (t-digest-style) are mergeable sketches: map-side partials, O(1) state
  per group vs O(n) for exact — the only viable form when a group's
  distinct set or value list exceeds executor memory.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_CORRECT

from wde_spark.core.catalog import load_table


def test_partitioned_sink_prunes_partitions(spark, tmp_path):
    docs = load_table(spark, SF_CORRECT, "documents")
    out = str(tmp_path / "docs_by_lang")
    docs.write.partitionBy("lang").mode("overwrite").parquet(out)

    back = spark.read.parquet(out).filter(F.col("lang") == "fr")
    plan = back._jdf.queryExecution().toString()
    scan = next(ln for ln in plan.splitlines() if "FileScan parquet" in ln)
    assert "PartitionFilters" in scan and "lang" in scan.split(
        "PartitionFilters", 1)[1].split("]", 1)[0]

    # the pruned read returns exactly the fr rows, nothing else
    n_fr = back.count()
    n_all = spark.read.parquet(out).count()
    exact = docs.filter(F.col("lang") == "fr").count()
    assert n_fr == exact and n_all > n_fr


def test_approx_count_distinct_within_bound(spark):
    o = load_table(spark, SF_CORRECT, "orders")
    rows = (
        o.groupBy("o_orderpriority")
        .agg(
            F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx"),
            F.countDistinct("o_custkey").alias("exact"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r.approx - r.exact) / r.exact < 0.06, r


def test_approx_percentile_within_bound(spark):
    o = load_table(spark, SF_CORRECT, "orders")
    row = o.agg(
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("approx"),
        F.expr("percentile(o_totalprice, 0.5)").alias("exact"),
    ).first()
    assert abs(row.approx - row.exact) / row.exact < 0.01
