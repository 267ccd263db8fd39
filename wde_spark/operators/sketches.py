"""Mergeable sketch columns — the pre-aggregate/merge-later pattern that
makes incremental statistics possible at 100 TB.

A full-corpus `COUNT(DISTINCT x)` re-reads everything on every refresh. The
scale pattern is instead:

  1. per shard/partition/day, aggregate a SKETCH column once
     (`distinct_sketches`) and store it — a few KB per group;
  2. any later question (new day arrives, groups recombine, a global
     number is wanted) is answered by MERGING stored sketches
     (`merge_sketches`, `rollup_sketches`) — no base-data rescan, ever.

Spark's `hll_sketch_agg` / `hll_union_agg` (Apache DataSketches HLL under
the hood) provide the algebra: sketch(A ∪ B) == union(sketch(A),
sketch(B)) — `tests/test_sketches.py` pins exactly that equality, plus the
estimate-accuracy band.

The one-shot gates (`hll_distinct_gate`, `quantile_sketch_gate` in the
registry) prove the ESTIMATORS against exact answers; this module is the
storage/merge layer that makes them incremental. Sketch columns are opaque
binary — engine-specific by design, so nothing here carries a DuckDB
oracle (the registry gates carry the cross-engine evidence).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def distinct_sketches(df: DataFrame, group_cols: list[str], value_col: str,
                      lg_k: int = 12) -> DataFrame:
    """One HLL sketch per group over `value_col` — the shard-level
    pre-aggregate to persist. lg_k=12 ≈ 1.6% relative standard error at
    ~2 KB per sketch; raise it for tighter bands."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("distinct_sketch"))


def merge_sketches(sketches: DataFrame, group_cols: list[str],
                   sketch_col: str = "distinct_sketch") -> DataFrame:
    """Merge stored sketches down to `group_cols` (e.g. day-level shards →
    one sketch per tenant) and estimate. Input rows are a few KB each, so
    this runs in seconds over arbitrarily large base data."""
    merged = sketches.groupBy(*group_cols).agg(
        F.hll_union_agg(F.col(sketch_col)).alias("merged_sketch"))
    return merged.select(
        *group_cols,
        F.hll_sketch_estimate("merged_sketch").alias("distinct_estimate"))


def global_estimate(sketches: DataFrame,
                    sketch_col: str = "distinct_sketch") -> Column:
    """Single global distinct estimate from a sketch table (scalar
    DataFrame: one row, one BIGINT column)."""
    return (
        sketches.agg(F.hll_union_agg(F.col(sketch_col)).alias("s"))
        .select(F.hll_sketch_estimate("s").alias("distinct_estimate"))
    )
