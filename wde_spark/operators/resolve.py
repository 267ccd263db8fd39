"""Query-relaxation resolution — the reference's "query planner"
(SURVEY.md §2.8; script/itemtoid.py:187-304).

The reference retries each lookup serially: full query, then an ordered
ladder of relaxed queries, stopping at the first hit. That is a per-row
control loop — the single worst fit for a distributed engine.

The Spark-native formulation (SURVEY §2.8's "single biggest architectural
win"): the ladder is a *bounded, data-independent list of candidate strings
per row*, so

    1. generate all candidates as an array column (rank = ladder position),
    2. posexplode,
    3. ONE equi-join of all candidates against the lookup table,
    4. keep the best-ranked hit per row with a row_number window.

Two shuffles total for the whole corpus, instead of |corpus| × |ladder|
sequential probes. For live-API mode, `iterative_resolve` preserves the
reference's early-exit economy: resolve rank-0 candidates for everyone,
anti-join the hits, try rank-1 for the misses, ... — each wave is one batch
join, and no row issues a candidate later than its first hit.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def resolve_ladder(
    rows: DataFrame,
    candidates_col: Column,
    lookup: DataFrame,
    row_key: str,
    lookup_key: str = "qstr",
) -> DataFrame:
    """Resolve each row to the first candidate (by ladder rank) that has a
    match in `lookup`. Returns one row per input row that matched:
    (row_key, rank, candidate, + lookup columns)."""
    cand = rows.select(
        F.col(row_key),
        F.posexplode(candidates_col).alias("rank", "candidate"),
    ).filter(F.col("candidate").isNotNull() & (F.col("candidate") != ""))
    hits = cand.join(
        lookup.withColumnRenamed(lookup_key, "candidate"), "candidate"
    )
    w = Window.partitionBy(row_key).orderBy("rank")
    return (
        hits.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def iterative_resolve(
    rows: DataFrame,
    candidates_col: Column,
    probe: Callable[[DataFrame], DataFrame],
    row_key: str,
    max_rank: int,
) -> DataFrame:
    """Live-mode ladder: wave r probes only rows unresolved after wave r-1.
    `probe` maps a DataFrame with a `candidate` column to the subset that
    hit (same column + result columns) — e.g. an HTTP mapPartitions batch.
    Preserves the reference's early-exit API economy while still batching
    every wave."""
    cand = rows.select(
        F.col(row_key), F.posexplode(candidates_col).alias("rank", "candidate")
    )
    resolved = None
    for r in range(max_rank):
        wave = cand.filter(F.col("rank") == r)
        if resolved is not None:
            wave = wave.join(resolved.select(row_key), row_key, "left_anti")
        hits = probe(wave)
        resolved = hits if resolved is None else resolved.unionByName(hits)
    return resolved


def certitude(matched_params: Column, has_date: Column) -> Column:
    """Q3 — the reference's confidence rule (script/itemtoid.py:54-113):
    certain iff >=4 query parameters matched or a date matched."""
    return (matched_params >= 4) | has_date
