"""Generic relational operators — SURVEY.md §2.2-§2.6.

Thin, idiomatic compositions of DataFrame primitives. Nothing here fights
Catalyst: joins stay equi-joins (broadcast hints only where one side is a
known dimension), windows declare explicit partition/order columns so
results are deterministic under any parallelism, and aggregations are plain
hash aggregates with map-side partials.

Scale notes (100 TB):
- `top_k_per_group` / `last_write_wins` use row_number over a hash-
  partitioned window — one shuffle on the group key; skew handled by AQE.
- `carry_forward` (reference W1, the "le même" semantics,
  script/utils/itemtoid_prep.py:57-62) is last(ignorenulls) over an
  unbounded-preceding frame; requires explicit ordering columns, which is
  exactly why the catalog threads (partition, position) columns through.
- `anti_resume` (reference P1, script/itemtoid.py:348-353) replaces the
  append-only done-log with a left_anti join; at scale prefer the done-set
  small enough to broadcast, else it is a shuffled anti join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """W2 generalized — top-k rows per group by explicit ordering."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def last_write_wins(
    df: DataFrame, key_cols: Sequence[str], order_col: Column
) -> DataFrame:
    """J1 — dedup keeping the row with the greatest `order_col` per key
    (the reference's dict-overwrite semantics, script/wd2tei.py:22-31)."""
    w = Window.partitionBy(*key_cols).orderBy(order_col.desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def carry_forward(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_col: str,
    value_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """W1 — propagate the last non-null value down each partition in order
    (the reference's "le même" previous-row reuse)."""
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn(
        out_col or value_col, F.last(value_col, ignorenulls=True).over(w)
    )


def anti_resume(df: DataFrame, done: DataFrame, key: str) -> DataFrame:
    """P1/SO2 — keep rows whose key is absent from the done-set."""
    return df.join(done.select(key).distinct(), key, "left_anti")


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int,
    session_col: str = "session_id",
) -> DataFrame:
    """Gaps-and-islands sessionization: a new session starts when the gap
    from the previous event of the same user exceeds `gap_seconds`.
    One shuffle on user_col; the cumulative sum stays within the same
    window partitioning so no second shuffle."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    us = F.unix_micros(F.col(ts_col))
    gap = us - F.lag(us).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_seconds * 1_000_000), 1).otherwise(0)
    return df.withColumn("__new", is_new).withColumn(
        session_col,
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).drop("__new")


def positional_join(
    df: DataFrame, arr_a: str, arr_b: str, key_cols: Sequence[str]
) -> DataFrame:
    """J4 — align two array columns element-by-element (the reference zips
    names with traits when counts match, script/utils/nametable.py:102-106).
    arrays_zip + posexplode: purely row-local, no shuffle."""
    zipped = F.arrays_zip(F.col(arr_a), F.col(arr_b))
    return df.select(*key_cols, F.posexplode(zipped).alias("pos", "pair")).select(
        *key_cols,
        F.col("pos").cast("long").alias("pos"),
        F.col(f"pair.{arr_a}").alias(arr_a),
        F.col(f"pair.{arr_b}").alias(arr_b),
    )
