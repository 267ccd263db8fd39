"""Streaming sketch maintenance — a continuously-updated distinct-sketch
table from an event stream.

The batch form (`operators/sketches.py`) pre-aggregates per shard and
merges later. The streaming form closes the loop: each micro-batch's rows
become a batch-local sketch, MERGED into the stored sketch table via
`hll_union_agg` — so the table always answers "distinct users per group so
far" in milliseconds, while only ever holding a few KB per group.

Because the HLL merge algebra is exact (union of partial sketches == the
sketch of the union — pinned in `tests/test_sketches.py`), the maintained
table is NOT an approximation of the batch pipeline: it is bit-for-bit the
same sketch state the one-shot batch aggregation would produce, proven in
`tests/test_streaming_sketches.py`.

Same copy-on-write version-directory layout as `streaming/cdc.py`:
deterministic content + fixed version name per batch_id → idempotent under
foreachBatch's at-least-once replay.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cdc import latest_version_dir


def streaming_sketch_maintain(
    events_stream: DataFrame,
    group_cols: list[str],
    value_col: str,
    target_dir: str,
    checkpoint_dir: str,
    lg_k: int = 12,
) -> None:
    """Run the stream to completion (availableNow — static test input),
    maintaining one HLL sketch row per group under `target_dir`."""
    os.makedirs(target_dir, exist_ok=True)

    def _apply(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        fresh = batch.groupBy(*group_cols).agg(
            F.hll_sketch_agg(F.col(value_col), F.lit(lg_k))
            .alias("distinct_sketch"))
        try:
            cur = spark.read.parquet(latest_version_dir(target_dir))
            merged = (
                cur.unionByName(fresh)
                .groupBy(*group_cols)
                .agg(F.hll_union_agg("distinct_sketch")
                     .alias("distinct_sketch"))
            )
        except FileNotFoundError:
            merged = fresh
        out = os.path.join(target_dir, f"v{batch_id + 1}")
        merged.write.mode("overwrite").parquet(out)

    q = (
        events_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        q.stop()


def read_estimates(spark, target_dir: str, group_cols: list[str]) -> DataFrame:
    """Current distinct estimates from the maintained sketch table."""
    return spark.read.parquet(latest_version_dir(target_dir)).select(
        *group_cols,
        F.hll_sketch_estimate("distinct_sketch").alias("distinct_estimate"))


def streaming_quantile_maintain(
    events_stream: DataFrame,
    group_cols: list[str],
    value_col: str,
    target_dir: str,
    checkpoint_dir: str,
    k: int = 200,
) -> None:
    """KLL twin of `streaming_sketch_maintain`: a continuously-maintained
    quantile-sketch table (any percentile later, a few KB per group).

    One honesty caveat the HLL form does not have: KLL merge is exact in
    RANK GUARANTEE but not idempotent — re-merging the same batch inserts
    its items twice, (slightly) re-weighting the compactors. The
    copy-on-write version naming (same batch_id → same version dir,
    derived from the PREVIOUS version) is what makes replay safe here,
    not the algebra; `tests/test_streaming_sketches.py` covers the
    replay-by-rewrite path."""
    os.makedirs(target_dir, exist_ok=True)

    def _apply(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        fresh = batch.groupBy(*group_cols).agg(
            F.kll_sketch_agg_double(F.col(value_col).cast("double"),
                                    F.lit(k)).alias("quantile_sketch"))
        prev = os.path.join(target_dir, f"v{batch_id}")
        if os.path.exists(prev):
            cur = spark.read.parquet(prev)
            merged = (
                cur.unionByName(fresh)
                .groupBy(*group_cols)
                .agg(F.kll_merge_agg_double("quantile_sketch")
                     .alias("quantile_sketch"))
            )
        else:
            merged = fresh
        out = os.path.join(target_dir, f"v{batch_id + 1}")
        merged.write.mode("overwrite").parquet(out)

    q = (
        events_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        q.stop()


def read_quantiles(spark, target_dir: str, group_cols: list[str],
                   quantiles: list[float]) -> DataFrame:
    """Current quantile estimates from the maintained KLL table."""
    return spark.read.parquet(latest_version_dir(target_dir)).select(
        *group_cols,
        *[F.kll_sketch_get_quantile_double("quantile_sketch", F.lit(q))
          .alias(f"q{int(q * 100)}") for q in quantiles])
