"""Streaming-maintained HRW shard map with migration ledger.

The one-shot form (`operators/layout.rendezvous_shard`) assigns docs
under a FIXED shard map. At 100 TB the map itself is a feed: shards are
added as volume grows, and the question that matters operationally is
"which docs must move, and where" — answered incrementally, never by a
corpus reshuffle.

Maintained formulation: the routing table (doc_id, shard, arrived_batch,
n_moves) is COW-versioned state; the map grows by ONE shard per
micro-batch (size = base + batch_id + 1 when batch b lands). Each batch:

  1. MIGRATE the existing table to the new map size — re-evaluate the
     HRW argmax; changed rows bump n_moves. By the HRW minimal-movement
     guarantee every changed row moves TO the new shard, and an expected
     1/new_size fraction moves at all;
  2. ASSIGN the arriving docs under the new size and append them.

Equivalence contract (pinned in `tests/test_streaming_shards.py` and
under the driver hash by `streaming_shard_migration_documents`): because
migration re-evaluates the same pure argmax the one-shot form computes,
the maintained table after the final batch is row-identical on `shard`
to one-shot `rendezvous_shard` at the final size — and `n_moves` counts
exactly the growth steps (after the doc's arrival) where consecutive
map sizes disagree, which a SQL oracle replays per doc.

Same COW version-directory layout as the other admission families:
deterministic content + fixed version name per batch_id → idempotent
under foreachBatch's at-least-once replay.

At 100 TB: the state is one row per doc (the routing table IS the
product), each growth step rewrites only rows + a per-row argmax — no
data shuffle, no all-pairs anything; the per-step moved set
(n ~ corpus/new_size) is exactly the minimal data movement a migration
executor must perform.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.layout import rendezvous_shard
from .cdc import latest_version_dir

BASE_SHARDS_DEFAULT = 6
MAX_SHARDS = 64  # HRW plan-size limit: rendezvous_shard unrolls one
# hash expression per candidate shard, so the map is capped at 64.


def apply_shard_batch(
    batch: DataFrame,
    batch_id: int,
    target_dir: str,
    id_col: str = "doc_id",
    base_shards: int = BASE_SHARDS_DEFAULT,
    salt: str = "hrw",
) -> None:
    """One maintenance step: migrate v{batch_id} to the grown map and
    append the arriving docs as v{batch_id + 1}.

    Reads the batch-aligned previous version, NOT latest: under
    foreachBatch at-least-once replay, batch b can re-run after v{b+1}
    was already written — latest would then double-count batch b's own
    rows (and overwrite the path being read). Missing v{batch_id} ==
    first batch == empty prior table, matching the
    embedding_admission/sketch_maintenance pattern, so a replayed step
    is a pure function of (v{batch_id}, batch) and idempotent."""
    spark = batch.sparkSession
    n_new = base_shards + batch_id + 1
    if n_new > MAX_SHARDS:
        raise ValueError(
            f"shard map would grow to {n_new} > {MAX_SHARDS} shards "
            f"(base {base_shards} + batch {batch_id}); the HRW argmax "
            f"is plan-unrolled and capped at {MAX_SHARDS} — restart "
            f"the maintainer with a larger batch granularity"
        )
    fresh = batch.select(
        F.col(id_col),
        rendezvous_shard(id_col, n_new, salt).alias("shard"),
        F.lit(batch_id).cast("int").alias("arrived_batch"),
        F.lit(0).cast("int").alias("n_moves"),
    )
    prev = os.path.join(target_dir, f"v{batch_id}")
    if os.path.exists(os.path.join(prev, "_SUCCESS")):
        cur = spark.read.parquet(prev)
        resh = rendezvous_shard(id_col, n_new, salt)
        migrated = cur.select(
            id_col,
            resh.alias("shard"),
            "arrived_batch",
            (F.col("n_moves")
             + (resh != F.col("shard")).cast("int")).alias("n_moves"),
        )
        merged = migrated.unionByName(fresh)
    else:
        merged = fresh
    out = os.path.join(target_dir, f"v{batch_id + 1}")
    merged.write.mode("overwrite").parquet(out)


def streaming_shard_maintain(
    doc_stream: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    base_shards: int = BASE_SHARDS_DEFAULT,
    salt: str = "hrw",
) -> None:
    """Run the doc stream to completion (availableNow — static test
    input), maintaining the routing table under `target_dir` as COW
    versions; the map size when batch b lands is base_shards + b + 1."""
    os.makedirs(target_dir, exist_ok=True)

    def _apply(batch: DataFrame, batch_id: int) -> None:
        apply_shard_batch(batch, batch_id, target_dir, id_col,
                          base_shards, salt)

    q = (
        doc_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        q.stop()


def read_routing(spark, target_dir: str) -> DataFrame:
    """The maintained routing table's latest version."""
    return spark.read.parquet(latest_version_dir(target_dir))
