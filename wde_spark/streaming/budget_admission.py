"""Streaming token-budget admission — per-source token budgets spent
as the corpus ARRIVES.

The one-shot form (`token_budget_mixture_documents`) admits each
source's docs in global salted-hash order until the budget is spent. At
100 TB the corpus is a feed and the budget question is operational:
"does THIS batch's doc still fit its source's remaining budget?" —
answered at ingest, first-come by batch, hash-ordered within a batch
(so admission inside a batch stays independent of partitioning).

Maintained state, COW-versioned per batch:
  * ledger  — admitted rows (id, source, n_tok, cum_tokens) where
    cum_tokens is the source's inclusive running total at admission;
  * spent   — per-source totals (sources x 1 rows of metadata), the
    only thing a batch needs besides its own rows: arriving docs are
    hash-ordered within (source, batch), offset by the stored spent,
    and kept while spent + running sum <= budget.

Equivalence contract (pinned in `tests/test_streaming_budget.py` and
under the driver hash by `streaming_token_budget_documents`): within a
batch, n_tok >= 0 makes the offset running sum monotone, so admission
is a PREFIX of the batch's hash order under the remaining budget; the
carried spent is the sum of previously ADMITTED tokens only (a rejected
doc never consumes budget — this is where the feed semantics differ
from the one-shot mixture's single global prefix, and why both forms
ship). The oracle replays the recursion unrolled per batch: batch 0's
prefix, its per-source spent, then batch 1's prefix offset by it.

Batch-aligned COW reads (v{batch_id} -> v{batch_id+1}) make each step a
pure function of (previous version, batch): idempotent under
foreachBatch's at-least-once replay.

At 100 TB: per batch, one window partitioned by source over the BATCH
(batch-sized partitions; split by hash sub-bucket first if a single
batch outgrows an executor), a broadcast join against the sources x 1
spent table, and one ledger append. The corpus is never rescanned.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .cdc import latest_version_dir


def _budget_col(budgets: dict, default: int):
    b = F.lit(default)
    for s, v in budgets.items():
        b = F.when(F.col("source") == s, F.lit(v)).otherwise(b)
    return b


def apply_budget_batch(batch: DataFrame, batch_id: int, target_dir: str,
                       budgets: dict, default_budget: int,
                       id_col: str = "doc_id",
                       salt: str = "wde@") -> None:
    """One admission step: hash-order the batch within each source,
    offset by the stored per-source spent totals, keep rows while the
    inclusive running total fits the budget, append as v{batch_id+1}."""
    spark = batch.sparkSession
    prev = os.path.join(target_dir, f"v{batch_id}")
    if os.path.exists(os.path.join(prev, "_SUCCESS")):
        ledger = spark.read.parquet(prev)
        spent = ledger.groupBy("source").agg(
            F.max("cum_tokens").alias("_spent"))
    else:
        ledger = None
        spent = None
    hx = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = (Window.partitionBy("source").orderBy("_hx", id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cand = batch.withColumn("_hx", hx)
    if spent is not None:
        cand = cand.join(F.broadcast(spent), "source", "left") \
            .withColumn("_spent", F.coalesce(F.col("_spent"), F.lit(0)))
    else:
        cand = cand.withColumn("_spent", F.lit(0))
    admitted = (
        cand.withColumn("cum_tokens",
                        (F.col("_spent") + F.sum("n_tok").over(w))
                        .cast("long"))
        .filter(F.col("cum_tokens")
                <= _budget_col(budgets, default_budget))
        .select(id_col, "source", F.col("n_tok").cast("long"),
                "cum_tokens",
                F.lit(batch_id).cast("int").alias("arrived_batch"))
    )
    merged = ledger.unionByName(admitted) if ledger is not None \
        else admitted
    out = os.path.join(target_dir, f"v{batch_id + 1}")
    merged.write.mode("overwrite").parquet(out)


def streaming_budget_maintain(
    doc_stream: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    budgets: dict,
    default_budget: int,
    id_col: str = "doc_id",
    salt: str = "wde@",
) -> None:
    """Run the (id, source, n_tok) stream to completion (availableNow —
    static test input), maintaining the admission ledger under
    `target_dir` as COW versions."""
    os.makedirs(target_dir, exist_ok=True)

    def _apply(batch: DataFrame, batch_id: int) -> None:
        apply_budget_batch(batch, batch_id, target_dir, budgets,
                           default_budget, id_col, salt)

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


def read_admitted(spark, target_dir: str) -> DataFrame:
    """The maintained admission ledger's latest version."""
    return spark.read.parquet(latest_version_dir(target_dir))
