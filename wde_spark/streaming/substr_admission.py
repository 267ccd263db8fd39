"""Streaming exact-substring dedup maintainer — ExactSubstr
(`operators/dedup.substr_increment`) run as the ingest path: each
micro-batch of new documents gets its duplicated spans computed against
corpus-so-far ∪ batch using only the window-count STATE (never prior
corpus text), the merged state rolls forward as copy-on-write versions,
and the batch's spans land in an append-only per-batch ledger — the live
"what boilerplate did today's crawl re-import?" feed a training-data
pipeline tails, instead of re-running the corpus-wide job.

Version/replay discipline is `dedup_admission`'s: batch b reads state
version v{b} and writes v{b+1} plus spans ledger `b{b}`, every output a
pure function of two immutable inputs (the COW state snapshot and the
batch), so a crash-replayed batch rewrites the same bytes. Spans of
PRIOR documents are immutable by `substr_increment`'s declared
asymmetry — history is never edited, which is exactly what makes the
ledger append-only.

At 100 TB: per-batch work is one batch-text window explode + one state
join restricted to the batch's hash set + the state merge (state is
corpus-STATE-sized — distinct windows — and partitioned by hash); the
full-snapshot state rewrite here is the test-scale COW simplification,
production writes count deltas and compacts, as `dedup_admission`
documents for its tables."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

from ..operators.dedup import substr_increment, substr_state


def _version_dir(target_dir: str, n: int) -> str:
    return os.path.join(target_dir, f"v{n}")


def bootstrap_substr_v0(init_corpus: DataFrame, target_dir: str,
                        k: int = 16, text_col: str = "text",
                        id_col: str = "doc_id") -> None:
    """One full scan of the initial corpus → v0 window-count state."""
    substr_state(init_corpus, k, text_col, id_col) \
        .write.mode("overwrite") \
        .parquet(os.path.join(_version_dir(target_dir, 0), "state"))


def streaming_substr_maintain(docs_stream: DataFrame,
                              init_corpus: DataFrame, target_dir: str,
                              checkpoint_dir: str, k: int = 16,
                              min_count: int = 2, text_col: str = "text",
                              id_col: str = "doc_id") -> None:
    """Run the document stream to completion (availableNow — static test
    input), maintaining state versions and the per-batch spans ledger
    under `target_dir`."""
    bootstrap_substr_v0(init_corpus, target_dir, k, text_col, id_col)

    def _apply(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        state = spark.read.parquet(
            os.path.join(_version_dir(target_dir, batch_id), "state"))
        spans, new_state = substr_increment(
            state, batch, k, min_count, text_col, id_col)
        new_state.write.mode("overwrite").parquet(
            os.path.join(_version_dir(target_dir, batch_id + 1), "state"))
        spans.select(
            F.lit(batch_id).cast("long").alias("batch_id"),
            id_col, "span_start", "span_end", "n_windows",
        ).write.mode("overwrite").parquet(
            os.path.join(target_dir, "spans", f"b{batch_id}"))

    q = (
        docs_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        q.stop()


def read_spans(spark, target_dir: str) -> DataFrame:
    """The whole spans ledger (all batches)."""
    return spark.read.parquet(os.path.join(target_dir, "spans", "b*"))


def read_state(spark, target_dir: str, version: int) -> DataFrame:
    """Time-travel read of a state version."""
    return spark.read.parquet(
        os.path.join(_version_dir(target_dir, version), "state"))
