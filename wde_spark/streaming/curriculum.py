"""Streaming-maintained curriculum schedule.

The one-shot form (`operators/sampling.curriculum_order`) stages a FIXED
corpus. At 100 TB the corpus is a feed: documents keep arriving, and the
schedule must refresh per ingest batch WITHOUT rescanning text. The
maintained state is a COW-versioned ledger (doc_id, bucket,
arrived_batch): the difficulty bucket is computed ONCE, at arrival, on
the stream (the only pass that ever touches the document bytes); every
schedule refresh afterwards is arithmetic on the tiny ledger — the
two-phase prefix-sum staging of `curriculum_order`, whose driver-side
footprint is the bucket DOMAIN (bounded by construction), never the
corpus.

Equivalence contract (pinned in `tests/test_streaming_curriculum.py`
and under the driver hash by `streaming_curriculum_documents`): because
the ledger after batch b holds exactly the docs that have arrived, with
the same buckets the one-shot form would compute, `read_curriculum`
after ANY batch is row-identical to one-shot `curriculum_order` over
the union of those batches — the schedule is always the one a full
rebuild would produce, at ledger-append cost.

Same COW version-directory layout as the other maintained families;
batch-aligned reads (v{batch_id} -> v{batch_id+1}) make each step a
pure function of (previous version, batch) and therefore idempotent
under foreachBatch's at-least-once replay.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cdc import latest_version_dir


def apply_curriculum_batch(batch: DataFrame, batch_id: int,
                           target_dir: str, id_col: str = "doc_id",
                           bucket_col: str = "bucket",
                           extra_cols: tuple = ()) -> None:
    """One maintenance step: append the arriving (id, bucket[, extra])
    rows to v{batch_id}'s ledger as v{batch_id + 1}. Missing
    v{batch_id} == first batch == empty ledger. `extra_cols` carries
    additional arrival-time columns (e.g. n_tok for maintained pacing)
    — still metadata-sized, never text."""
    spark = batch.sparkSession
    fresh = batch.select(
        F.col(id_col),
        F.col(bucket_col).cast("long").alias(bucket_col),
        *[F.col(c) for c in extra_cols],
        F.lit(batch_id).cast("int").alias("arrived_batch"),
    )
    prev = os.path.join(target_dir, f"v{batch_id}")
    if os.path.exists(os.path.join(prev, "_SUCCESS")):
        merged = spark.read.parquet(prev).unionByName(fresh)
    else:
        merged = fresh
    out = os.path.join(target_dir, f"v{batch_id + 1}")
    merged.write.mode("overwrite").parquet(out)


def streaming_curriculum_maintain(
    doc_stream: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    bucket_col: str = "bucket",
    extra_cols: tuple = (),
) -> None:
    """Run the (id, bucket[, extra]) stream to completion (availableNow
    — static test input), maintaining the schedule ledger under
    `target_dir` as COW versions. The caller computes the bucket (and
    any extra arrival-time columns, e.g. n_tok) ON the stream so
    document bytes are read exactly once, at arrival."""
    os.makedirs(target_dir, exist_ok=True)

    def _apply(batch: DataFrame, batch_id: int) -> None:
        apply_curriculum_batch(batch, batch_id, target_dir, id_col,
                               bucket_col, extra_cols)

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


def read_curriculum(spark, target_dir: str, n_stages: int = 3,
                    id_col: str = "doc_id", bucket_col: str = "bucket",
                    salt: str = "cur") -> DataFrame:
    """Materialize the CURRENT schedule from the latest ledger version:
    the exact `curriculum_order` staging (NTILE terciles over (bucket,
    id), salted in-stage shuffle, round-robin interleave) over the
    stored buckets — no document bytes touched. Columns: id, bucket,
    arrived_batch, stage, sched_pos."""
    from ..operators.sampling import curriculum_order

    ledger = spark.read.parquet(latest_version_dir(target_dir))
    return curriculum_order(ledger, F.col(bucket_col),
                            n_stages=n_stages, id_col=id_col, salt=salt)


def read_paced(spark, target_dir: str, quotas, n_stages: int = 3,
               id_col: str = "doc_id", bucket_col: str = "bucket",
               tok_col: str = "n_tok", salt: str = "cur") -> DataFrame:
    """Maintained PACING: the per-stage token-quota phase admission
    (`sampling.curriculum_pacing`) materialized from the ledger's
    arrival-time buckets and token counts — no document bytes touched,
    so a pacing refresh after every ingest batch is pure ledger
    arithmetic. Provenance (arrived_batch) rejoins by id so the output
    carries it alongside the schedule columns."""
    from ..operators.sampling import curriculum_pacing

    ledger = spark.read.parquet(latest_version_dir(target_dir))
    # provenance rides through the pacing pipeline as a passthrough
    # column (r12) — the old per-id rejoin shuffled the paced output and
    # the ledger a second time for a column every row already carried
    return curriculum_pacing(ledger, F.col(bucket_col),
                             F.col(tok_col), quotas,
                             n_stages=n_stages, id_col=id_col,
                             salt=salt, extra_cols=("arrived_batch",))
