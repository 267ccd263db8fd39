"""Streaming data-quality monitor — per-micro-batch expectation metrics
from a document/record stream.

The streaming face of `operators/quality.py`: every micro-batch is scored
against the declared checks (one conditional aggregation + bounded joins,
see there) and the per-batch result rows are appended to a metrics ledger
— the table an ingest dashboard reads and an alerting rule queries
("violations > 0 in the last batch"). Unlike the snapshot sinks (CDC,
corpus admission), the ledger is APPEND-ONLY: each batch writes its own
immutable `b{batch_id}` directory, so replay after a crash rewrites the
same directory with the same deterministic content — idempotent without
any read-modify-write.

At 100 TB/day the monitor adds one aggregation pass per batch over data
the ingest is already reading — the checks ride the ingest scan's cache,
and the ledger grows by n_checks rows per batch, not per record.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.quality import Check, run_expectations


def read_metrics(spark, target_dir: str) -> DataFrame:
    """The full metrics ledger: (batch_id, check, violations, total, ok).
    A ledger with zero completed batches (empty stream, or a monitor that
    has not run yet) is a valid state and returns an empty table rather
    than a path-not-found analysis error. The glob empty-ledger probe is
    local-filesystem-only, so it runs only for plain paths; a scheme'd
    ledger (hdfs://, s3a://) falls through to the Spark read — the same
    URI split `versions._is_uri` applies everywhere else in the ledger
    stack."""
    import glob

    from .versions import _is_uri

    if not _is_uri(target_dir) and not glob.glob(os.path.join(target_dir, "b*")):
        return spark.createDataFrame(
            [], "batch_id long, check string, violations long, "
                "total long, ok boolean")
    return spark.read.parquet(os.path.join(target_dir, "b*"))


def streaming_quality_monitor(
    stream: DataFrame,
    checks: list[Check],
    target_dir: str,
    checkpoint_dir: str,
) -> None:
    """Run the stream to completion (availableNow — static test input),
    appending one metrics row per check per micro-batch under
    `target_dir`."""
    os.makedirs(target_dir, exist_ok=True)

    def _apply(batch: DataFrame, batch_id: int) -> None:
        out = os.path.join(target_dir, f"b{batch_id}")
        run_expectations(batch, checks) \
            .withColumn("batch_id", F.lit(batch_id).cast("long")) \
            .select("batch_id", "check", "violations", "total", "ok") \
            .write.mode("overwrite").parquet(out)

    q = (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        q.stop()
