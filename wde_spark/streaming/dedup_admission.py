"""Streaming corpus admission — a continuously-deduplicated document
corpus maintained from a document stream.

This is the ingest path of a training-data pipeline run as a stream: each
micro-batch of freshly-crawled documents is admitted against the current
corpus via `operators/incremental.dedup_increment` — exact dups dropped
(or dethroning their corpus twin on smaller id), near-dups clustered with
the corpus classes they touch, novel docs appended — and the corpus plus
its dedup state (fingerprint + LSH band tables) roll forward together as
copy-on-write versions, the same immutable-ledger idiom as
`streaming/cdc.py`.

Crash/replay contract: each batch reads version `v{batch_id}` and writes
`v{batch_id+1}` with deterministic content, so replaying a batch after a
crash REWRITES the same version with the same bytes (admission is not
algebraically idempotent — re-admitting admitted docs would collide with
their own ids — so the KLL-style read-the-previous-version discipline,
not blind latest-version reads, is what makes replay safe; see
`streaming/sketch_maintenance.streaming_quantile_maintain` for the same
reasoning).

At 100 TB: the per-batch work is `dedup_increment`'s contract — state
tables stream past broadcast batch keys, corpus text is read only for
verification candidates — plus one write of corpus/state deltas. (The
copy-on-write layout here rewrites full snapshots for test-scale clarity;
a production deployment would write the kept/revoked DELTAS per version
and compact, exactly like the table formats do.)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from ..operators.incremental import DedupState, dedup_increment
from .cdc import latest_version_dir


def _version_dir(target_dir: str, n: int) -> str:
    return os.path.join(target_dir, f"v{n}")


def read_corpus(spark, target_dir: str) -> DataFrame:
    """Current admitted corpus (latest version)."""
    return spark.read.parquet(
        os.path.join(latest_version_dir(target_dir), "corpus"))


def streaming_dedup_admission(
    docs_stream: DataFrame,
    init_corpus: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int | str = "auto",
    shingle_k: int = 2,
    threshold: float = 0.2,
    max_bucket: int | None = 64,
) -> None:
    """Run the document stream to completion (availableNow — static test
    input), maintaining the deduplicated corpus + state under
    `target_dir`. `init_corpus` must already be deduplicated with the
    same parameters (v0 bootstrap builds its state with one full scan)."""
    from ..operators.incremental import dedup_state

    os.makedirs(target_dir, exist_ok=True)
    v0 = _version_dir(target_dir, 0)
    # Bootstrap is idempotent-by-redo: a crash mid-bootstrap leaves v0
    # without all three _SUCCESS markers, and the next start rebuilds all
    # of v0 (deterministic inputs ⇒ identical bytes). Checking only
    # `os.path.exists(v0)` would treat a half-written v0 as done and every
    # subsequent batch would fail reading the missing fp/bands tables.
    complete = all(
        os.path.exists(os.path.join(v0, sub, "_SUCCESS"))
        for sub in ("corpus", "fp", "bands"))
    if not complete:
        init_corpus.write.mode("overwrite").parquet(
            os.path.join(v0, "corpus"))
        st = dedup_state(init_corpus, text_col, id_col, num_hashes, bands,
                         shingle_k)
        st.fingerprints.write.mode("overwrite").parquet(
            os.path.join(v0, "fp"))
        st.bands.write.mode("overwrite").parquet(os.path.join(v0, "bands"))

    def _apply(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        prev = _version_dir(target_dir, batch_id)
        corpus = spark.read.parquet(os.path.join(prev, "corpus"))
        state = DedupState(
            fingerprints=spark.read.parquet(os.path.join(prev, "fp")),
            bands=spark.read.parquet(os.path.join(prev, "bands")),
        )
        res = dedup_increment(corpus, batch, state, text_col, id_col,
                              num_hashes, bands, shingle_k, threshold,
                              max_bucket)
        out = _version_dir(target_dir, batch_id + 1)
        corpus.join(res.revoked, id_col, "left_anti") \
            .unionByName(res.kept) \
            .write.mode("overwrite").parquet(os.path.join(out, "corpus"))
        res.state.fingerprints.write.mode("overwrite").parquet(
            os.path.join(out, "fp"))
        res.state.bands.write.mode("overwrite").parquet(
            os.path.join(out, "bands"))

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
