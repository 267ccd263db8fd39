"""Streaming PQ-index maintenance — a continuously-growing compressed
ANN index over an embedding stream.

The embeddings twin of `streaming/dedup_admission.py`: new vectors are
ENCODED on arrival against a FROZEN codebook (the production pattern —
quantizers are retrained offline on a schedule, never per batch, so codes
stay mutually comparable) and appended to the stored codes table as
copy-on-write versions. Queries run ADC-only against the maintained codes
(`operators/similarity.pq_adc_topk`) — they never touch float vectors, so
the float column can be cold storage.

Replay contract: encoding with a frozen codebook is deterministic and
row-local, and each batch reads version `v{batch_id}` and writes
`v{batch_id+1}`, so a crash replay rewrites the same version with the
same bytes (the same discipline as `streaming/dedup_admission.py`).

Index size arithmetic at scale: 1024-dim float32 = 4 KB/vector; PQ-64
codes = 64 B/vector — a 10-billion-vector index is ~640 GB of codes, a
table one rack scans in seconds, vs 40 TB of floats.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame

from ..operators.similarity import pq_adc_topk, pq_encode, train_pq_codebooks
from .cdc import latest_version_dir


def _codebook_path(target_dir: str) -> str:
    return os.path.join(target_dir, "codebooks.json")


def read_codebooks(target_dir: str) -> list[list[list[float]]]:
    with open(_codebook_path(target_dir)) as f:
        return json.load(f)


def read_codes(spark, target_dir: str) -> DataFrame:
    """Current PQ codes table (latest version)."""
    return spark.read.parquet(
        os.path.join(latest_version_dir(target_dir), "codes"))


def ann_query(spark, target_dir: str, queries: DataFrame, k: int = 5,
              id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """ADC top-k against the maintained index — codes only, no vectors."""
    return pq_adc_topk(read_codes(spark, target_dir), queries,
                       read_codebooks(target_dir), k, id_col, vec_col)


def read_codes_merged(spark, target_dir: str,
                      id_col: str = "vec_id") -> DataFrame:
    """Current PQ codes out of the DELTA ledger (merge-on-read; a plain
    base scan once compacted)."""
    from .compaction import read_merged

    return read_merged(spark, os.path.join(target_dir, "codes"),
                       [id_col])


def ann_query_merged(spark, target_dir: str, queries: DataFrame,
                     k: int = 5, id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """ADC top-k against the delta-ledger index — same scoring as
    `ann_query`, codes via merge-on-read."""
    return pq_adc_topk(read_codes_merged(spark, target_dir, id_col),
                       queries, read_codebooks(target_dir), k, id_col,
                       vec_col)


def streaming_pq_index_maintain_delta(
    vec_stream: DataFrame,
    init_items: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    m: int = 8,
    k_codes: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    auto_compact: int | None = None,
) -> None:
    """DELTA-LEDGER twin of `streaming_pq_index_maintain` — the
    remaining corpus-sized COW family moved to the table-format write
    path (`streaming/compaction.py`). The codes table is APPEND-ONLY
    (vectors admitted under a frozen codebook are never revoked), so a
    micro-batch is the idiom's best case: encode the batch and append
    it as ledger delta `d{batch_id+1}` — NO ledger read at all, so
    per-batch cost is independent of index size, where the COW form
    rewrites the whole codes table (10-billion-vector index = ~640 GB
    rewritten per batch). Queries merge-on-read (a plain base scan once
    compacted); encoding determinism gives the same replay contract as
    the COW twin, and the same batch-invariance the ADC oracle
    replays. `auto_compact` (an entry budget) runs `maybe_compact`
    after each append — the in-stream OPTIMIZE with the deferred-vacuum
    cadence, safe inside an uncommitted foreachBatch (see
    `streaming_codebook_maintain_delta`)."""
    from .compaction import (ledger_entries, maybe_compact, write_base,
                             write_delta)

    os.makedirs(target_dir, exist_ok=True)
    ledger = os.path.join(target_dir, "codes")
    # bootstrap idempotent-by-redo, same discipline as the COW twin;
    # "any ledger entry" is the completed test (compaction may fold b0)
    complete = (os.path.exists(_codebook_path(target_dir))
                and bool(ledger_entries(ledger)))
    if not complete:
        books = train_pq_codebooks(init_items, m, k_codes, iters, id_col,
                                   vec_col)
        with open(_codebook_path(target_dir), "w") as f:
            json.dump(books, f)
        write_base(pq_encode(init_items, books, id_col, vec_col),
                   ledger, 0, stats_col=id_col)

    books = read_codebooks(target_dir)

    def _apply(batch: DataFrame, batch_id: int) -> None:
        write_delta(pq_encode(batch, books, id_col, vec_col), ledger,
                    batch_id + 1, stats_col=id_col, key_cols=[id_col])
        if auto_compact is not None:
            maybe_compact(batch.sparkSession, ledger, [id_col],
                          max_entries=auto_compact)

    q = (
        vec_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        q.stop()


def streaming_pq_index_maintain(
    vec_stream: DataFrame,
    init_items: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    m: int = 8,
    k_codes: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Run the vector stream to completion (availableNow — static test
    input), maintaining the PQ codes table under `target_dir`. Bootstrap
    trains the codebook tensor on `init_items` once (deterministic
    per-sub-space k-means) and encodes them as v0; every micro-batch is
    encoded with that frozen codebook and appended."""
    os.makedirs(target_dir, exist_ok=True)
    v0 = os.path.join(target_dir, "v0", "codes")
    # Bootstrap is idempotent-by-redo: complete iff BOTH the codebook file
    # and v0's _SUCCESS marker exist; a crash between the two (or mid
    # parquet write) triggers a full redo, which is deterministic
    # (md5-seeded k-means) so replay rewrites identical bytes. Checking
    # only the v0 directory would let a partial bootstrap poison every
    # subsequent batch.
    complete = (os.path.exists(_codebook_path(target_dir))
                and os.path.exists(os.path.join(v0, "_SUCCESS")))
    if not complete:
        books = train_pq_codebooks(init_items, m, k_codes, iters, id_col,
                                   vec_col)
        with open(_codebook_path(target_dir), "w") as f:
            json.dump(books, f)
        pq_encode(init_items, books, id_col, vec_col) \
            .write.mode("overwrite").parquet(v0)

    books = read_codebooks(target_dir)

    def _apply(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        prev = os.path.join(target_dir, f"v{batch_id}", "codes")
        cur = spark.read.parquet(prev)
        out = os.path.join(target_dir, f"v{batch_id + 1}", "codes")
        cur.unionByName(pq_encode(batch, books, id_col, vec_col)) \
            .write.mode("overwrite").parquet(out)

    q = (
        vec_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        q.stop()
