"""LM-scored admission gating — the CCNet production shape (Wenzek et
al., LREC 2020) as a stream: a bigram LM trained on a TRUSTED reference
slice scores every incoming micro-batch, documents below the fluency
cutoff are QUARANTINED at admission (written to an append-only ledger
with their scores, for audit/reprocessing — never silently dropped), and
the survivors flow into the standard deduplicating corpus admission
(`dedup_admission._admit_batch`: same COW version ledger, same
`dedup_increment` semantics, optional drift maintainer).

The LM is FROZEN at bootstrap (trained once on the init corpus and
persisted as a parquet table) — scoring is then a pure per-document
function, so the gate is batching-invariant and the whole composition
keeps the admission path's replay contract: a replayed batch rewrites the
same corpus version and the same quarantine ledger directory with the
same bytes. Streaming ≡ batch is pinned in tests: the final corpus
equals a flat `dedup_corpus` re-run over init ∪ {docs scoring >= cutoff}.

At 100 TB: scoring a batch is one bigram explode + one join against the
LM (broadcast while the LM fits, shuffle on w1 otherwise — see
`operators/lm_score`), strictly cheaper than the dedup verification it
gates; quarantining BEFORE dedup means the expensive stages never see
documents the quality bar already rejects — the CCNet ordering.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.lm_score import lm_quality, train_bigram_lm
from .dedup_admission import _admit_batch, bootstrap_v0


def streaming_lm_dedup_admission(
    docs_stream: DataFrame,
    init_corpus: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    quarantine_dir: str,
    cutoff: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int | str = "auto",
    shingle_k: int = 2,
    threshold: float = 0.2,
    max_bucket: int | None = 64,
    drift_dir: str | None = None,
) -> None:
    """Run the document stream to completion (availableNow — static test
    input), maintaining the LM-gated deduplicated corpus under
    `target_dir`. Documents whose `avg_logp` (frozen-LM bigram score) is
    NULL (<2 tokens: no evidence) or < `cutoff` land in
    `quarantine_dir/b{batch_id}` as (id, n_bigrams, avg_logp) rows; the
    rest are admitted through `dedup_increment`."""
    bootstrap_v0(init_corpus, target_dir, text_col, id_col, num_hashes,
                 bands, shingle_k)
    lm_dir = os.path.join(target_dir, "lm")
    if not os.path.exists(os.path.join(lm_dir, "_SUCCESS")):
        train_bigram_lm(init_corpus, text_col, id_col) \
            .write.mode("overwrite").parquet(lm_dir)

    def _apply(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        lm = spark.read.parquet(lm_dir)
        scores = lm_quality(batch, lm, text_col, id_col)
        ok_ids = scores.filter(F.col("avg_logp") >= cutoff).select(id_col)
        scores.join(ok_ids, id_col, "left_anti") \
            .write.mode("overwrite").parquet(
                os.path.join(quarantine_dir, f"b{batch_id}"))
        admitted = batch.join(ok_ids, id_col, "left_semi")
        _admit_batch(admitted, batch_id, target_dir, text_col, id_col,
                     num_hashes, bands, shingle_k, threshold, max_bucket,
                     drift_dir)

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


def read_quarantine(spark, quarantine_dir: str) -> DataFrame:
    """The quarantine ledger: (id, n_bigrams, avg_logp) per rejected
    document, one immutable directory per batch."""
    import glob

    from .versions import _is_uri

    if not _is_uri(quarantine_dir) and \
            not glob.glob(os.path.join(quarantine_dir, "b*")):
        return spark.createDataFrame(
            [], "doc_id long, n_bigrams long, avg_logp double")
    return spark.read.parquet(os.path.join(quarantine_dir, "b*"))
