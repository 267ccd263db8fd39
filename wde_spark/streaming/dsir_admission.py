"""DSIR-gated admission — importance-ratio gating at ingest, the
streaming form of DSIR data selection (Xie et al., NeurIPS 2023; see
`operators/dsir.py`): two bigram LMs are FROZEN at bootstrap — the
TARGET model on a trusted reference slice, the RAW model on the init
corpus — and every incoming micro-batch is scored by the per-document
log importance ratio ln p_target − ln p_raw. Documents whose ratio is
NULL (<2 tokens: no evidence) or below the cutoff are QUARANTINED to an
append-only ledger WITH their scores (audit/reprocessing, never a silent
drop); survivors flow into the standard deduplicating admission
(`dedup_admission._admit_batch` — same COW version ledger, same
`dedup_increment` semantics).

The batch query form (`queries_ext.dsir_sample_documents`) does Gumbel
TOP-K — a global budget, which does not compose over unbounded streams;
the streaming form gates on the RATIO THRESHOLD instead (keep what is at
least `cutoff` nats more target-like than raw), which is per-document
and therefore batching-invariant: the whole composition keeps the
admission path's replay contract (a replayed batch rewrites the same
corpus version and quarantine directory with the same bytes), and
streaming ≡ batch is pinnable — the final corpus equals a flat dedup
over init ∪ {docs with ratio >= cutoff}.

At 100 TB: scoring is one bigram explode + four broadcast LM joins per
batch (`dsir_logratio`), strictly cheaper than the dedup verification it
gates — rejecting off-distribution crawl before the expensive stages see
it, the same ordering argument as the CCNet gate (`lm_admission.py`)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dsir import dsir_logratio, shared_vocab
from ..operators.lm_score import train_bigram_lm
from .dedup_admission import _admit_batch, bootstrap_v0


def streaming_dsir_dedup_admission(
    docs_stream: DataFrame,
    init_corpus: DataFrame,
    target_slice: DataFrame,
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
    input), maintaining the DSIR-gated deduplicated corpus under
    `target_dir`. `target_slice` is the trusted reference distribution
    (what you want MORE of); `init_corpus` doubles as the raw model's
    training set. Rejected docs land in `quarantine_dir/b{batch_id}` as
    (id, n_bigrams, log_ratio) rows."""
    bootstrap_v0(init_corpus, target_dir, text_col, id_col, num_hashes,
                 bands, shingle_k)
    t_dir = os.path.join(target_dir, "lm_target")
    r_dir = os.path.join(target_dir, "lm_raw")
    v_dir = os.path.join(target_dir, "lm_vocab")
    if not os.path.exists(os.path.join(v_dir, "_SUCCESS")):
        # SHARED vocabulary (see dsir.shared_vocab): both frozen models
        # smooth over the same event space, so the ratio measures
        # distribution preference, not model-size bias
        shared_vocab(target_slice, init_corpus, text_col, id_col) \
            .write.mode("overwrite").parquet(v_dir)
    vocab0 = target_slice.sparkSession.read.parquet(v_dir)
    for lm_dir, corpus in ((t_dir, target_slice), (r_dir, init_corpus)):
        if not os.path.exists(os.path.join(lm_dir, "_SUCCESS")):
            train_bigram_lm(corpus, text_col, id_col, vocab=vocab0) \
                .write.mode("overwrite").parquet(lm_dir)

    def _apply(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        t_lm = spark.read.parquet(t_dir)
        r_lm = spark.read.parquet(r_dir)
        vocab = spark.read.parquet(v_dir)
        ratios = dsir_logratio(batch, t_lm, r_lm, text_col, id_col,
                               vocab=vocab)
        ok_ids = ratios.filter(F.col("log_ratio") >= cutoff).select(id_col)
        ratios.join(ok_ids, id_col, "left_anti") \
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
    """The quarantine ledger: (id, n_bigrams, log_ratio) per rejected
    document, one immutable directory per batch."""
    import glob

    from .versions import _is_uri

    if not _is_uri(quarantine_dir) and \
            not glob.glob(os.path.join(quarantine_dir, "b*")):
        return spark.createDataFrame(
            [], "doc_id long, n_bigrams long, log_ratio double")
    return spark.read.parquet(os.path.join(quarantine_dir, "b*"))
