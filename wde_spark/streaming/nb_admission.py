"""Classifier-gated admission with a per-batch prediction ledger — the
GPT-3 production shape (Brown et al. 2020, Appendix A: a linear
classifier trained on a trusted corpus scores every crawled document;
only documents predicted in-domain are kept): a naive-Bayes model
(`operators/classifier`) is FROZEN at bootstrap on a labeled trusted
slice, every incoming micro-batch is argmax-classified, predictions for
ALL batch documents are appended to an immutable per-batch PREDICTION
LEDGER (audit/threshold-retuning without re-scoring), documents whose
predicted label is outside the keep-set are QUARANTINED, and the
survivors flow into the standard deduplicating corpus admission
(`dedup_admission._admit_batch`: same COW version ledger, same
`dedup_increment` semantics).

Because the model is frozen, classification is a pure per-document
function — the gate is batching-invariant, so the composition keeps the
admission path's replay contract, and streaming ≡ batch is pinnable: the
final corpus equals a flat `dedup_corpus` re-run over
init ∪ {batch docs predicted in keep_labels}.

At 100 TB: scoring a batch is one token explode + one equi-join against
a vocabulary-sized model (broadcast while it fits) + one O(n·L) grid —
strictly cheaper than the dedup verification it gates, and quarantining
BEFORE dedup means the expensive stages never see documents the
classifier already rejects. The ledger is append-only one-directory-per-
batch, the same audit discipline as the LM/DSIR quarantine ledgers.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.classifier import nb_classify, train_naive_bayes
from .dedup_admission import _admit_batch, bootstrap_v0


def streaming_nb_dedup_admission(
    docs_stream: DataFrame,
    init_corpus: DataFrame,
    train_docs: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    quarantine_dir: str,
    keep_labels: list[str],
    label_col: str = "lang",
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
    input), maintaining the classifier-gated deduplicated corpus under
    `target_dir`. `train_docs` is the labeled trusted slice the NB model
    freezes on (persisted as two parquet tables under `target_dir`, the
    same frozen-model-state discipline as the LM/DSIR gates). Every
    batch document's prediction lands in
    `target_dir/predictions/b{batch_id}` as (id, pred_label, score,
    margin); documents predicted OUTSIDE `keep_labels` additionally land
    in `quarantine_dir/b{batch_id}`; the rest are admitted through
    `dedup_increment`."""
    bootstrap_v0(init_corpus, target_dir, text_col, id_col, num_hashes,
                 bands, shingle_k)
    m_dir = os.path.join(target_dir, "nb_model")
    p_dir = os.path.join(target_dir, "nb_priors")
    if not os.path.exists(os.path.join(p_dir, "_SUCCESS")):
        model, priors = train_naive_bayes(train_docs, label_col, text_col,
                                          id_col)
        model.write.mode("overwrite").parquet(m_dir)
        priors.write.mode("overwrite").parquet(p_dir)
    ledger_dir = os.path.join(target_dir, "predictions")

    def _apply(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        model = spark.read.parquet(m_dir)
        priors = spark.read.parquet(p_dir)
        preds = nb_classify(batch, model, priors, text_col, id_col)
        preds.write.mode("overwrite").parquet(
            os.path.join(ledger_dir, f"b{batch_id}"))
        ok_ids = preds.filter(F.col("pred_label").isin(keep_labels)) \
            .select(id_col)
        preds.join(ok_ids, id_col, "left_anti") \
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


def read_predictions(spark, target_dir: str) -> DataFrame:
    """The prediction ledger: (id, pred_label, score, margin) per scored
    document, one immutable directory per batch."""
    import glob

    from .versions import _is_uri

    ledger_dir = os.path.join(target_dir, "predictions")
    if not _is_uri(ledger_dir) and \
            not glob.glob(os.path.join(ledger_dir, "b*")):
        return spark.createDataFrame(
            [], "doc_id long, pred_label string, score double, "
                "margin double")
    return spark.read.parquet(os.path.join(ledger_dir, "b*"))
