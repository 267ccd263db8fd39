"""Incremental-dedup stress: measure the admit-a-batch path against the
full re-run it replaces, at a corpus/batch ratio that mimics production
(big cleaned corpus, small daily increment).

Setup: corpus = documents-table row count multiplied M×, each row an
md5-derived 40-word synthetic text (genuinely distinct, so the corpus
stays M× large after cleaning), then cleaned once with `dedup_corpus`. Batch = a fresh 1/R slice whose docs are a mix
of exact clones of corpus docs, near-dups, and novel texts. We time:

  a) dedup_increment(corpus, batch, state)  — the incremental path
     (state tables pre-materialized, as a production pipeline would
     persist them in parquet)
  b) dedup_corpus(corpus ∪ batch)           — the full re-run

and report wall times + the admit decision counts. The headline claim
this tool substantiates: increment cost scales with BATCH size (plus one
streaming pass over state tables ~1000× smaller than text), so the
speedup over re-running grows linearly with the corpus/batch ratio.

Usage: python tools/stress_incremental.py [multiply] [batch_div] [sf_dir]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    batch_div = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    from wde_spark.core.catalog import load_table
    from wde_spark.core.session import get_session
    from wde_spark.operators import dedup as D
    from wde_spark.operators import incremental as I

    spark = get_session("stress_incremental")
    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_base = base.count()

    copies = spark.range(mult).select(F.col("id").alias("copy"))

    # Synthetic distinct text: 40 md5-derived words seeded by (key, tag) —
    # variants share NO shingles, so the corpus stays mult× large after
    # cleaning. (A suffix-perturbed corpus collapses right back to base
    # size: suffix twins are near-dups, which defeats the purpose of a
    # big-corpus measurement.)
    def salad(key, tag, words=40):
        return F.concat_ws(" ", *[
            F.substring(F.md5(F.concat(key.cast("string"),
                                       F.lit(f"|{tag}|{i}"))), 1, 8)
            for i in range(words)])

    # repartition BEFORE the salad projection: the crossJoin's broadcast-
    # nested-loop output is a single partition, and Spark evaluates
    # projections before the exchange — without the early repartition all
    # mult*n_base*40 md5 word derivations run in ONE task (observed: the
    # 10M-doc corpus build pinned one core for >10 min while 31 idled).
    corpus_raw = (
        base.crossJoin(copies)
        .repartition(spark.sparkContext.defaultParallelism)
        .select(
            (F.col("doc_id") * (mult + 1) + F.col("copy")).alias("doc_id"),
            salad(F.col("doc_id") * (mult + 1) + F.col("copy"), "c")
            .alias("text"),
        )
    )
    # localCheckpoint truncates lineage/plan — the production analogue of
    # reading the cleaned corpus back from parquet. Without it every
    # downstream join's LOGICAL plan embeds the whole dedup pipeline and
    # driver-side analysis, not execution, dominates the measurement.
    corpus = D.dedup_corpus(corpus_raw).localCheckpoint()
    n_corpus = corpus.count()

    # Batch: 1/batch_div of base — one third exact clones of corpus texts,
    # one third near-dups (perturbed tail token), one third novel. Batch
    # ids start past the maximum possible corpus id (ids must be globally
    # unique). Novel text is md5-derived word salad — genuinely unrelated
    # to every corpus doc, not a suffix-perturbed twin.
    bmax = (base.agg(F.max("doc_id")).first()[0] + 1) * (mult + 1)
    b = base.filter(F.col("doc_id") % batch_div == 0)
    corpus_twin = F.col("doc_id") * (mult + 1)   # that base doc's copy-0 id
    batch = (
        b.select(
            (F.col("doc_id") * 3 + bmax).alias("doc_id"),
            F.when(F.col("doc_id") % 3 == 0,
                   salad(corpus_twin, "c"))                            # exact dup
            .when(F.col("doc_id") % 3 == 1,
                  F.concat_ws(" ", salad(corpus_twin, "c"),
                              F.lit("tail drift token")))              # near-dup
            .otherwise(salad(F.col("doc_id"), "fresh"))                # novel
            .alias("text"),
        )
        .localCheckpoint()
    )
    n_batch = batch.count()

    # state pre-built (production persists it; building it is a one-time
    # bootstrap cost, charged separately below)
    t0 = time.time()
    st = I.dedup_state(corpus)
    state = I.DedupState(
        fingerprints=st.fingerprints.localCheckpoint(),
        bands=st.bands.localCheckpoint(),
    )
    state.fingerprints.count(), state.bands.count()
    t_state = time.time() - t0

    t0 = time.time()
    res = I.dedup_increment(corpus, batch, state)
    n_kept, n_revoked = res.kept.count(), res.revoked.count()
    t_inc = time.time() - t0

    t0 = time.time()
    full = D.dedup_corpus(corpus.unionByName(batch))
    n_full = full.count()
    t_full = time.time() - t0

    print(json.dumps({
        "multiply": mult,
        "corpus_docs": n_corpus,
        "batch_docs": n_batch,
        "batch_kept": n_kept,
        "corpus_revoked": n_revoked,
        "full_rerun_kept": n_full,
        "consistent": n_full == n_corpus - n_revoked + n_kept,
        "t_state_bootstrap_s": round(t_state, 2),
        "t_increment_s": round(t_inc, 2),
        "t_full_rerun_s": round(t_full, 2),
        "speedup": round(t_full / t_inc, 1),
        "base_docs": n_base,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
