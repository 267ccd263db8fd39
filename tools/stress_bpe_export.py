"""Tokenizing-exporter stress — the scale claims behind
`packed_bpe_sequences_documents` (BPE train → merge replay → exact counts
→ packed manifest) are (a) the Python/Arrow work runs on DISTINCT
pretokens, whose count grows SUBLINEARLY in corpus size (Heaps' law), and
(b) end-to-end wall scales ~linearly with the corpus, not with the
pretoken cross-product.

This driver synthesizes n Zipf-worded documents (unbounded vocabulary —
word w_r drawn with p(r) ∝ r^(-1/θ) via the inverse-power transform of a
per-position hash, so the distinct-word curve is a REAL Heaps curve, not
an artifact of a capped vocab), runs the exporter composition at the
query's own parameters (12 merges, 128-token windows), and records at
each size: corpus words, DISTINCT pretokens (the Arrow kernel's true
input), manifest rows, and wall seconds per stage.

Usage: python tools/stress_bpe_export.py [n1] [n2] (docs; default 1e6 4e6)
Prints one JSON line (the measurements/ receipt).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

WORDS_PER_DOC = 40
# R = floor(u^-THETA) gives word-frequency pmf ~ r^-(1+1/THETA); THETA=1
# makes the pmf exponent 2.0, so the distinct-word (Heaps) curve grows
# ~ sqrt(n) — the classic Heaps-law vocabulary growth rate. u carries 1e9
# hash resolution so the representable-rank set never saturates below the
# sizes measured here (a 1e6-resolution draw flatlines at ~104k ranks).
THETA = 1.0
NUM_MERGES = 12       # the query's _BPE_MERGES_K
SEQ_LEN = 128         # the query's _PACK_SEQ_LEN


def _zipf_docs(spark, n: int):
    """n docs of WORDS_PER_DOC Zipf-ranked words, generated row-locally
    (array transform over a sequence — no shuffle, no Python)."""
    u = lambda p: (
        (F.xxhash64(F.col("doc_id"), p, F.lit(7)) % 1_000_000_000
         + 1_000_000_000) % 1_000_000_000 + F.lit(1)) / F.lit(1_000_000_001.0)
    word = lambda p: F.concat(
        F.lit("w"), F.floor(F.pow(u(p), F.lit(-THETA))).cast("string"))
    return (
        spark.range(n).select(F.col("id").alias("doc_id"))
        .repartition(spark.sparkContext.defaultParallelism)
        .select(
            "doc_id",
            F.concat_ws(" ", F.transform(
                F.sequence(F.lit(0), F.lit(WORDS_PER_DOC - 1)), word))
            .alias("text"))
        .localCheckpoint()  # isolate generation cost from the exporter
    )


def _run(spark, n: int) -> dict:
    from wde_spark.operators import bpe as B
    from wde_spark.operators import layout as L

    docs = _zipf_docs(spark, n)
    distinct_pretokens = (
        docs.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("w"))
        .filter(F.col("w") != "").distinct().count())

    t0 = time.time()
    merges = B.learn_bpe_merges(docs, num_merges=NUM_MERGES)
    t_train = round(time.time() - t0, 2)

    t0 = time.time()
    counts = B.bpe_token_counts(docs.select("doc_id", "text"), merges)
    t = counts.select("doc_id", F.col("bpe_tokens").alias("n_tok"))
    packed = L.pack_stream(t, seq_len=SEQ_LEN)
    packed.write.format("noop").mode("overwrite").save()
    t_count_pack = round(time.time() - t0, 2)

    n_seq = packed.count()
    spark.catalog.clearCache()
    return {
        "n_docs": n,
        "n_words": n * WORDS_PER_DOC,
        "distinct_pretokens": distinct_pretokens,
        "n_merges": len(merges),
        "n_packed_sequences": n_seq,
        "wall_train_sec": t_train,
        "wall_count_pack_sec": t_count_pack,
        "wall_total_sec": round(t_train + t_count_pack, 2),
    }


def main() -> None:
    sizes = [int(float(a)) for a in sys.argv[1:]] or [1_000_000, 4_000_000]
    from wde_spark.core.session import get_session

    spark = get_session("stress_bpe_export")
    _run(spark, 10_000)  # warm-up: JIT + Arrow pool, not billed to point 1
    points = [_run(spark, n) for n in sizes]
    a, b = points[0], points[-1]
    growth = {
        "corpus_ratio": round(b["n_docs"] / a["n_docs"], 2),
        "pretoken_ratio": round(
            b["distinct_pretokens"] / max(a["distinct_pretokens"], 1), 3),
        "wall_ratio": round(
            b["wall_total_sec"] / max(a["wall_total_sec"], 0.01), 2),
    }
    print(json.dumps({
        "what": "packed_bpe_sequences exporter stress (Zipf corpus, "
                "unbounded vocab)",
        "params": {"words_per_doc": WORDS_PER_DOC, "theta": THETA,
                   "num_merges": NUM_MERGES, "seq_len": SEQ_LEN},
        "points": points,
        "growth": growth,
        "claim": "pretoken_ratio << corpus_ratio (Heaps) and wall_ratio "
                 "~ corpus_ratio (linear), i.e. the Arrow kernel's input "
                 "grows sublinearly while the pipeline stays scan-bound",
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
