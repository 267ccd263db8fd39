"""Hot-bucket cap stress: quantify what `dedup_corpus`'s default
`max_bucket=64` buys the composed curation pipeline (the r6 verdict's
finding #2 — the pipeline used to opt out with max_bucket=None).

Builds the sf corpus PLUS an injected boilerplate family: `n_boiler`
documents sharing a long common body but each carrying a unique tail
token, so the EXACT tier cannot collapse them (distinct fingerprints)
and every one of them lands in the same LSH band buckets — the
O(B²)-pairs shape one boilerplate template produces at ingest scale.
Times the LSH candidate stage capped vs uncapped and counts candidate
pairs; the capped run must stay flat in the family size while the
uncapped run grows quadratically.

Usage: python tools/stress_pipeline_cap.py [n_boiler] [sf_dir]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_boiler = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    from pyspark.sql import functions as F

    from wde_spark.core.catalog import load_table
    from wde_spark.core.session import get_session
    from wde_spark.operators.dedup import exact_dedup, minhash_lsh_pairs

    spark = get_session("stress_pipeline_cap")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    body = " ".join(f"boiler{i}" for i in range(40))
    boiler = spark.range(n_boiler).select(
        (F.col("id") + 10_000_000).alias("doc_id"),
        F.concat(F.lit(body + " tail"), F.col("id").cast("string"))
        .alias("text"),
    )
    corpus = docs.unionByName(boiler)

    # pipeline tier 1 (exact) keeps every boilerplate doc — distinct tails
    reps = exact_dedup(corpus)
    survivors = corpus.join(
        reps.select(F.col("keep_id").alias("doc_id")), "doc_id",
        "left_semi").localCheckpoint()
    n_surv = survivors.count()

    out: dict = {"n_docs": n_surv, "n_boiler": n_boiler, "sf_dir": sf_dir}
    for tag, cap in (("capped", 64), ("uncapped", None)):
        t0 = time.time()
        n_pairs = minhash_lsh_pairs(
            survivors, num_hashes=16, bands=4, shingle_k=2,
            max_bucket=cap).count()
        out[f"candidates_{tag}"] = n_pairs
        out[f"wall_{tag}_s"] = round(time.time() - t0, 2)
    out["pair_ratio_uncapped_over_capped"] = round(
        out["candidates_uncapped"] / max(1, out["candidates_capped"]), 1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
