"""Exact-substring span dedup stress — the scale shape that matters for
`dedup.duplicate_spans` at 100 TB is that work stays LINEAR in corpus
size: windows explode ~n_tokens rows/doc, duplicate detection is one
hash aggregation on the window hash (never a self-join), and the island
merge shuffles once on the doc id. A boilerplate window shared by every
document must cost one counter, not a pair product.

This driver multiplies the sf documents table M× with fresh ids —
clone-heavy input is the worst case for PAIR-based dedup (clone cliques
are quadratic) and therefore exactly the case where the aggregation
shape must stay flat — and measures `duplicate_spans` +
`strip_duplicate_spans` wall time and output sizes at two corpus sizes,
so the receipt shows time growing ~M-fold, not M²-fold.

Usage: python tools/stress_substr.py [mult1] [mult2] [sf_dir]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _clone(spark, base, mult):
    copies = spark.range(mult).select(F.col("id").alias("copy"))
    return (
        base.crossJoin(copies)
        .select((F.col("doc_id") * mult + F.col("copy")).alias("doc_id"),
                "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )


def main() -> None:
    m1 = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    m2 = int(sys.argv[2]) if len(sys.argv) > 2 else 160
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    from wde_spark.core.catalog import load_table
    from wde_spark.core.session import get_session
    from wde_spark.operators import dedup as D

    spark = get_session("stress_substr")
    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    out = {"sf_dir": sf_dir, "points": []}
    for mult in (m1, m2):
        docs = _clone(spark, base, mult).cache()
        n_docs = docs.count()
        t0 = time.time()
        spans = D.duplicate_spans(docs, k=16)
        n_spans = spans.count()
        t_spans = round(time.time() - t0, 2)
        t0 = time.time()
        stripped = D.strip_duplicate_spans(docs, k=16)
        agg = stripped.agg(
            F.sum("n_tokens").alias("tok"),
            F.sum("n_kept").alias("kept")).collect()[0]
        t_strip = round(time.time() - t0, 2)
        docs.unpersist()
        out["points"].append({
            "mult": mult, "n_docs": n_docs, "n_spans": n_spans,
            "tokens": int(agg.tok), "kept": int(agg.kept),
            "removed_frac": round(1 - agg.kept / agg.tok, 4),
            "t_spans_s": t_spans, "t_strip_s": t_strip,
        })
    p1, p2 = out["points"]
    ratio = p2["n_docs"] / max(p1["n_docs"], 1)
    out["size_ratio"] = round(ratio, 2)
    out["t_spans_ratio"] = round(p2["t_spans_s"] / max(p1["t_spans_s"], 1e-9), 2)
    out["t_strip_ratio"] = round(p2["t_strip_s"] / max(p1["t_strip_s"], 1e-9), 2)
    out["linear_ok"] = (out["t_spans_ratio"] < 2 * ratio
                        and out["t_strip_ratio"] < 2 * ratio)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
