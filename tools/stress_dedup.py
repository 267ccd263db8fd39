"""Dedup-pipeline stress: multiply the documents table M× (exact clones
with fresh ids — the realistic hazard: clone-heavy corpora turn near-dup
candidate generation quadratic per duplicate class) and run the tiered
pipeline the way it is meant to compose at scale:

  tier 1 exact dedup (collapse clone cliques to one representative)
  → tiers 3+4 LSH-banded near-dup on the survivors
  → connected components → dedup classes

Without tier 1 first, M clones of every document create M(M-1)/2 candidate
pairs each; with it, the near-dup stage sees each distinct text once —
the composition, not any single tier, is what survives 100 TB.

Usage: python tools/stress_dedup.py [multiply] [sf_dir]
Prints one JSON line with row counts and wall times per stage.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from wde_spark.core.catalog import load_table
    from wde_spark.core.session import get_session
    from wde_spark.operators import dedup as D
    from wde_spark.operators import graph as G

    spark = get_session("stress_dedup")
    base = load_table(spark, sf_dir, "documents")
    n_base = base.count()

    copies = spark.range(mult).select(F.col("id").alias("copy"))
    docs = (
        base.crossJoin(copies)
        .select(
            (F.col("doc_id") * mult + F.col("copy")).alias("doc_id"),
            "text",
        )
        .repartition(spark.sparkContext.defaultParallelism)
    )
    n_docs = docs.count()

    t0 = time.time()
    reps = D.exact_dedup(docs)  # (fp, keep_id, dup_count)
    survivors = (
        docs.join(
            reps.select(F.col("keep_id").alias("doc_id")), "doc_id", "left_semi"
        )
    )
    n_surv = survivors.count()
    t1 = time.time()

    pairs = D.neardup_lsh_verified(survivors).select("id_a", "id_b")
    n_pairs = pairs.count()
    t2 = time.time()

    comps = G.connected_components(pairs)
    n_nodes = comps.count()
    n_classes = comps.select("component").distinct().count()
    t3 = time.time()

    print(json.dumps({
        "multiply": mult,
        "docs_in": n_docs,
        "exact_survivors": n_surv,
        "neardup_pairs": n_pairs,
        "clustered_nodes": n_nodes,
        "dedup_classes": n_classes,
        "t_exact_s": round(t1 - t0, 2),
        "t_neardup_s": round(t2 - t1, 2),
        "t_components_s": round(t3 - t2, 2),
        "docs_per_s": round(n_docs / (t3 - t0), 1),
        "base_docs": n_base,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
