"""Semantic near-dup scale stress: candidate-pair count of the banded
`embedding_neardup` vs corpus size — the measurement behind the r6 fix of
the r5 audit finding that the old single-table form (fixed 2^6 = 64
buckets, no cap) generated ~n²/128 candidate pairs at ANY corpus size.

With `n_planes="auto"` the bucket count per table scales as 2^ceil(log2(
n/32)), so the expected per-table bucket occupancy — and with it the
per-vector candidate fan-out — is CONSTANT in n: total candidates grow
O(n·tables), not O(n²). This tool measures that directly at adversarial
(near-uniform random) vector distributions, where every bucket is equally
full — clustered real corpora concentrate pairs in buckets the
`max_bucket` cap then bounds.

Setup: N deterministic murmur3-derived 64-dim vectors (no RNG), with a
planted near-dup: every id ≡ 1 (mod 100) is a tiny perturbation of its
predecessor (cosine ≈ 0.9999), so ground-truth pairs exist and recall is
measurable via `embedding_recall_audit`. Reports, per n:

  candidates        — Σ_buckets c·(c−1)/2 after the hot-bucket cap (the
                      exact row count of the candidate self-join, computed
                      as a bucket-size aggregation — no join materialized)
  old_form_pairs    — n²/128: what the fixed-64-bucket r5 default yields
  pairs_found       — verified pairs (cos >= threshold) end-to-end
  planted_recall    — fraction of the n/100 planted true pairs found
                      (exact, no sampling: the plant is known)
  wall_sec          — end-to-end operator wall time

Usage: python tools/stress_neardup_emb.py [n ...]   (default 250000 1000000)
Prints one JSON line per n.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

DIM = 64
THRESHOLD = 0.95


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [250_000, 1_000_000]

    from wde_spark.core.session import get_session
    from wde_spark.operators import similarity as SIM

    spark = get_session("stress_neardup_emb")
    out = []
    for n in ns:
        load0 = round(os.getloadavg()[0], 2)
        base = os.path.join(tempfile.gettempdir(), f"stress_ndemb_{n}")
        items_path = os.path.join(base, "items")
        # base vector of row i; ids ≡ 1 (mod 100) copy row i-1 with a
        # +0.02 shift on component 0 only (cosine vs source ≈ 0.9999)
        src = F.when(F.col("id") % 100 == 1, F.col("id") - 1) \
            .otherwise(F.col("id"))
        vec = F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda j: (F.hash(src, j) % 10007).cast("double") / 5003.5
            + F.when((F.col("id") % 100 == 1) & (j == 0), 0.02)
            .otherwise(0.0),
        )
        if not os.path.exists(os.path.join(items_path, "_SUCCESS")):
            spark.range(n) \
                .repartition(spark.sparkContext.defaultParallelism) \
                .select(F.col("id").alias("vec_id"),
                        vec.cast("array<float>").alias("embedding")) \
                .write.mode("overwrite").parquet(items_path)
        items = spark.read.parquet(items_path)

        bits, tables = SIM.cosine_lsh_params(THRESHOLD, n)

        # candidate count = Σ c(c−1)/2 over capped signature buckets —
        # the exact self-join row count, via one aggregation
        sig = SIM._lsh_multi_sig_udf(
            spark, SIM.hyperplanes(DIM, bits * tables), tables, bits)
        bucket_sizes = (
            items.select(F.explode(sig(SIM._as_double(
                F.col("embedding")))).alias("s"))
            .groupBy("s").agg(F.count("*").alias("c"))
            .filter(F.col("c") <= 64)
        )
        candidates = bucket_sizes.agg(
            F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("p")
        ).collect()[0].p or 0

        t0 = time.time()
        pairs = SIM.embedding_neardup(items, threshold=THRESHOLD)
        pairs.persist()
        pairs_found = pairs.count()
        wall = round(time.time() - t0, 2)
        # planted ground truth is known exactly: (i-1, i) for i ≡ 1 (mod
        # 100) — measure recall over ALL of it, no sampling needed
        planted_found = pairs.filter(
            (F.col("id_b") == F.col("id_a") + 1)
            & (F.col("id_a") % 100 == 0)).count()
        planted_total = (n + 98) // 100
        pairs.unpersist()

        rec = {
            "n_vectors": n,
            "bits_per_table": bits,
            "n_tables": tables,
            "candidates": int(candidates),
            "candidates_per_vector": round(candidates / n, 2),
            "old_form_pairs": int(n * n / 128),
            "vs_old_form": round((n * n / 128) / max(1, candidates), 1),
            "pairs_found": pairs_found,
            "planted_pairs": planted_total,
            "planted_recall": round(planted_found / planted_total, 4),
            "wall_sec": wall,
            "loadavg_start": load0,
            "loadavg_end": round(os.getloadavg()[0], 2),
        }
        out.append(rec)
        print(json.dumps(rec), flush=True)
    # sublinearity receipt: candidates/vector roughly constant while the
    # old form's per-vector candidates grow linearly in n
    if len(out) >= 2:
        print(json.dumps({
            "claim": "candidates grow O(n), not O(n^2)",
            "cand_per_vec": [r["candidates_per_vector"] for r in out],
            "old_form_per_vec": [round(r["old_form_pairs"] / r["n_vectors"], 1)
                                 for r in out],
        }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
