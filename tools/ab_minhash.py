"""A/B: minhash signature-scan cost, md5-per-permutation family vs the
affine family (`operators/dedup.py::minhash_signatures`).

The affine family landed claiming "K permutations cost K integer mults,
not K string digests" — this banks the measurement behind that claim. The
md5-per-permutation form (min over md5(j|shingle) per permutation j) is
reconstructed INLINE here; the production path is the library call. Both
run over the SAME materialized distinct-shingle table (built once,
localCheckpoint'ed), so the delta isolates exactly the per-shingle digest
+ agg cost, which is the dominant signature-scan cost at 100 TB.

Usage: python tools/ab_minhash.py [multiply] [sf_dir]
  multiply: document-table multiplication factor (default 100 →
            ~6M docs at sf0.1). Texts get a per-copy suffix so shingle
            sets stay distinct (clone-collapse must not shrink the scan).
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
    load0 = round(os.getloadavg()[0], 2)
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    num_hashes = 16

    from wde_spark.core.catalog import load_table
    from wde_spark.core.session import get_session
    from wde_spark.operators.dedup import (
        distinct_shingle_table, minhash_signatures)

    spark = get_session("ab_minhash")
    base = load_table(spark, sf_dir, "documents")
    copies = spark.range(mult).select(F.col("id").alias("copy"))
    docs = (
        base.crossJoin(copies)
        .select(
            (F.col("doc_id") * mult + F.col("copy")).alias("doc_id"),
            F.concat_ws(" ", F.col("text"),
                        F.col("copy").cast("string")).alias("text"),
        )
        .repartition(spark.sparkContext.defaultParallelism)
    )
    n_docs = docs.count()

    # one shared shingle table, materialized TO PARQUET (not cached —
    # 5M docs → ~240M shingle rows, which pins enough storage memory to
    # starve the aggregation if held in the unified region): both families
    # then read the identical on-disk input, so the A/B isolates exactly
    # the digest + agg cost.
    import tempfile

    sh_path = os.path.join(tempfile.gettempdir(), "ab_minhash_shingles")
    distinct_shingle_table(docs, shingle_k=3) \
        .write.mode("overwrite").parquet(sh_path)
    sh = spark.read.parquet(sh_path)
    n_shingles = sh.count()

    def _noop(df) -> float:
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 2)

    # warm both paths' codegen once on a tiny slice
    tiny = sh.limit(1000)

    # --- affine family (production path) ---
    affine_sig = minhash_signatures(docs, shingle_table=sh)
    _noop(minhash_signatures(docs, shingle_table=tiny))
    t_affine = min(_noop(affine_sig) for _ in range(2))

    # --- md5-per-permutation family (the pre-round-4 form, inline) ---
    def md5_family(sht):
        return sht.groupBy("doc_id").agg(*[
            F.min(F.md5(F.concat_ws("|", F.lit(str(j)), F.col("sh"))))
            .alias(f"mh_{j}")
            for j in range(num_hashes)
        ])

    _noop(md5_family(tiny))
    t_md5 = min(_noop(md5_family(sh)) for _ in range(2))

    # sanity: the affine path still yields integer-typed signatures
    afield = affine_sig.schema["mh_0"].dataType.simpleString()
    print(json.dumps({
        "n_docs": n_docs,
        "n_distinct_shingles": n_shingles,
        "num_hashes": num_hashes,
        "md5_family_sec": t_md5,
        "affine_family_sec": t_affine,
        "speedup": round(t_md5 / t_affine, 2) if t_affine else None,
        "affine_sig_type": afield,
        "loadavg_start": load0,
        "loadavg_end": round(os.getloadavg()[0], 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
