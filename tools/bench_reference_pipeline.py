"""Full-corpus reference-pipeline benchmark: stages -n + -i (and -c) over
all 409 catalogues / 82.9k items, offline against the shipped 65k-entry
query cache. The reference anchor (BASELINE.md): 10-20 h live, ≈2.3 items/s
single-core offline. Prints one JSON line.

Run: python tools/bench_reference_pipeline.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"


def main() -> None:
    from pyspark.sql import functions as F

    from wde_spark.core.session import get_session
    from wde_spark.plans.nametable import nametable_rows
    from wde_spark.plans.resolve import build_idset, resolve_offline
    from wde_spark.plans.wordcount import trait_wordcount
    from wde_spark.sources.cache import read_query_cache
    from wde_spark.sources.tei import read_tei_items

    multiply = int(sys.argv[sys.argv.index("--multiply") + 1]) \
        if "--multiply" in sys.argv else 1

    spark = get_session("wde_ref_bench")
    out: dict = {"metric": "reference_pipeline_full_corpus", "unit": "sec",
                 "multiply": multiply}

    t0 = time.time()
    items = read_tei_items(
        spark, os.path.join(REF, "Catalogues", "*", "CAT_*.xml"))
    if multiply > 1:
        # scale stress: replicate the corpus with distinct catalogue ids so
        # windows/joins see genuinely more groups, not bigger ones
        copies = spark.range(multiply).select(
            F.col("id").cast("string").alias("copy"))
        items = items.crossJoin(copies).withColumn(
            "catalogue_id", F.concat_ws("_", "catalogue_id", "copy")
        ).drop("copy")
    items = items.cache()
    n_items = items.count()
    out["stage_n_scan"] = round(time.time() - t0, 2)

    t0 = time.time()
    nt = nametable_rows(items).cache()
    n_rows = nt.count()
    out["stage_n_nametable"] = round(time.time() - t0, 2)

    t0 = time.time()
    cache = read_query_cache(
        spark, os.path.join(REF, "script", "logs", "idqueried_*.json"))
    resolved = resolve_offline(nt, cache).cache()
    n_resolved = resolved.filter(F.col("wd_id") != "").count()
    n_qids = build_idset(resolved).count()
    out["stage_i_resolve"] = round(time.time() - t0, 2)

    t0 = time.time()
    n_words = trait_wordcount(nt).count()
    out["stage_c_wordcount"] = round(time.time() - t0, 2)

    total = sum(v for k, v in out.items() if k.startswith("stage_"))
    out.update({
        "value": round(total, 2),
        "n_catalogues": items.select("catalogue_id").distinct().count(),
        "n_items": n_items, "n_nametable_rows": n_rows,
        "n_resolved": n_resolved, "n_distinct_qids": n_qids,
        "n_words": n_words,
        "items_per_sec": round(n_rows / total, 1),
        "reference_items_per_sec": 2.3,
    })
    print(json.dumps(out))


if __name__ == "__main__":
    main()
