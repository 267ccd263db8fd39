"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is forced end-to-end with the `noop` sink (computes every column,
writes nothing) so Catalyst can't prune work the way a bare count() would.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "agg_order_stats",
    "lww_latest_order",
    "topk_orders_per_customer",
    "window_frames_running",
    "carry_forward_purchase",
    "session_events",
    "tumbling_events",
    "word_count_top100",
    "exact_dedup_documents",
    "minhash_signatures_documents",
    "neardup_lsh_verified",
    "simhash_documents",
    "quality_score_documents",
    "lang_id_documents",
    "cosine_topk_embeddings",
    "lsh_ann_embeddings",
    "embedding_neardup_exact",
    "multimodal_frames",
    "multimodal_features",
    "resolve_ladder_parts",
    "q6_forecast_revenue",
    "q18_large_volume_orders",
    "asof_join_purchase_view",
    "range_join_error_clicks",
    "funnel_signup_view_purchase",
    "pack_token_budget_documents",
    "stratified_sample_documents",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from wde_spark.core.session import get_session
    from wde_spark.queries import QUERIES

    spark = get_session("wde_bench")
    # Warm the JVM (executor pool, codegen compiler, parquet footers, noop
    # sink) with one real but tiny job per table so per-query numbers
    # measure the queries, not first-job start-up — the baseline's own
    # figures are likewise means of warm runs (BASELINE.md).
    from wde_spark.core.catalog import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t) \
            .write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_queries": len(timings),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
