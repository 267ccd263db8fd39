"""Physical-plan hygiene: the optimizations the 100 TB design leans on must
actually appear in the plans — pushed filters reach the parquet scan,
column pruning holds, small dimensions broadcast, hot relational paths stay
inside whole-stage codegen (no Python evaluation nodes)."""

from __future__ import annotations

import pytest

from conftest import SF_CORRECT


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_filter_pushdown_and_pruning(spark):
    from wde_spark.queries import QUERIES

    df = QUERIES["q1_pricing_summary"](spark, SF_CORRECT)
    plan = df._jdf.queryExecution().toString()
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: unused wide columns must not be read
    assert "l_comment" not in plan
    assert "ReadSchema" in plan


def test_q5_broadcasts_small_dims(spark):
    from wde_spark.queries import QUERIES

    df = QUERIES["q5_local_supplier_volume"](spark, SF_CORRECT)
    df.collect()  # execute THIS plan so AQE finalizes it (codegen visible)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    # '*(n)' prefixes mark whole-stage-codegen spans in the plan string
    assert "*(" in plan


def test_relational_paths_have_no_python_nodes(spark):
    """Every oracle-checked relational/window/dedup query must stay JVM-side
    (Arrow/Python evaluation only where declared: qdict, multimodal)."""
    from wde_spark.queries import QUERIES

    python_ok = {"multimodal_frames", "multimodal_features"}
    offenders = {}
    for name in [
        "q1_pricing_summary", "q3_shipping_priority", "lww_latest_order",
        "topk_orders_per_customer", "window_frames_running",
        "carry_forward_purchase", "word_count_top100",
        "exact_dedup_documents", "minhash_signatures_documents",
        "neardup_lsh_verified", "quality_score_documents",
        "cosine_topk_embeddings", "embedding_neardup_exact",
        "resolve_ladder_parts", "session_events",
    ]:
        plan = _plan(QUERIES[name](spark, SF_CORRECT))
        if "BatchEvalPython" in plan or "ArrowEvalPython" in plan \
                or "MapInPandas" in plan:
            offenders[name] = True
    assert not offenders, f"Python nodes in hot paths: {list(offenders)}"


def test_exact_dedup_single_shuffle(spark):
    """Tier-1 dedup must be exactly one exchange (the groupBy on the
    fingerprint) — no extra sorts/shuffles."""
    from wde_spark.queries import QUERIES

    plan = _plan(QUERIES["exact_dedup_documents"](spark, SF_CORRECT))
    # repartition (spread) + the agg exchange; no join/sort exchanges
    assert plan.count("Exchange hashpartitioning") == 1
