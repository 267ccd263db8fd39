"""Structured Streaming forms produce the same results as batch forms."""

from __future__ import annotations

from conftest import SF_SMOKE

from wde_spark.core.catalog import load_table
from wde_spark.streaming import windows as SW


def test_streaming_tumbling_matches_batch(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    common = ["win_start", "event_type", "n_events", "sum_value"]
    batch = {tuple(r) for r in SW.tumbling(ev).select(common).collect()}
    stream = {tuple(r)
              for r in SW.streaming_tumbling(spark, SF_SMOKE).select(common).collect()}
    assert batch == stream


def test_streaming_session_runs(spark):
    out = SW.streaming_session(spark, SF_SMOKE)
    assert out.count() > 0
    cols = set(out.columns)
    assert {"user_id", "session_start", "session_end", "n_events"} <= cols


def test_streaming_dedup_matches_batch(spark):
    """dropDuplicatesWithinWatermark on the static events stream keeps
    exactly one row per (user_id, event_type) — the batch dropDuplicates
    key set — with bounded state."""
    from wde_spark.core.catalog import load_table
    from wde_spark.streaming.windows import streaming_dedup

    sf = "/root/testdata/sf0.001"
    got = streaming_dedup(spark, sf).select("user_id", "event_type").collect()
    keys = {(r.user_id, r.event_type) for r in got}
    assert len(got) == len(keys), "streaming dedup emitted a duplicate key"
    batch = load_table(spark, sf, "events") \
        .dropDuplicates(["user_id", "event_type"])
    expected = {(r.user_id, r.event_type)
                for r in batch.select("user_id", "event_type").collect()}
    assert keys == expected
