"""Structured Streaming forms produce the same results as batch forms."""

from __future__ import annotations

from conftest import SF_SMOKE
from pyspark.sql import functions as F

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


def test_stream_stream_interval_join_matches_batch(spark):
    """The stream-stream interval join emits exactly the pairs the batch
    range_join produces (static input, watermarks fully advanced)."""
    from wde_spark.operators import relational as R
    from pyspark.sql import functions as F

    got = {(r.l_event_id, r.r_event_id)
           for r in SW.streaming_interval_join(spark, SF_SMOKE).collect()}

    ev = load_table(spark, SF_SMOKE, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("cts"), F.col("event_id").alias("cid"))
    batch = {(r.event_id, r.cid)
             for r in R.range_join(errors, clicks, "user_id", "ts", "cts",
                                   300).collect()}
    assert got == batch and batch


def test_stream_static_enrich_matches_batch(spark):
    from pyspark.sql import functions as F

    got = {(r.event_id, r.type_total)
           for r in SW.streaming_static_enrich(spark, SF_SMOKE).collect()}
    ev = load_table(spark, SF_SMOKE, "events")
    dim = ev.groupBy("event_type").agg(F.count("*").alias("type_total"))
    expected = {(r.event_id, r.type_total)
                for r in ev.join(dim, "event_type")
                           .select("event_id", "type_total").collect()}
    assert got == expected and expected


def test_file_sink_exactly_once_across_restarts(spark, tmp_path):
    """The checkpointed file sink is exactly-once: running the same
    checkpointed query twice over a static source emits each input row
    exactly once (the second start finds the checkpoint fully committed
    and writes nothing new) — the engine-native replacement for the
    reference's append-only done-logs (P1, script/itemtoid.py:348-353)."""
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        q = (
            SW.read_events_stream(spark, SF_SMOKE)
            .select("event_id", "user_id", "event_type")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_once()
    n_first = spark.read.parquet(out).count()
    run_once()  # restart from the same checkpoint
    got = spark.read.parquet(out)
    assert got.count() == n_first
    assert got.select("event_id").distinct().count() == n_first
    expected = load_table(spark, SF_SMOKE, "events").count()
    assert n_first == expected


def test_streaming_cdc_apply_matches_sequential_merge(spark, tmp_path):
    """A changeset stream applied through foreachBatch + merge_changeset
    yields the same snapshot as applying the batches sequentially in batch
    mode, and replaying the stream from its checkpoint changes nothing
    (idempotent versions → exactly-once effect)."""
    from wde_spark.operators.relational import merge_changeset
    from wde_spark.streaming.cdc import read_snapshot, streaming_cdc_apply

    snap = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, val double",
    )
    b0 = [(2, "U", None, 99.0), (4, "I", "d", 40.0)]
    b1 = [(1, "D", None, None), (4, "U", "dd", None)]
    schema = "k long, op string, name string, val double"
    chdir = tmp_path / "changes"
    for i, rows in enumerate((b0, b1)):
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.mode("overwrite").parquet(str(chdir / f"f{i}.parquet"))
    # file-source streams read files in order; one file per micro-batch
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(chdir / "*.parquet"))
    )
    target, ckpt = str(tmp_path / "snap"), str(tmp_path / "ckpt")

    streaming_cdc_apply(stream, snap, "k", target, ckpt)
    got = {r.k: (r.name, r.val) for r in read_snapshot(spark, target).collect()}

    expected_df = snap
    for rows in (b0, b1):
        expected_df = merge_changeset(
            expected_df, spark.createDataFrame(rows, schema), "k")
    expected = {r.k: (r.name, r.val) for r in expected_df.collect()}
    assert got == expected
    assert got[4] == ("dd", 40.0)  # U after I, NULL cell kept the 40.0

    # replay from the same checkpoint: no new versions, same content
    import os
    versions_before = sorted(os.listdir(target))
    streaming_cdc_apply(stream, snap, "k", target, ckpt)
    assert sorted(os.listdir(target)) == versions_before
    got2 = {r.k: (r.name, r.val) for r in read_snapshot(spark, target).collect()}
    assert got2 == got


def test_streaming_doc_neardup_matches_batch(spark, tmp_path):
    """The streaming dedup tier (row-local fingerprints + band keys,
    exact-dedup on the stream, stream-static LSH index join) must flag the
    same (stream doc, index doc) band collisions as the batch
    minhash_lsh_pairs between the two sets."""
    import os as _os

    from wde_spark.core.catalog import load_table
    from wde_spark.operators.dedup import minhash_lsh_pairs
    from wde_spark.streaming.windows import streaming_doc_neardup

    docs = load_table(spark, SF_SMOKE, "documents")
    index = docs.filter(F.col("doc_id") % 2 == 0)
    stream_docs = docs.filter(F.col("doc_id") % 2 == 1)
    src = tmp_path / "docstream"
    _os.makedirs(src)
    stream_docs.coalesce(1).write.parquet(str(src / "chunk_0.parquet"))

    out = {r.doc_id: r.matched_index_docs
           for r in streaming_doc_neardup(spark, str(src) + "/*",
                                          index).collect()}

    # batch truth: band-collision pairs between the two halves (union both
    # directions of the id inequality), counted per stream doc
    both = minhash_lsh_pairs(docs, shingle_k=2)
    pairs = [(r.id_a, r.id_b) for r in both.collect()]
    expect = {}
    for a, b in pairs:
        if a % 2 == 1 and b % 2 == 0:
            expect.setdefault(a, set()).add(b)
        if b % 2 == 1 and a % 2 == 0:
            expect.setdefault(b, set()).add(a)

    # every streamed doc appears exactly once (exact-dedup keeps one per fp)
    n_unique_fp = stream_docs.select(
        F.md5(F.expr("regexp_replace(lower(text), '[^a-z0-9]+', '')"))
    ).distinct().count()
    assert len(out) <= stream_docs.count()
    assert len(out) >= n_unique_fp - 5  # fingerprint form differs slightly

    for doc_id, n in out.items():
        assert n == len(expect.get(doc_id, set())), \
            f"doc {doc_id}: streaming={n} batch={len(expect.get(doc_id, set()))}"
