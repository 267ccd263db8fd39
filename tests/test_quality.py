"""Data-quality expectations (`operators/quality.py`) on deliberately
dirty data — the registry query `data_quality_orders` proves the clean
path against the oracle; these prove the checks actually COUNT."""

from __future__ import annotations

from pyspark.sql import functions as F

from wde_spark.operators import quality as Q


def test_expectations_count_violations(spark):
    rows = [
        (1, "O", 10.0, "1-URGENT", 100),
        (2, "X", -5.0, "9-BOGUS", 100),   # bad status, negative, bad regex
        (2, "F", 20.0, "2-HIGH", 999),    # duplicate key, orphan fk
        (None, "P", None, None, None),    # null key; NULLs elsewhere pass
    ]
    df = spark.createDataFrame(
        rows, "k long, status string, price double, prio string, cust long")
    dim = spark.createDataFrame([(100,), (200,)], "c long")
    out = {r.check: (r.violations, r.total, r.ok)
           for r in Q.run_expectations(df, [
               Q.check_not_null("k"),
               Q.check_unique("k"),
               Q.check_range("price", lo=0),
               Q.check_accepted("status", ["O", "F", "P"]),
               Q.check_regex("prio", "^[1-5]-"),
               Q.check_fk("cust", dim, "c"),
           ]).collect()}
    assert out["not_null:k"] == (1, 4, False)
    assert out["unique:k"] == (1, 4, False)   # 3 non-NULL keys, 2 distinct
    assert out["range:price"] == (1, 4, False)    # NULL price is NOT a violation
    assert out["accepted:status"] == (1, 4, False)
    assert out["regex:prio"] == (1, 4, False)     # NULL prio passes
    assert out["fk:cust"] == (1, 4, False)        # 999 orphaned; NULL passes


def test_expectations_single_scan_for_rowlocal(spark):
    """All row-local checks must fold into ONE aggregation over one scan —
    adding a check must not add a pass over the data."""
    df = spark.createDataFrame([(1, 2.0)], "a long, b double")
    checks = [Q.check_not_null("a"), Q.check_range("b", 0, 10),
              Q.check_accepted("a", [1])]
    rowlocal = [c for c in checks if c.kind == "rowlocal"]
    agg = df.agg(F.count(F.lit(1)),
                 *[F.sum(F.when(c.predicate, 1).otherwise(0))
                   for c in rowlocal])
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") <= 1

    out = Q.run_expectations(df, checks)
    assert out.count() == 3 and all(r.ok for r in out.collect())


def test_streaming_quality_monitor_matches_batch(spark, tmp_path):
    """Per-micro-batch metrics from the streaming monitor must equal
    batch-mode run_expectations on each batch, and replay must rewrite
    identical ledger entries (append-only immutable b{n} directories)."""
    import os

    from wde_spark.streaming.quality_monitor import (
        read_metrics, streaming_quality_monitor)

    schema = "k long, status string"
    b0 = [(1, "O"), (2, "X"), (2, "F")]          # 1 bad status, 1 dup key
    b1 = [(None, "O"), (5, "P")]                 # 1 null key
    src = tmp_path / "recs"
    for i, rows in enumerate((b0, b1)):
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.mode("overwrite").parquet(str(src / f"f{i}.parquet"))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*.parquet"))
    )
    checks = [Q.check_not_null("k"), Q.check_unique("k"),
              Q.check_accepted("status", ["O", "F", "P"])]
    target, ckpt = str(tmp_path / "metrics"), str(tmp_path / "ckpt")
    streaming_quality_monitor(stream, checks, target, ckpt)

    got = {(r.batch_id, r.check): (r.violations, r.total, r.ok)
           for r in read_metrics(spark, target).collect()}
    expected = {}
    for bid, rows in enumerate((b0, b1)):
        for r in Q.run_expectations(
                spark.createDataFrame(rows, schema), checks).collect():
            expected[(bid, r.check)] = (r.violations, r.total, r.ok)
    assert got == expected
    assert got[(0, "unique:k")] == (1, 3, False)
    assert got[(1, "not_null:k")] == (1, 2, False)

    dirs = sorted(os.listdir(target))
    streaming_quality_monitor(stream, checks, target, ckpt)  # replay: no-op
    assert sorted(os.listdir(target)) == dirs
    got2 = {(r.batch_id, r.check): (r.violations, r.total, r.ok)
            for r in read_metrics(spark, target).collect()}
    assert got2 == got


def test_unique_ignores_null_keys(spark):
    """dbt ignore-NULL semantics, pinned: rows with a NULL key column are
    excluded from the uniqueness count entirely (they are check_not_null's
    job) — n NULL-key rows are 0 unique-violations, matching the oracle's
    COUNT(col)-COUNT(DISTINCT col). Without the explicit guard,
    count_distinct(struct(k)) counts the NULL struct once and n NULL rows
    would score n-1."""
    df = spark.createDataFrame(
        [(None, 1), (None, 2), (None, 3), (7, 4), (7, 5)], "k long, x long")
    out = {r.check: r.violations
           for r in Q.run_expectations(df, [Q.check_unique("k")]).collect()}
    assert out == {"unique:k": 1}  # only the 7/7 duplicate counts
    # multi-column keys: ANY NULL component excludes the row
    df2 = spark.createDataFrame(
        [(1, None), (1, None), (1, 2), (1, 2)], "a long, b long")
    out2 = {r.check: r.violations
            for r in Q.run_expectations(df2, [Q.check_unique("a", "b")]).collect()}
    assert out2 == {"unique:a,b": 1}


def test_read_metrics_empty_ledger(spark, tmp_path):
    """A ledger with zero completed batches is a valid state — empty
    DataFrame with the metrics schema, not a path-not-found error."""
    from wde_spark.streaming.quality_monitor import read_metrics

    target = str(tmp_path / "does_not_even_exist")
    got = read_metrics(spark, target)
    assert got.count() == 0
    assert got.columns == ["batch_id", "check", "violations", "total", "ok"]


def test_expectations_empty_inputs(spark):
    df = spark.createDataFrame([], "a long, b double")
    out = Q.run_expectations(df, [Q.check_not_null("a"),
                                  Q.check_unique("a")])
    rows = {r.check: (r.violations, r.total, r.ok) for r in out.collect()}
    assert rows == {"not_null:a": (0, 0, True), "unique:a": (0, 0, True)}
    assert Q.run_expectations(df, []).count() == 0
