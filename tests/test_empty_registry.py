"""Registry-wide empty-input sweep: every `queries()` entry must execute
(build a plan AND run it) against a dataset where every table has 0 rows.

Why this matters at 100 TB: a date filter, a tenant predicate, or a
partition prune routinely leaves a stage with zero rows — and one operator
that throws on an empty side (a `collect()[0]` on model state, a
`first()` on an empty agg, a divide-by-count) kills the whole job. The
operator-level version of this lives in test_empty_inputs.py; this sweep
covers the COMPOSED query plans, where empty-input bugs actually hide
(oracle SQL is not exercised — DuckDB never sees these frames).

The empty tables are written once per session by snapshotting each
sf0.001 parquet schema, so the sweep can never drift from the real
tables' column names/types.
"""

from __future__ import annotations

import os

import pytest
from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("sf_empty")
    for fname in sorted(os.listdir(SF_SMOKE)):
        if not fname.endswith(".parquet"):
            continue
        schema = spark.read.parquet(os.path.join(SF_SMOKE, fname)).schema
        spark.createDataFrame([], schema).write.parquet(
            str(out / fname), mode="overwrite")
    return str(out)


def test_every_query_survives_empty_tables(spark, empty_sf_dir):
    from wde_spark.queries import QUERIES

    failures = []
    for name, fn in QUERIES.items():
        try:
            df = fn(spark, empty_sf_dir)
            df.count()  # force execution, not just plan construction
        except Exception as exc:  # noqa: BLE001 — collecting ALL failures
            failures.append(f"{name}: {type(exc).__name__}: {exc}")
    assert not failures, (
        f"{len(failures)} queries crash on 0-row tables:\n"
        + "\n".join(failures[:20]))
