"""Every registered query runs at sf0.001 and produces a stable schema."""

from __future__ import annotations

import pytest
from conftest import SF_SMOKE

from wde_spark.queries import QUERIES, ORACLE


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs(spark, name):
    df = QUERIES[name](spark, SF_SMOKE)
    assert df.columns  # schema resolves
    assert df.count() >= 0


def test_oracle_coverage():
    # every query either has an oracle or is explicitly engine-specific
    rows_only = set(QUERIES) - set(ORACLE)
    assert rows_only <= {
        "lsh_ann_embeddings", "multimodal_features", "ivf_ann_embeddings"}


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 30
