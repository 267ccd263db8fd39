"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` smoke-runs the flagship query at sf0.001; `queries()` /
`oracle_sql()` expose the full operator inventory (SURVEY.md §2 + the
training-data-pipeline extensions) for the sf0.01 DuckDB correctness gate.
Implementations live in the `wde_spark` package.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H-Q1-shaped pricing
    summary (scan → pushed filter → 8-aggregate hash agg)."""
    from wde_spark.core.session import ensure_session_conf
    from wde_spark.queries import QUERIES

    ensure_session_conf(spark)
    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (see
    wde_spark/queries.py for the operator ↔ query mapping)."""
    from wde_spark.core.session import ensure_session_conf
    from wde_spark.queries import QUERIES

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_session_conf(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable SQL equivalent for EVERY query — including the ANN
    paths (the LSH oracle re-derives the md5 hyperplanes in SQL; the IVF
    oracle unrolls the deterministic 2-iteration k-means) and the
    approximate sketches/recall paths (property gates stated as constant
    rows). No rows-only entries remain."""
    from wde_spark.queries import ORACLE

    return dict(ORACLE)
