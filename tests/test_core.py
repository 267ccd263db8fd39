from __future__ import annotations

from conftest import SF_SMOKE

from wde_spark.core.catalog import TABLES, load_table, register_views


def test_all_tables_load(spark):
    for name in TABLES:
        df = load_table(spark, SF_SMOKE, name)
        assert df.count() > 0, name


def test_events_ts_is_timestamp(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    # parquet writers that set isAdjustedToUTC=false are inferred as
    # TIMESTAMP_NTZ by Spark 4 — the engine accepts both (operators cast
    # where a function is TZ-only, see relational._micros), and DuckDB's
    # naive TIMESTAMP agrees with either under the UTC session.
    assert dict(ev.dtypes)["ts"] in ("timestamp", "timestamp_ntz")
    row = ev.orderBy("event_id").first()
    assert row.ts.year == 2024


def test_register_views(spark):
    register_views(spark, SF_SMOKE, ["region", "nation"])
    assert spark.sql("SELECT count(*) c FROM region").first().c == 5
