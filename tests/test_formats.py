"""Source/sink format round-trips beyond parquet+TSV: ORC, JSON-lines, and
compressed parquet all preserve the orders table exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_SMOKE

from wde_spark.core.catalog import load_table


def _orders_set(df):
    return {
        (r.o_orderkey, r.o_custkey, r.o_orderstatus, round(r.o_totalprice, 2),
         str(r.o_orderdate), r.o_orderpriority)
        for r in df.collect()
    }


def test_orc_roundtrip(spark, tmp_path):
    o = load_table(spark, SF_SMOKE, "orders")
    path = str(tmp_path / "orders_orc")
    o.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert back.schema == o.schema
    assert _orders_set(back) == _orders_set(o)


def test_jsonl_roundtrip_with_schema(spark, tmp_path):
    o = load_table(spark, SF_SMOKE, "orders")
    path = str(tmp_path / "orders_jsonl")
    o.write.mode("overwrite").json(path)
    # schema-on-read with an explicit schema (no inference pass at scale)
    back = spark.read.schema(o.schema).json(path)
    assert _orders_set(back) == _orders_set(o)


def test_parquet_zstd_roundtrip(spark, tmp_path):
    o = load_table(spark, SF_SMOKE, "orders")
    path = str(tmp_path / "orders_zstd")
    o.write.mode("overwrite").option("compression", "zstd").parquet(path)
    back = spark.read.parquet(path)
    assert _orders_set(back) == _orders_set(o)
    import glob
    assert any(".zstd.parquet" in f for f in glob.glob(path + "/*.parquet"))
