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


# --- BMP container (operators/bmp_codec.py) -------------------------------


def test_bmp_roundtrip_all_modes():
    import numpy as np

    from wde_spark.operators.bmp_codec import decode_bmp, encode_bmp

    rng = np.random.RandomState(5)
    for trial in range(60):
        h = int(rng.randint(1, 30))
        w = int(rng.randint(1, 30))
        mode = trial % 4
        if mode == 0:
            g = rng.randint(0, 256, (h, w)).astype(np.uint8)
            enc, want = encode_bmp(g), np.stack([g] * 3, axis=2)
        elif mode == 1:
            px = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
            enc, want = encode_bmp(px), px
        elif mode == 2:  # RLE8 through the codec shared with AVI
            g = (rng.randint(0, 4, (h, w)) * 80).astype(np.uint8)
            enc, want = encode_bmp(g, rle=True), np.stack([g] * 3, axis=2)
        else:            # negative height = top-down rows
            px = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
            enc, want = encode_bmp(px, top_down=True), px
        dec = decode_bmp(enc)
        assert dec is not None, trial
        assert (dec[0], dec[1]) == (w, h)
        assert np.array_equal(dec[2], want), trial


def test_bmp_null_routes():
    import numpy as np

    from wde_spark.operators.bmp_codec import decode_bmp, encode_bmp

    assert decode_bmp(b"BM" + b"\x00" * 10) is None
    assert decode_bmp(b"nope") is None
    enc = encode_bmp(np.zeros((4, 4), np.uint8))
    assert decode_bmp(enc[:-5]) is None        # truncated pixel data
    bad = bytearray(enc)
    bad[28] = 16                               # unsupported bit depth
    assert decode_bmp(bytes(bad)) is None


def test_attach_bmps_stats_dispatch(spark):
    import numpy as np

    from wde_spark.operators import multimodal as MM

    docs = spark.createDataFrame(
        [(0, "abc"), (1, "abc"), (2, "abc"), (3, "")],
        "doc_id long, text string")
    rows = {r["media_id"]: r
            for r in MM.image_rgba_stats(MM.attach_bmps(docs)).collect()}
    b = np.frombuffer(b"abc", np.uint8)
    w, h = 3 % 18 + 5, 3 % 13 + 5
    v = b[(3 * np.arange(w * h)) % 3].astype("int64")
    assert rows[0]["channels"] == 3
    assert rows[0]["px_sum"] == int(v.sum()) * 3          # gray tier
    assert rows[1]["px_sum"] == int(
        (v + (v + 91) % 256 + (v + 182) % 256).sum())     # 24-bit tier
    assert rows[2]["px_sum"] == int(v.sum()) * 3          # RLE tier
    assert rows[3]["px_sum"] == 0                         # empty text
    assert all(r["n_transparent"] == 0 for r in rows.values())
