"""TIFF PackBits codec (`operators/tiff_codec.py`): lossless
round-trips (gray/RGB x PackBits/uncompressed), the row coder's packet
properties (128-cap, per-row restart, repeat-vs-literal choice), and
null-routes for the declared out-of-scope forms.
"""

from __future__ import annotations

import numpy as np

from wde_spark.operators.tiff_codec import (decode_tiff, encode_tiff,
                                            is_tiff, packbits_decode,
                                            packbits_encode_row)


def test_roundtrip_gray_and_rgb_both_compressions():
    rng = np.random.RandomState(1)
    for trial in range(60):
        h, w = int(rng.randint(1, 50)), int(rng.randint(1, 50))
        if trial % 2:
            img = (rng.randint(0, 4, (h, w)) * 80).astype(np.uint8)
        else:
            img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        for pb in (True, False):
            for big in (False, True):
                enc = encode_tiff(img, packbits=pb, big=big)
                assert is_tiff(enc)
                assert enc[:2] == (b"MM" if big else b"II")
                dw, dh, rgb = decode_tiff(enc)
                assert (dw, dh) == (w, h)
                want = (np.repeat(img[:, :, None], 3, 2)
                        if img.ndim == 2 else img)
                assert np.array_equal(rgb, want), (trial, pb, big)


def test_packbits_row_coder_properties():
    rng = np.random.RandomState(2)
    # fuzz: arbitrary run structure round-trips
    for t in range(500):
        n = int(rng.randint(0, 400))
        row = bytes((rng.randint(0, 5, n) * 63).astype(np.uint8))
        assert packbits_decode(packbits_encode_row(row), n) == row, t
    # long runs split at the 128 cap; long literals never emit the
    # no-op control byte 128
    enc = packbits_encode_row(b"\x07" * 300)
    assert packbits_decode(enc, 300) == b"\x07" * 300
    lit = bytes(range(256)) + bytes(range(256))
    enc = packbits_encode_row(lit)
    assert 128 not in [enc[0]] and packbits_decode(enc, 512) == lit
    # repeat-runs actually chosen for runs >= 3 (compression happens)
    assert len(packbits_encode_row(b"\x09" * 100)) < 10
    # derailed streams: truncation and wrong expected length
    assert packbits_decode(b"\x05abc", 6) is None       # literal overrun
    assert packbits_decode(b"\xfe", 3) is None          # repeat w/o byte
    assert packbits_decode(packbits_encode_row(b"abc"), 5) is None


def test_null_routes_outside_declared_support():
    enc = encode_tiff(np.zeros((6, 6), np.uint8))
    # an MM magic grafted onto an II body is CORRUPT (every multi-byte
    # field now reads byte-swapped), not a valid big-endian file
    assert decode_tiff(b"MM\x00*" + enc[4:]) is None
    assert decode_tiff(b"II*\x00\x00") is None          # truncated
    assert decode_tiff(enc[:-3]) is None                # IFD cut short
    assert decode_tiff(b"notatiff") is None
    # corrupt strip count -> geometry mismatch -> None
    bad = bytearray(enc)
    import struct
    (ifd_off,) = struct.unpack("<I", bad[4:8])
    (n_ent,) = struct.unpack("<H", bad[ifd_off:ifd_off + 2])
    for e in range(n_ent):
        off = ifd_off + 2 + 12 * e
        tag = struct.unpack("<H", bad[off:off + 2])[0]
        if tag == 279:  # StripByteCounts
            bad[off + 8:off + 12] = struct.pack("<I", 2)
    assert decode_tiff(bytes(bad)) is None


def test_stats_dispatch_tiff(spark):
    """attach_tiffs -> image_rgba_stats reproduces the builder formula
    through the real container + PackBits walk (the query's contract)."""
    from wde_spark.operators import multimodal as MM

    docs = spark.createDataFrame(
        [(0, "hello world"), (1, "hello world"),
         (2, "hello world"), (3, "hello world"), (4, "")],
        "doc_id long, text string")
    media = MM.attach_tiffs(docs)
    # byte-order mixing: docs 2,3 encode big-endian, 0,1,4 little
    orders = {r["media_id"]: bytes(r["payload"])[:2]
              for r in media.collect()}
    assert orders == {0: b"II", 1: b"II", 2: b"MM", 3: b"MM", 4: b"II"}
    rows = {r["media_id"]: r for r in
            MM.image_rgba_stats(media).collect()}
    # MM decodes to the SAME stats as its II twin (framing-only change)
    for k in ("width", "height", "channels", "px_sum", "px_fp"):
        assert rows[2][k] == rows[0][k]
        assert rows[3][k] == rows[1][k]
    data = b"hello world"
    n = len(data)
    w, h = n % 17 + 4, n % 11 + 4
    v = np.frombuffer(data, np.uint8)[(5 * np.arange(w * h)) % n]
    # tier 0 (doc 0): quantized gray replicated x3
    q = (v // 64) * 64
    assert rows[0]["width"] == w and rows[0]["height"] == h
    assert rows[0]["channels"] == 3
    assert rows[0]["px_sum"] == int(q.astype(np.int64).sum()) * 3
    # tier 1 (doc 1): three channel offsets
    vv = v.astype(np.int64)
    want = (vv % 256).sum() + ((vv + 77) % 256).sum() \
        + ((vv + 154) % 256).sum()
    assert rows[1]["px_sum"] == int(want)
    # empty text: all-zero image
    assert rows[4]["px_sum"] == 0 and rows[4]["n_transparent"] == 0
