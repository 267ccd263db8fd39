"""PNG codec (`operators/png_codec.py`): round-trip property tests over
every color type and every scanline filter, malformed-input null-routing,
and the Spark-side integration — `extract_features` histograms DECODED
pixels for real PNGs while non-PNG payloads keep the byte-histogram path
(the oracle contract for `multimodal_features`).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from wde_spark.operators import multimodal as MM
from wde_spark.operators.png_codec import (
    PNG_MAGIC, decode_png, encode_png, is_png)


def _rand(shape, seed):
    return np.random.RandomState(seed).randint(
        0, 256, size=shape, dtype=np.uint8)


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_roundtrip_every_colortype_and_filter(channels, filter_type):
    px = _rand((13, 7, channels), seed=channels * 10 + filter_type)
    blob = encode_png(px, filter_type=filter_type)
    assert is_png(blob)
    w, h, ch, out = decode_png(blob)
    assert (w, h, ch) == (7, 13, channels)
    assert np.array_equal(out, px)


def test_roundtrip_property_random_sizes():
    rs = np.random.RandomState(42)
    for trial in range(25):
        h = int(rs.randint(1, 40))
        w = int(rs.randint(1, 40))
        ch = int(rs.choice([1, 2, 3, 4]))
        ft = int(rs.randint(0, 5))
        px = rs.randint(0, 256, size=(h, w, ch), dtype=np.uint8)
        _, _, _, out = decode_png(encode_png(px, filter_type=ft))
        assert np.array_equal(out, px), (h, w, ch, ft)


def test_palette_expansion():
    # hand-built color-type-3 PNG: 2x2 image, 3-entry palette
    palette = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B
    idx = bytes([0, 0, 1, 0, 2, 0])  # filter 0 + [0,1] / filter 0 + [2,0]

    def chunk(ctype, data):
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data \
            + struct.pack(">I", crc)

    blob = (PNG_MAGIC
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
            + chunk(b"PLTE", palette)
            + chunk(b"IDAT", zlib.compress(idx))
            + chunk(b"IEND", b""))
    w, h, ch, px = decode_png(blob)
    assert (w, h, ch) == (2, 2, 3)
    assert px.tolist() == [[[255, 0, 0], [0, 255, 0]],
                           [[0, 0, 255], [255, 0, 0]]]


def test_malformed_inputs_null_route():
    px = _rand((4, 4, 3), seed=1)
    good = encode_png(px)
    assert decode_png(b"not a png at all") is None
    assert decode_png(good[:20]) is None           # truncated mid-IHDR
    assert decode_png(good[:-12]) is not None      # missing IEND is fine
    corrupt = good[:40] + b"\x00\x00" + good[42:]  # damage the IDAT stream
    # must not raise; either null-route or (if the damage landed in a
    # skipped CRC) decode to a well-formed 4x4x3 frame — never garbage
    got = decode_png(corrupt)
    assert got is None or (got[0], got[1], got[3].shape) == (4, 4, (4, 4, 3))
    # 16-bit depth: declared unsupported -> None, not garbage
    blob16 = bytearray(good)
    ihdr_off = 8 + 8  # magic + len/type
    blob16[ihdr_off + 8] = 16
    assert decode_png(bytes(blob16)) is None


def test_decompression_bomb_null_routes():
    """A small IDAT inflating far beyond what IHDR promises must
    null-route (bounded inflate), never raise — the Arrow-kernel
    contract. Both directions: a stream LONGER than the promised size,
    and an IHDR promising absurd dimensions."""
    import numpy as np

    # 4x4 gray image whose IDAT actually inflates to 1 MB of zeros
    bomb_raw = zlib.compress(bytes(1024 * 1024))

    def chunk(ctype, data):
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data \
            + struct.pack(">I", crc)

    blob = (PNG_MAGIC
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0))
            + chunk(b"IDAT", bomb_raw)
            + chunk(b"IEND", b""))
    assert decode_png(blob) is None
    # absurd promised dimensions refuse before allocating
    big = (PNG_MAGIC
           + chunk(b"IHDR",
                   struct.pack(">IIBBBBB", 2 ** 30, 2 ** 30, 8, 6, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(b"\x00"))
           + chunk(b"IEND", b""))
    assert decode_png(big) is None
    # sanity: a legitimate image still round-trips through the same path
    px = np.zeros((4, 4), dtype=np.uint8)
    assert decode_png(encode_png(px)) is not None


def test_extract_features_histograms_decoded_pixels(spark):
    """End-to-end through the SAME Arrow kernel the oracled query uses: a
    real PNG payload must be histogrammed over its decoded pixels; a text
    payload must keep the raw-byte histogram (oracle-compatible path)."""
    px = np.zeros((8, 8, 3), dtype=np.uint8)  # all-zero pixels -> bucket 0
    png = encode_png(px, filter_type=4)
    text = b"hello world, plain bytes"
    media = spark.createDataFrame(
        [(1, "image", bytearray(png)), (2, "image", bytearray(text)),
         (3, "audio", bytearray(png))],
        "media_id long, kind string, payload binary")
    rows = {r.media_id: r for r in MM.extract_features(media).collect()}

    # PNG image: decoded 8x8x3 zeros -> histogram mass entirely in bucket 0
    assert rows[1].features[0] == 1.0
    assert sum(rows[1].features) == pytest.approx(1.0)
    # n_bytes stays the TRANSPORT size, not the decoded size
    assert rows[1].n_bytes == len(png)

    # non-PNG payload: byte histogram over the raw bytes
    b = np.frombuffer(text, dtype=np.uint8)
    expect = np.bincount(b >> 5, minlength=8)[:8] / len(text)
    assert rows[2].features == pytest.approx(expect.tolist())

    # PNG bytes under a non-image kind: raw-byte path (decode is gated on
    # the declared modality, not content sniffing alone)
    bp = np.frombuffer(png, dtype=np.uint8)
    expect_raw = np.bincount(bp >> 5, minlength=8)[:8] / len(png)
    assert rows[3].features == pytest.approx(expect_raw.tolist())


def _chunk(ctype, data):
    crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
    return struct.pack(">I", len(data)) + ctype + data \
        + struct.pack(">I", crc)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_palette_encode_roundtrip(filter_type):
    from wde_spark.operators.png_codec import encode_png_palette

    rng = np.random.RandomState(41 + filter_type)
    px = (rng.randint(0, 6, (11, 13, 1)) * 40).repeat(3, axis=2) \
        .astype(np.uint8)
    px[:, :, 1] //= 2  # distinct per-channel values
    blob = encode_png_palette(px, filter_type=filter_type)
    w, h, ch, out = decode_png(blob)
    assert (w, h, ch) == (13, 11, 3)
    assert (out == px).all()
    # indexed tier really is smaller than the truecolor tier here
    assert len(blob) < len(encode_png(px, filter_type=filter_type))


def test_palette_trns_roundtrip_expands_alpha():
    from wde_spark.operators.png_codec import encode_png_palette

    rng = np.random.RandomState(7)
    px = (rng.randint(0, 5, (9, 8, 1)) * 50).repeat(3, axis=2) \
        .astype(np.uint8)
    alpha = np.where(px[:, :, 0] == 0, 0, 255).astype(np.uint8)
    blob = encode_png_palette(px, alpha=alpha, filter_type=3)
    w, h, ch, out = decode_png(blob)
    assert ch == 4
    assert (out[:, :, :3] == px).all()
    assert (out[:, :, 3] == alpha).all()


def test_gray_and_rgb_trns_expand_alpha():
    g = (np.arange(42, dtype=np.uint8).reshape(6, 7) % 4) * 30
    body = encode_png(g)
    blob = body[:33] + _chunk(b"tRNS", struct.pack(">H", 30)) + body[33:]
    w, h, ch, out = decode_png(blob)
    assert ch == 2
    assert (out[:, :, 0] == g).all()
    assert ((out[:, :, 1] == 0) == (g == 30)).all()

    rgb = np.dstack([g, g // 2, g * 2]).astype(np.uint8)
    body = encode_png(rgb)
    key = struct.pack(">HHH", 30, 15, 60)
    blob = body[:33] + _chunk(b"tRNS", key) + body[33:]
    w, h, ch, out = decode_png(blob)
    hit = (rgb[:, :, 0] == 30) & (rgb[:, :, 1] == 15) & (rgb[:, :, 2] == 60)
    assert ch == 4 and ((out[:, :, 3] == 0) == hit).all()


def test_trns_malformed_null_routes():
    from wde_spark.operators.png_codec import encode_png_palette

    # tRNS alongside an alpha channel is invalid per spec
    rgba = _rand((5, 5, 4), seed=3)
    body = encode_png(rgba)
    assert decode_png(
        body[:33] + _chunk(b"tRNS", b"\x00\x01") + body[33:]) is None
    # wrong-length gray/RGB tRNS
    g = _rand((4, 4), seed=4)
    body = encode_png(g)
    assert decode_png(
        body[:33] + _chunk(b"tRNS", b"\x00\x01\x02") + body[33:]) is None
    # palette tRNS longer than the palette
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    blob = encode_png_palette(px)  # 1-entry palette
    # splice an oversized tRNS right before IDAT: rebuild chunk layout
    magic_ihdr = blob[:33]
    plte_len = struct.unpack(">I", blob[33:37])[0]
    plte_end = 33 + 12 + plte_len
    bad = magic_ihdr + blob[33:plte_end] \
        + _chunk(b"tRNS", b"\x00\x01") + blob[plte_end:]
    assert decode_png(bad) is None


def test_palette_encoder_contract_errors():
    from wde_spark.operators.png_codec import encode_png_palette

    i = np.arange(300)
    big = np.stack([i % 256, i // 256, np.zeros_like(i)], axis=1) \
        .astype(np.uint8).reshape(15, 20, 3)
    with pytest.raises(ValueError, match="256"):
        encode_png_palette(big)
    with pytest.raises(ValueError, match="alpha"):
        encode_png_palette(
            np.zeros((2, 2, 3), np.uint8),
            alpha=np.array([[0, 255], [255, 255]], np.uint8))
    with pytest.raises(ValueError, match="RGB"):
        encode_png_palette(np.zeros((2, 2), np.uint8))


def test_encode_png_auto_tier_selection():
    from wde_spark.operators.png_codec import (encode_png_auto,
                                               encode_png_palette)

    rng = np.random.RandomState(11)
    # low-cardinality RGB -> indexed tier (byte-identical to the palette
    # encoder), and smaller than truecolor
    px = (rng.randint(0, 4, (9, 9, 1)) * 60).repeat(3, axis=2) \
        .astype(np.uint8)
    auto = encode_png_auto(px)
    assert auto == encode_png_palette(px)
    assert b"PLTE" in auto and len(auto) < len(encode_png(px))
    w, h, ch, out = decode_png(auto)
    assert ch == 3 and (out == px).all()
    # RGBA with one alpha per color -> indexed + tRNS, alpha survives
    alpha = np.where(px[:, :, 0] == 0, 0, 255).astype(np.uint8)
    rgba = np.dstack([px, alpha])
    auto = encode_png_auto(rgba)
    assert b"tRNS" in auto
    w, h, ch, out = decode_png(auto)
    assert ch == 4 and (out[:, :, 3] == alpha).all()
    # RGBA where one color carries two alphas -> truecolor fallback
    bad_alpha = alpha.copy()
    bad_alpha[0, 0] = 255 - int(bad_alpha[0, 0])
    # ensure the flipped pixel shares its color with another pixel
    px2 = px.copy()
    px2[0, 0] = px2[0, 1]
    auto = encode_png_auto(np.dstack([px2, bad_alpha]))
    assert b"PLTE" not in auto
    w, h, ch, out = decode_png(auto)
    assert ch == 4 and (out[:, :, 3] == bad_alpha).all()
    # high-cardinality RGB -> truecolor fallback
    i = np.arange(300)
    big = np.stack([i % 256, i // 256, np.zeros_like(i)], axis=1) \
        .astype(np.uint8).reshape(15, 20, 3)
    assert b"PLTE" not in encode_png_auto(big)
    # grayscale stays on the truecolor path untouched
    g = _rand((5, 5), seed=12)
    assert encode_png_auto(g) == encode_png(g)


def test_vectorized_encode_filters_match_per_row_reference():
    """r13: the encode-side scanline filters run whole-image vectorized;
    this pins every filter type bitwise against the per-row reference
    they replaced, via full encode->decode roundtrips on random
    gray/RGB/RGBA content (the decoder's unfilter is the per-row
    ground truth)."""
    import numpy as np

    from wde_spark.operators.png_codec import decode_png, encode_png

    rng = np.random.RandomState(88)
    for ft in range(5):
        for ch in (1, 3, 4):
            h, w = int(rng.randint(1, 25)), int(rng.randint(1, 25))
            shape = (h, w) if ch == 1 else (h, w, ch)
            px = rng.randint(0, 256, size=shape).astype(np.uint8)
            decoded = decode_png(encode_png(px, filter_type=ft))
            assert decoded is not None
            got = decoded[3]
            want = px if ch > 1 else px[:, :, None]
            assert np.array_equal(got, want), (ft, ch)
