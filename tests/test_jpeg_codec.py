"""Baseline JPEG codec (`operators/jpeg_codec.py`): the integer-exact
DC-only tier (the driver oracle's contract), bounded-error round-trips
on general AC content, entropy-layer structure (DPCM across tiles, ZRL,
byte stuffing), marker parsing, and null-routes for the declared
out-of-scope modes.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from wde_spark.operators.jpeg_codec import (decode_jpeg_gray,
                                            encode_jpeg_gray, is_jpeg,
                                            quant_table)


def _tiled(bh, bw, seed):
    tiles = np.random.RandomState(seed).randint(
        0, 256, (bh, bw)).astype(np.uint8)
    return tiles, np.kron(tiles, np.ones((8, 8), np.uint8))


def test_dc_only_tier_is_integer_exact():
    """Constant 8x8 tiles at quality 50 decode to EXACTLY
    min(2*floor((v-127)/2) + 128, 255) — the closed form the SQL oracle
    replays. Every byte value is hit across the trials."""
    seen = set()
    for seed in range(40):
        bh, bw = seed % 5 + 1, seed % 7 + 1
        tiles, img = _tiled(bh, bw, seed)
        seen.update(int(v) for v in tiles.reshape(-1))
        w, h, px = decode_jpeg_gray(encode_jpeg_gray(img, quality=50))
        assert (w, h) == (bw * 8, bh * 8)
        v = tiles.astype(np.int64)
        want = np.minimum(2 * ((v - 127) // 2) + 128, 255)
        assert np.array_equal(
            px.astype(np.int64), np.kron(want, np.ones((8, 8), np.int64)))
    assert len(seen) > 200  # formula exercised across the byte range
    # explicit half-boundary values (odd DC sums): exactness is the
    # point of computing F(0,0) as sum/8
    for v in (1, 127, 129, 163, 179, 255, 0):
        img = np.full((8, 8), v, np.uint8)
        _, _, px = decode_jpeg_gray(encode_jpeg_gray(img, 50))
        assert int(px[0, 0]) == min(2 * ((v - 127) // 2) + 128, 255), v


@pytest.mark.parametrize("quality", [50, 75, 90])
def test_general_content_bounded_error_and_crop(quality):
    rng = np.random.RandomState(quality)
    for _ in range(8):
        h, w = int(rng.randint(5, 60)), int(rng.randint(5, 60))
        gy = np.add.outer(np.arange(h) * 3, np.arange(w) * 2) % 256
        img = ((gy + rng.randint(0, 8, (h, w))) % 256).astype(np.uint8)
        dw, dh, px = decode_jpeg_gray(encode_jpeg_gray(img, quality))
        assert (dw, dh) == (w, h)  # non-multiple-of-8 dims crop back
        assert np.abs(px.astype(int) - img.astype(int)).max() <= 48


def test_entropy_layer_structure():
    """Byte stuffing (0xFF00) occurs and round-trips; a checkerboard
    exercises high-frequency AC codes incl. ZRL runs."""
    rng = np.random.RandomState(0)
    img = (rng.randint(0, 2, (24, 24)) * 255).astype(np.uint8)
    enc = encode_jpeg_gray(img, quality=95)
    scan = enc[enc.index(b"\xFF\xDA") + 2:]
    assert b"\xFF\x00" in scan  # stuffing happened somewhere in the run
    dw, dh, px = decode_jpeg_gray(enc)
    assert np.abs(px.astype(int) - img.astype(int)).max() <= 16


def test_quality_scaling():
    assert (quant_table(50) == quant_table(50)).all()
    assert quant_table(50)[0, 0] == 16  # the exact-tier anchor
    assert (quant_table(90) <= quant_table(50)).all()
    assert (quant_table(10) >= quant_table(50)).all()
    assert quant_table(100).min() >= 1


def test_null_routes_outside_declared_support():
    img = np.zeros((8, 8), np.uint8)
    enc = encode_jpeg_gray(img)
    assert is_jpeg(enc) and not is_jpeg(b"\x89PNG")
    assert decode_jpeg_gray(b"\xFF\xD8junk") is None
    assert decode_jpeg_gray(enc[:-2]) is None       # missing EOI
    assert decode_jpeg_gray(enc[:30]) is None       # truncated headers
    # progressive SOF2 must null-route
    prog = bytearray(enc)
    prog[enc.index(b"\xFF\xC0") + 1] = 0xC2
    assert decode_jpeg_gray(bytes(prog)) is None
    # 3-component claim must null-route (grayscale tier only)
    sof = enc.index(b"\xFF\xC0")
    color = bytearray(enc)
    color[sof + 9] = 3
    assert decode_jpeg_gray(bytes(color)) is None
    # restart intervals are SUPPORTED now (an interval larger than the
    # MCU count simply never fires); 4:2:2 sampling is not — null-route
    dri = (b"\xFF\xDD" + struct.pack(">H", 4) + struct.pack(">H", 4))
    assert decode_jpeg_gray(enc[:2] + dri + enc[2:]) is not None
    s422 = bytearray(enc)
    s422[sof + 11] = 0x21  # the sampling byte of component 1
    assert decode_jpeg_gray(bytes(s422)) is None


def test_attach_jpegs_stats_dispatch(spark):
    from wde_spark.operators import multimodal as MM

    docs = spark.createDataFrame(
        [(0, "abc"), (1, "")], "doc_id long, text string")
    rows = {r["media_id"]: r
            for r in MM.image_rgba_stats(MM.attach_jpegs(docs)).collect()}
    b = np.frombuffer(b"abc", np.uint8)
    wb, hb = 3 % 6 + 2, 3 % 4 + 2
    v = b[np.arange(wb * hb) % 3].astype(np.int64)
    want = np.minimum(2 * ((v - 127) // 2) + 128, 255)
    assert rows[0]["channels"] == 1
    assert rows[0]["width"] == wb * 8 and rows[0]["height"] == hb * 8
    assert rows[0]["px_sum"] == int(want.sum()) * 64
    # empty text: all-zero tiles decode to 0 exactly
    assert rows[1]["px_sum"] == 0


# --- color (YCbCr 4:4:4) tier --------------------------------------------


def test_color_tiled_tier_is_integer_exact():
    """Constant RGB tiles at quality 50: decoded pixels equal the pure
    integer composition ycbcr_to_rgb(dequant(quant(rgb_to_ycbcr(v)))) —
    the SQL oracle's formula chain."""
    from wde_spark.operators.jpeg_codec import (decode_jpeg_rgb,
                                                encode_jpeg_rgb,
                                                rgb_to_ycbcr,
                                                ycbcr_to_rgb)

    rng = np.random.RandomState(23)
    for trial in range(30):
        bh, bw = int(rng.randint(1, 5)), int(rng.randint(1, 6))
        t = rng.randint(0, 256, (bh, bw, 3)).astype(np.uint8)
        img = np.kron(t, np.ones((8, 8, 1), np.uint8))
        w, h, out = decode_jpeg_rgb(encode_jpeg_rgb(img, 50))
        assert (w, h) == (bw * 8, bh * 8)
        ycc = rgb_to_ycbcr(t).astype(np.int64)
        dec = np.minimum(2 * ((ycc - 127) // 2) + 128, 255).astype(
            np.uint8)
        want = np.kron(ycbcr_to_rgb(dec), np.ones((8, 8, 1), np.uint8))
        assert np.array_equal(out, want), trial


def test_color_transform_fixed_point_properties():
    """Forward/inverse are integer-deterministic and near-inverse
    (|round trip - identity| <= 2 per channel across the full cube
    sample)."""
    from wde_spark.operators.jpeg_codec import rgb_to_ycbcr, ycbcr_to_rgb

    g = np.arange(0, 256, 15)
    r, gg, b = np.meshgrid(g, g, g, indexing="ij")
    rgb = np.stack([r, gg, b], axis=-1).astype(np.uint8)
    back = ycbcr_to_rgb(rgb_to_ycbcr(rgb))
    assert np.abs(back.astype(int) - rgb.astype(int)).max() <= 2


def test_color_general_content_bounded_error():
    from wde_spark.operators.jpeg_codec import (decode_jpeg_rgb,
                                                encode_jpeg_rgb)

    rng = np.random.RandomState(7)
    h, w = 37, 29
    g = np.add.outer(np.arange(h) * 2, np.arange(w) * 3) % 256
    img = np.stack([g, (g + 40) % 256, (g + 90) % 256],
                   axis=2).astype(np.uint8)
    dw, dh, out = decode_jpeg_rgb(encode_jpeg_rgb(img, 90))
    assert (dw, dh) == (w, h)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 48


def test_color_gray_api_boundaries():
    from wde_spark.operators.jpeg_codec import (decode_jpeg_rgb,
                                                encode_jpeg_rgb)

    gray = encode_jpeg_gray(np.zeros((8, 8), np.uint8))
    color = encode_jpeg_rgb(np.zeros((8, 8, 3), np.uint8))
    assert decode_jpeg_rgb(gray) is None
    assert decode_jpeg_gray(color) is None
    assert decode_jpeg_rgb(color) is not None


def test_n_components_probe():
    """The SOF-only probe routes gray/color WITHOUT a scan decode and
    null-routes garbage — the stats-kernel dispatch contract."""
    from wde_spark.operators.jpeg_codec import (encode_jpeg_gray,
                                                encode_jpeg_rgb,
                                                jpeg_n_components)

    gray = encode_jpeg_gray(np.arange(64, dtype=np.uint8).reshape(8, 8))
    color = encode_jpeg_rgb(np.zeros((8, 8, 3), np.uint8))
    assert jpeg_n_components(gray) == 1
    assert jpeg_n_components(color) == 3
    assert jpeg_n_components(b"\xFF\xD8junk") is None
    assert jpeg_n_components(gray[:20]) is None  # truncated before SOF
    assert jpeg_n_components(b"notajpeg") is None
    # progressive SOF2 → no baseline SOF0 → probe declines, matching
    # the decoders
    prog = bytearray(gray)
    prog[prog.index(b"\xFF\xC0", 2) + 1] = 0xC2
    assert jpeg_n_components(bytes(prog)) is None


def test_attach_jpegs_color_stats(spark):
    from wde_spark.operators import multimodal as MM
    from wde_spark.operators.jpeg_codec import rgb_to_ycbcr, ycbcr_to_rgb

    docs = spark.createDataFrame(
        [(0, "abc")], "doc_id long, text string")
    row = MM.image_rgba_stats(MM.attach_jpegs_color(docs)).collect()[0]
    b = np.frombuffer(b"abc", np.uint8)
    wb, hb = 3 % 5 + 2, 3 % 3 + 2
    t = np.arange(wb * hb)
    tiles = np.stack([b[t % 3], b[(t + 1) % 3], b[(t + 2) % 3]],
                     axis=1).reshape(hb, wb, 3)
    ycc = rgb_to_ycbcr(tiles).astype(np.int64)
    dec = np.minimum(2 * ((ycc - 127) // 2) + 128, 255).astype(np.uint8)
    want = ycbcr_to_rgb(dec).astype(np.int64)
    assert row["channels"] == 3
    assert row["px_sum"] == int(want.sum()) * 64


# --- 4:2:0 subsampling + restart intervals -------------------------------


def test_420_macro_tiles_exact_across_restart_intervals():
    """Constant 16x16 macro-tiles at quality 50 decode to the same
    integer formula chain as 4:4:4 (the subsample/upsample pair is
    identity on constant chroma) — with restart 0, 1, and 2 (RSTn sync
    + predictor resets included)."""
    from wde_spark.operators.jpeg_codec import (decode_jpeg_rgb,
                                                encode_jpeg_420,
                                                rgb_to_ycbcr,
                                                ycbcr_to_rgb)

    rng = np.random.RandomState(29)
    for trial in range(24):
        bh, bw = int(rng.randint(1, 4)), int(rng.randint(1, 5))
        t = rng.randint(0, 256, (bh, bw, 3)).astype(np.uint8)
        img = np.kron(t, np.ones((16, 16, 1), np.uint8))
        enc = encode_jpeg_420(img, 50, restart=trial % 3)
        w, h, out = decode_jpeg_rgb(enc)
        assert (w, h) == (bw * 16, bh * 16)
        ycc = rgb_to_ycbcr(t).astype(np.int64)
        dec = np.minimum(2 * ((ycc - 127) // 2) + 128, 255).astype(
            np.uint8)
        want = np.kron(ycbcr_to_rgb(dec), np.ones((16, 16, 1), np.uint8))
        assert np.array_equal(out, want), trial


def test_420_general_content_bounded_and_cropped():
    from wde_spark.operators.jpeg_codec import (decode_jpeg_rgb,
                                                encode_jpeg_420)

    rng = np.random.RandomState(31)
    for _ in range(5):
        h, w = int(rng.randint(5, 40)), int(rng.randint(5, 40))
        g = np.clip(np.add.outer(np.arange(h) * 2, np.arange(w) * 2),
                    0, 200)
        img = np.stack([g, np.clip(g + 30, 0, 255),
                        np.clip(g + 55, 0, 255)], axis=2).astype(np.uint8)
        dw, dh, out = decode_jpeg_rgb(encode_jpeg_420(img, 90, restart=2))
        assert (dw, dh) == (w, h)  # non-multiple-of-16 dims crop back
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 48


def test_restart_marker_discipline():
    """Mis-sequenced or missing RSTn must null-route, never desync
    silently; byte stuffing around the aligned markers survives."""
    from wde_spark.operators.jpeg_codec import (decode_jpeg_rgb,
                                                encode_jpeg_420)

    rng = np.random.RandomState(3)
    t = rng.randint(0, 256, (2, 3, 3)).astype(np.uint8)
    img = np.kron(t, np.ones((16, 16, 1), np.uint8))
    enc = encode_jpeg_420(img, 50, restart=1)
    assert decode_jpeg_rgb(enc) is not None
    i = enc.find(b"\xFF\xD0")
    assert i > 0
    bad = bytearray(enc)
    bad[i + 1] = 0xD5  # out-of-sequence restart number
    assert decode_jpeg_rgb(bytes(bad)) is None


def test_attach_jpegs_420_stats(spark):
    from wde_spark.operators import multimodal as MM
    from wde_spark.operators.jpeg_codec import rgb_to_ycbcr, ycbcr_to_rgb

    docs = spark.createDataFrame(
        [(0, "abcdefgh"), (1, "abcdefgh"), (2, "abcdefgh")],
        "doc_id long, text string")
    rows = {r["media_id"]: r for r in
            MM.image_rgba_stats(MM.attach_jpegs_420(docs)).collect()}
    b = np.frombuffer(b"abcdefgh", np.uint8)
    wb, hb = 8 % 4 + 1, 8 % 3 + 1
    t = np.arange(wb * hb)
    tiles = np.stack([b[t % 8], b[(t + 3) % 8], b[(t + 6) % 8]],
                     axis=1).reshape(hb, wb, 3)
    ycc = rgb_to_ycbcr(tiles).astype(np.int64)
    dec = np.minimum(2 * ((ycc - 127) // 2) + 128, 255).astype(np.uint8)
    want = int(ycbcr_to_rgb(dec).astype(np.int64).sum()) * 256
    # all three restart settings (doc_id % 3) decode identically
    for mid in (0, 1, 2):
        assert rows[mid]["px_sum"] == want
        assert rows[mid]["channels"] == 3


def test_restart_segment_split_roundtrip():
    """split → per-segment decode → reassemble is byte-identical to the
    whole-file sequential decode, across interval sizes and both
    subsampling modes — the equivalence that makes segment-parallel
    decode safe (T.81: DC predictors reset at every RSTn)."""
    from wde_spark.operators.jpeg_codec import (
        _decode_jfif, decode_restart_segment, encode_jpeg_420,
        reassemble_segments, split_restart_segments)

    rng = np.random.RandomState(11)
    t = rng.randint(0, 256, (4, 5, 3)).astype(np.uint8)
    img = np.kron(t, np.ones((16, 16, 1), np.uint8))  # 64x80
    for restart in (1, 3, 7, 20):
        enc = encode_jpeg_420(img, 50, restart=restart)
        whole = _decode_jfif(enc)
        assert whole is not None
        sp = split_restart_segments(enc)
        assert sp is not None
        w, h, q, specs, samplings, rst, segs = sp
        assert rst == restart
        total = ((w + 15) // 16) * ((h + 15) // 16)
        assert len(segs) == (total + restart - 1) // restart
        blocks = [decode_restart_segment(
            s, min(restart, total - i * restart), q, specs, samplings)
            for i, s in enumerate(segs)]
        planes = reassemble_segments(w, h, samplings, restart, blocks)
        for a, b in zip(whole[3], planes):
            assert np.array_equal(a, b)


def test_restart_split_null_routes():
    """No DRI, mis-sequenced RSTn, or truncation → None, matching the
    sequential decoder's honesty."""
    from wde_spark.operators.jpeg_codec import (encode_jpeg_420,
                                                split_restart_segments)

    img = np.zeros((32, 32, 3), np.uint8)
    no_dri = encode_jpeg_420(img, 50, restart=0)
    assert split_restart_segments(no_dri) is None
    enc = encode_jpeg_420(np.kron(
        np.arange(12, dtype=np.uint8).reshape(2, 2, 3),
        np.ones((16, 16, 1), np.uint8)), 50, restart=1)
    i = enc.find(b"\xFF\xD0")
    bad = bytearray(enc)
    bad[i + 1] = 0xD4
    assert split_restart_segments(bytes(bad)) is None
    assert split_restart_segments(enc[:-2]) is None  # EOI gone


def test_restart_distributed_decode_equals_sequential(spark):
    """The Spark mapInPandas fan-out reproduces the sequential decode
    exactly — full planes, both coarse and fine task granularity."""
    from wde_spark.operators.jpeg_codec import _decode_jfif, encode_jpeg_420
    from wde_spark.operators.multimodal import (
        decode_jpeg_restart_distributed)

    rng = np.random.RandomState(7)
    t = rng.randint(0, 256, (3, 4, 3)).astype(np.uint8)
    img = np.kron(t, np.ones((16, 16, 1), np.uint8))  # 48x64
    enc = encode_jpeg_420(img, 75, restart=2)
    whole = _decode_jfif(enc)
    for spt in (1, 4):
        got = decode_jpeg_restart_distributed(spark, enc,
                                              segments_per_task=spt)
        assert got is not None
        w, h, nc, planes = got
        assert (w, h, nc) == (whole[0], whole[1], whole[2])
        for a, b in zip(whole[3], planes):
            assert np.array_equal(a, b)
    # no restart interval → honest None
    assert decode_jpeg_restart_distributed(
        spark, encode_jpeg_420(img, 75, restart=0)) is None


def test_segment_parallel_stats_equal_whole_file(spark):
    """The distributed pipeline (split -> per-segment decode -> one
    reassembly shuffle) produces the IDENTICAL stats row as the
    whole-file stats kernel on the same DRI fixtures — the registry
    query's equivalence contract."""
    from wde_spark.operators import multimodal as MM

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["hello world", "", "a much longer text payload 123", "x"])],
        "doc_id long, text string")
    media = MM.attach_jpegs_420_dri(docs)
    whole = {r["media_id"]: tuple(r)
             for r in MM.image_rgba_stats(media).collect()}
    par = {r["media_id"]: tuple(r)
           for r in MM.segment_parallel_rgba_stats(media).collect()}
    assert set(par) == set(whole) == {0, 1, 2, 3}
    assert par == whole


def _corrupt_first_segment(enc: bytes) -> bytes:
    """Replace segment 0's entropy bytes with a single 0x00 — the scan
    stays structurally valid (markers, counts, sequence all intact, so
    `split_restart_segments` accepts it) but the segment can no longer
    decode its MCUs (bitstream exhaustion)."""
    from wde_spark.operators.jpeg_codec import _parse_scan_params

    scan_pos = _parse_scan_params(enc)[6]
    rst = enc.find(b"\xFF\xD0", scan_pos)
    assert rst > scan_pos
    return enc[:scan_pos] + b"\x00" + enc[rst:]


def test_corrupt_segment_null_routes_whole_media(spark):
    """ADVICE r10 (medium): a payload whose entropy data is corrupt but
    structurally splittable must DROP its whole media_id from
    `segment_parallel_rgba_stats` — never fail the job, never
    reassemble a partial image — matching image_rgba_stats' contract."""
    from wde_spark.operators import multimodal as MM
    from wde_spark.operators.jpeg_codec import split_restart_segments

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["hello world", "", "a much longer text payload 123", "x"])],
        "doc_id long, text string")
    rows = MM.attach_jpegs_420_dri(docs).collect()
    tampered = []
    for r in rows:
        payload = bytes(r["payload"])
        if r["media_id"] == 2:
            payload = _corrupt_first_segment(payload)
            assert split_restart_segments(payload) is not None
        tampered.append((r["media_id"], payload))
    media = spark.createDataFrame(tampered, "media_id long, payload binary")
    par = {r["media_id"]: tuple(r)
           for r in MM.segment_parallel_rgba_stats(media).collect()}
    assert set(par) == {0, 1, 3}  # media 2 dropped whole, job survived
    clean = spark.createDataFrame(
        [t for t in tampered if t[0] != 2], "media_id long, payload binary")
    whole = {r["media_id"]: tuple(r)
             for r in MM.image_rgba_stats(clean).collect()}
    assert par == whole


def test_restart_distributed_corrupt_and_pixel_cap(spark):
    """The driver-side utility null-routes a corrupt segment to None
    (same contract as _decode_jfif) and refuses images whose decoded
    blocks would exceed max_pixels on the driver."""
    from wde_spark.operators.jpeg_codec import encode_jpeg_420
    from wde_spark.operators.multimodal import (
        decode_jpeg_restart_distributed)

    t = np.random.RandomState(3).randint(0, 256, (2, 3, 3)).astype(np.uint8)
    img = np.kron(t, np.ones((16, 16, 1), np.uint8))  # 32x48
    enc = encode_jpeg_420(img, 75, restart=1)
    assert decode_jpeg_restart_distributed(spark, enc) is not None
    assert decode_jpeg_restart_distributed(
        spark, _corrupt_first_segment(enc)) is None
    with pytest.raises(ValueError, match="max_pixels"):
        decode_jpeg_restart_distributed(spark, enc, max_pixels=100)


def test_batched_block_transforms_match_naive_reference():
    """r13: DCT/quantize and dequantize/IDCT run batched across all
    blocks of an image; this pins them bitwise against the naive
    per-block formulation they replaced (same ops, one block at a
    time) on random content."""
    import numpy as np

    from wde_spark.operators.jpeg_codec import (_ZIGZAG, _dct_matrix,
                                                _fdct_quant_blocks,
                                                _idct_blocks, quant_table)

    rng = np.random.RandomState(77)
    m = _dct_matrix()
    for quality in (10, 50, 90):
        q = quant_table(quality)
        blocks = rng.randint(0, 256, size=(37, 8, 8)).astype(np.uint8)
        zz, last = _fdct_quant_blocks(blocks, q)
        for i in range(blocks.shape[0]):
            blk = blocks[i].astype(np.float64) - 128.0
            coef = m @ blk @ m.T
            coef[0, 0] = blk.sum() / 8.0
            ref = np.floor(coef / q + 0.5).astype(np.int64).reshape(64)
            ref = ref[_ZIGZAG]
            assert np.array_equal(zz[i], ref), f"fdct block {i} q{quality}"
            nz = np.nonzero(ref[1:])[0]
            ref_last = int(nz[-1]) + 1 if nz.size else 0
            assert last[i] == ref_last
        # decode direction over the quantized coefficients
        px = _idct_blocks(zz.tolist(), q)
        for i in range(blocks.shape[0]):
            nat = np.zeros(64, dtype=np.int64)
            nat[_ZIGZAG] = zz[i]
            coef = nat.reshape(8, 8) * q
            blk = m.T @ coef.astype(np.float64) @ m
            ref_px = np.clip(np.floor(blk + 128.5), 0, 255).astype(np.uint8)
            assert np.array_equal(px[i], ref_px), f"idct block {i} q{quality}"
