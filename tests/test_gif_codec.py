"""GIF codec (`operators/gif_codec.py`): LZW round-trip property tests
(dictionary growth, width bumps, the 4096-entry clear-code reset, the
KwKwK case, the flush-boundary width bump), interlace permutation,
GIF89a transparency, malformed-input null-routing, and the Spark-side
integration through the container-sniffing `image_rgba_stats`.
"""

from __future__ import annotations

import numpy as np
import pytest

from wde_spark.operators.gif_codec import (_lzw_decode, _lzw_encode,
                                           decode_gif, encode_gif, is_gif)


def _quantized(h, w, ncol, seed):
    rng = np.random.RandomState(seed)
    pal = rng.randint(0, 256, (ncol, 3)).astype(np.uint8)
    pal = np.unique(pal, axis=0)  # duplicate rows would alias slots
    idx = rng.randint(0, pal.shape[0], (h, w))
    rgba = np.empty((h, w, 4), np.uint8)
    rgba[:, :, :3] = pal[idx]
    rgba[:, :, 3] = 255
    return rgba, idx


@pytest.mark.parametrize("interlace", [False, True])
@pytest.mark.parametrize("h,w,ncol", [(1, 1, 1), (5, 13, 1), (7, 9, 4),
                                      (33, 17, 16), (64, 40, 250)])
def test_gif_roundtrip(h, w, ncol, interlace):
    rgba, _ = _quantized(h, w, ncol, seed=h * w + ncol)
    out = decode_gif(encode_gif(rgba, interlace=interlace))
    assert out is not None
    gw, gh, px = out
    assert (gw, gh) == (w, h)
    assert np.array_equal(px, rgba)


def test_gif_transparency_expands_to_alpha():
    rgba, idx = _quantized(10, 12, 5, seed=3)
    rgba[idx == 0, 3] = 0
    out = decode_gif(encode_gif(rgba))
    assert out is not None and np.array_equal(out[2], rgba)
    # no GCE -> everything opaque
    opaque = rgba.copy()
    opaque[:, :, 3] = 255
    assert np.array_equal(decode_gif(encode_gif(opaque))[2], opaque)


def test_lzw_flush_boundary_width_bump():
    """65 identical pixels at mcs=2: the final flushed code lands the
    dictionary exactly on a width boundary, so EOI must be written one
    bit wider — the giflib lockstep rule this encoder reproduces."""
    idx = np.zeros(65, dtype=np.uint8)
    out = _lzw_decode(_lzw_encode(idx, 2), 2, 65)
    assert out is not None and (out == 0).all()


def test_lzw_4096_reset_and_kwkwk():
    """A long low-entropy stream drives the dictionary to the 12-bit cap
    (clear-code reset mid-stream) and hits the KwKwK next-code case."""
    rng = np.random.RandomState(0)
    idx = np.repeat(rng.randint(0, 4, 30000), rng.randint(1, 6, 30000)
                    )[:60000].astype(np.uint8)
    out = _lzw_decode(_lzw_encode(idx, 2), 2, idx.shape[0])
    assert out is not None and np.array_equal(out, idx)


def test_lzw_decode_rejects_derailed_streams():
    idx = np.arange(16, dtype=np.uint8) % 4
    good = _lzw_encode(idx, 2)
    assert _lzw_decode(good, 2, 16) is not None
    assert _lzw_decode(good, 2, 17) is None          # pixel underrun
    assert _lzw_decode(good, 2, 15) is None          # pixel overrun
    assert _lzw_decode(good[:2], 2, 16) is None      # truncated
    assert _lzw_decode(b"", 2, 1) is None
    assert _lzw_decode(good, 1, 16) is None          # mcs out of range


def test_decode_gif_null_routes_outside_surface():
    rgba, _ = _quantized(6, 6, 3, seed=1)
    good = encode_gif(rgba)
    assert is_gif(good)
    assert decode_gif(b"GIF89a" + b"\x00" * 10) is None   # truncated
    assert decode_gif(b"\x89PNG\r\n\x1a\n") is None       # wrong magic
    # animated: append a second image descriptor -> declared null-route
    animated = good[:-1] + good[good.index(b"\x2c", 13):]
    assert decode_gif(animated) is None


def test_encode_gif_contract_violations():
    bad = np.zeros((2, 2, 4), np.uint8)
    bad[:, :, 3] = 100  # alpha must be 0 or 255
    with pytest.raises(ValueError):
        encode_gif(bad)
    two_tr = np.zeros((1, 2, 4), np.uint8)
    two_tr[0, 1, 0] = 9  # two distinct alpha-0 colors
    with pytest.raises(ValueError):
        encode_gif(two_tr)


def test_attach_gifs_pixels_predictable_from_text(spark):
    from wde_spark.operators import multimodal as MM

    docs = spark.createDataFrame(
        [(0, "abc"), (1, "abc"), (2, "")], "doc_id long, text string")
    media = {r["media_id"]: bytes(r["payload"])
             for r in MM.attach_gifs(docs).collect()}
    b = np.frombuffer(b"abc", np.uint8)
    for mid in (0, 1):  # sequential and interlaced rows decode the same
        w, h, px = decode_gif(media[mid])
        assert (w, h) == (3 % 20 + 6, 3 % 14 + 6)
        j = (b[np.arange(w * h) % 3] % 16).reshape(h, w).astype(int)
        assert np.array_equal(px[:, :, 0], (j * 19) % 256)
        assert np.array_equal(px[:, :, 3], np.where(j == 0, 0, 255))
    w2, h2, px2 = decode_gif(media[2])  # empty text: all-transparent 0s
    assert (w2, h2) == (6, 6) and int(px2.sum()) == 0


def test_image_rgba_stats_dispatches_by_magic(spark):
    """One stats pass covers PNG and GIF payloads side by side; garbage
    drops."""
    from wde_spark.operators import multimodal as MM
    from wde_spark.operators.png_codec import encode_png

    rgba, _ = _quantized(4, 5, 3, seed=7)
    gif = encode_gif(rgba)
    png = encode_png(rgba[:, :, :3])
    media = spark.createDataFrame(
        [(1, bytearray(gif)), (2, bytearray(png)), (3, bytearray(b"x"))],
        "media_id long, payload binary")
    rows = {r["media_id"]: r for r in MM.image_rgba_stats(media).collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["channels"] == 4
    assert rows[1]["px_sum"] == int(rgba.astype("int64").sum())


# --- animated API: decode_gif_frames / encode_gif_animated ---------------


def _ref_composite(patches, w, h):
    """Independent compositor for the property tests."""
    canvas = np.zeros((h, w, 4), np.uint8)
    outs = []
    for left, top, rgba, disposal in patches:
        ih, iw, _ = rgba.shape
        before = canvas[top:top + ih, left:left + iw].copy()
        m = rgba[:, :, 3] == 255
        canvas[top:top + ih, left:left + iw][m] = rgba[m]
        outs.append(canvas.copy())
        if disposal == 2:
            canvas[top:top + ih, left:left + iw] = 0
        elif disposal == 3:
            canvas[top:top + ih, left:left + iw] = before
    return np.stack(outs)


def test_animated_compositing_all_disposals():
    """Random multi-frame clips with partial rects, transparency,
    interlaced odd frames, and disposal 0-3 match an independent
    compositor exactly."""
    from wde_spark.operators.gif_codec import (decode_gif_frames,
                                               encode_gif_animated)

    rng = np.random.RandomState(21)
    for trial in range(60):
        w = int(rng.randint(4, 25))
        h = int(rng.randint(4, 20))
        pal = np.unique(rng.randint(0, 256, (6, 3)).astype(np.uint8),
                        axis=0)
        patches = []
        for _f in range(int(rng.randint(1, 5))):
            iw = int(rng.randint(1, w + 1))
            ih = int(rng.randint(1, h + 1))
            left = int(rng.randint(0, w - iw + 1))
            top = int(rng.randint(0, h - ih + 1))
            idx = rng.randint(0, pal.shape[0], (ih, iw))
            rgba = np.empty((ih, iw, 4), np.uint8)
            rgba[:, :, :3] = pal[idx]
            rgba[:, :, 3] = 255
            rgba[idx == 0, :3] = pal[0]
            rgba[idx == 0, 3] = 0
            patches.append((left, top, rgba, int(rng.randint(0, 4))))
        enc = encode_gif_animated(patches, w, h,
                                  interlace_odd=(trial % 2 == 0))
        dec = decode_gif_frames(enc)
        assert dec is not None, trial
        assert np.array_equal(dec[2], _ref_composite(patches, w, h)), trial


def test_animated_null_routes_and_single_image_contract():
    from wde_spark.operators.gif_codec import (decode_gif_frames,
                                               encode_gif_animated)

    rgba = np.zeros((5, 6, 4), np.uint8)
    rgba[:, :, 3] = 255
    two = encode_gif_animated([(0, 0, rgba, 0), (0, 0, rgba, 0)], 6, 5)
    assert decode_gif(two) is None            # single-image API refuses
    assert decode_gif_frames(two) is not None
    # partial-rect single frame: animated API accepts, single refuses
    part = encode_gif_animated([(1, 1, rgba[:3, :3], 0)], 6, 5)
    assert decode_gif(part) is None
    w, h, fr = decode_gif_frames(part)
    assert fr.shape == (1, 5, 6, 4)
    assert int(fr[0, 0, 0].sum()) == 0        # outside the rect: clear


def test_attach_animated_gifs_composited_canvas_predictable(spark):
    from wde_spark.operators import multimodal as MM

    docs = spark.createDataFrame(
        [(0, "abcd"), (1, "")], "doc_id long, text string")
    rows = {(r["media_id"], r["frame_idx"]): r
            for r in MM.animation_frame_stats(
                MM.attach_animated_gifs(docs)).collect()}
    # doc 0: L=4 -> W=14, H=14, nf=3; replay the builder + compositor
    data = b"abcd"
    b = np.frombuffer(data, np.uint8)
    W, H, nf = 14, 14, 3
    patches = []
    for g in range(nf):
        left, top = (3 * g) % (W - 3), (2 * g) % (H - 3)
        iw, ih = min(W - left, 4 % 7 + 3), min(H - top, 4 % 5 + 3)
        p = np.arange(iw * ih)
        j = (b[(p + 11 * g) % 4] % 16).reshape(ih, iw).astype(np.uint16)
        rgba = np.dstack([(j * 19) % 256, (j * 37) % 256, (j * 53) % 256,
                          np.where(j == 0, 0, 255)]).astype(np.uint8)
        patches.append((left, top, rgba, 1))
    want = _ref_composite(patches, W, H)
    for f in range(nf):
        assert rows[(0, f)]["px_sum"] == int(want[f].astype("int64").sum())
        assert rows[(0, f)]["width"] == W
    # empty text: fully transparent canvas in both frames
    assert rows[(1, 0)]["px_sum"] == 0 and rows[(1, 1)]["px_sum"] == 0


def test_animated_aggregate_decode_cap():
    """frames x canvas beyond the pixel budget null-routes — a crafted
    small payload must not OOM the worker."""
    from wde_spark.operators.gif_codec import (decode_gif_frames,
                                               encode_gif_animated)

    # 5000x5000 canvas (25M px, under the per-canvas cap) with 4 tiny
    # patches -> 100M snapshot pixels, over the aggregate budget
    tiny = np.zeros((1, 1, 4), np.uint8)
    tiny[:, :, 3] = 255
    enc = encode_gif_animated([(0, 0, tiny, 0)] * 4, 5000, 5000)
    assert decode_gif_frames(enc) is None
    # same patches on a small canvas decode fine
    enc = encode_gif_animated([(0, 0, tiny, 0)] * 4, 8, 8)
    assert decode_gif_frames(enc) is not None
