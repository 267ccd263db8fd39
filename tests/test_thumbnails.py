"""PNG encode path through the resize kernel (`multimodal.resize_images`):
thumbnail geometry matches `resize_meta` arithmetic, the re-encoded bytes
decode back to exactly the nearest-neighbor downsample, non-PNG payloads
null-route, and RGB images survive the path channel-correct.
"""

from __future__ import annotations

import numpy as np

from wde_spark.operators.png_codec import decode_png, encode_png


def _nn(px: np.ndarray, tw: int, th: int) -> np.ndarray:
    h, w = px.shape[:2]
    ys = (np.arange(th) * h) // th
    xs = (np.arange(tw) * w) // tw
    return px[ys][:, xs]


def test_resize_images_matches_reference_nn(spark):
    from wde_spark.operators import multimodal as MM

    rng = np.random.default_rng(7)
    rows = []
    expect = {}
    for mid, (w, h) in enumerate([(32, 20), (9, 40), (8, 8), (300, 5)]):
        px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        scale = min(8 / w, 8 / h, 1.0)
        tw, th = max(1, int(w * scale)), max(1, int(h * scale))
        expect[mid] = (w, h, tw, th, _nn(px, tw, th))
        rows.append((mid, bytearray(encode_png(px))))
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in MM.resize_images(media).collect()}
    assert set(got) == set(expect)
    for mid, (w, h, tw, th, ref) in expect.items():
        r = got[mid]
        assert (r["src_w"], r["src_h"], r["width"], r["height"]) \
            == (w, h, tw, th)
        dec = decode_png(bytes(r["thumb"]))
        assert dec is not None and (dec[0], dec[1]) == (tw, th)
        assert np.array_equal(dec[3][:, :, 0], ref)


def test_resize_images_rgb_channel_correct(spark):
    from wde_spark.operators import multimodal as MM

    px = np.zeros((16, 24, 3), dtype=np.uint8)
    px[:, :, 0] = 200  # red-dominant
    px[:, :, 2] = np.arange(24, dtype=np.uint8)[None, :]
    media = spark.createDataFrame(
        [(1, bytearray(encode_png(px)))], "media_id long, payload binary")
    r = MM.resize_images(media).collect()[0]
    dec = decode_png(bytes(r["thumb"]))
    assert dec is not None and dec[2] == 3
    assert np.array_equal(dec[3], _nn(px, r["width"], r["height"]))


def test_resize_images_null_routes_non_png(spark):
    from wde_spark.operators import multimodal as MM

    media = spark.createDataFrame(
        [(1, bytearray(b"plain text payload"))],
        "media_id long, payload binary")
    r = MM.resize_images(media).collect()[0]
    assert r["thumb"] is None and r["width"] == -1
    # and the stats verify pass drops it rather than crashing
    assert MM.thumbnail_stats(MM.resize_images(media)).count() == 0


def test_attach_images_pixels_predictable_from_text(spark):
    """The fixture contract the SQL oracle relies on: pixel i of the
    source image = text byte (i mod L); empty text → all-zero 8x8."""
    from wde_spark.operators import multimodal as MM

    docs = spark.createDataFrame(
        [(1, "xyz"), (2, "")], "doc_id long, text string")
    got = {r["media_id"]: bytes(r["payload"])
           for r in MM.attach_images(docs).collect()}
    b = b"xyz"
    w, h = len(b) % 24 + 8, len(b) % 16 + 8
    dec = decode_png(got[1])
    assert dec is not None and (dec[0], dec[1]) == (w, h)
    flat = dec[3].reshape(-1)
    assert all(int(flat[i]) == b[i % len(b)] for i in range(w * h))
    dec0 = decode_png(got[2])
    assert dec0 is not None and (dec0[0], dec0[1]) == (8, 8)
    assert int(dec0[3].sum()) == 0
