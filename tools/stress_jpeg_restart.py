"""Segment-parallel JPEG restart-decode receipt.

The codec tier's 100 TB claim: a DRI-bearing baseline JPEG is NOT a
one-core bitstream crawl — T.81 byte-aligns the RSTn markers and resets
the DC predictors at each, so the scan splits at byte boundaries with
zero entropy work and the segments decode independently. This driver
synthesizes a large 4:2:0 restart JPEG, decodes it (a) whole-file
sequentially and (b) segment-parallel over Spark mapInPandas
(`multimodal.decode_jpeg_restart_distributed`), asserts the planes are
byte-identical, and records wall times.

Usage: python tools/stress_jpeg_restart.py [side_px ...]
Prints one JSON line (pipe to measurements/).
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wde_spark.core.session import get_session
from wde_spark.operators.jpeg_codec import _decode_jfif, encode_jpeg_420
from wde_spark.operators.multimodal import decode_jpeg_restart_distributed


def main() -> None:
    sides = [int(a) for a in sys.argv[1:]] or [512, 1024]
    spark = get_session("stress-jpeg-restart")
    # warm the FULL Python worker pool once, untimed — a steady-state
    # cluster has warm executors; the receipt times the steady state
    # (256 one-MCU segments of constant content touch every worker)
    wimg = np.zeros((256, 256, 3), np.uint8)
    decode_jpeg_restart_distributed(spark, encode_jpeg_420(
        wimg, 50, restart=1))
    runs = []
    for side in sides:
        rng = np.random.RandomState(side)
        # per-pixel noise: worst-case AC entropy density, so the receipt
        # times the real Huffman+IDCT cost, not a degenerate DC-only run
        img = rng.randint(0, 256, (side, side, 3)).astype(np.uint8)
        mcus_per_row = side // 16
        # one restart segment per MCU row — the natural parallel grain
        enc = encode_jpeg_420(img, 50, restart=mcus_per_row)
        # min over repeats on both sides: steady-state vs steady-state
        sec_seq, sec_par, whole, par = 1e9, 1e9, None, None
        for _ in range(2):
            t0 = time.time()
            whole = _decode_jfif(enc)
            sec_seq = min(sec_seq, time.time() - t0)
        for _ in range(3):
            t0 = time.time()
            par = decode_jpeg_restart_distributed(spark, enc)
            sec_par = min(sec_par, time.time() - t0)
        assert par is not None and whole is not None
        identical = all(np.array_equal(a, b)
                        for a, b in zip(whole[3], par[3]))
        digest = hashlib.md5(
            b"".join(p.tobytes() for p in par[3])).hexdigest()[:12]
        runs.append({
            "side_px": side,
            "jpeg_bytes": len(enc),
            "n_segments": mcus_per_row,
            "sec_sequential": round(sec_seq, 2),
            "sec_parallel_spark": round(sec_par, 2),
            "speedup": round(sec_seq / max(sec_par, 1e-9), 2),
            "planes_identical": identical,
            "plane_md5": digest,
        })
        print(json.dumps(runs[-1]), file=sys.stderr)
    print(json.dumps({"runs": runs}))


if __name__ == "__main__":
    main()
