"""PNG-decode throughput through the REAL multimodal Arrow kernel.

`extract_features(decode_images=True)` histograms decoded pixels for PNG
payloads; this driver measures that path end-to-end: n synthetic PNGs
(every color type × every scanline filter, encoded by the engine's own
codec) flow through the same mapInPandas kernel the oracled query uses,
and the receipt records images/sec and MB(decoded)/sec per image size —
the evidence behind "decode stubbed → decode real" for the image
modality. The raw-byte fallback path is measured alongside as the
baseline the decode cost is paid on top of.

Usage: python tools/stress_png_decode.py [n_images] [side ...]
Prints one JSON line (the measurements/ receipt).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _make_pngs(n: int, side: int) -> list[tuple[int, str, bytearray]]:
    from wde_spark.operators.png_codec import encode_png

    rows = []
    for i in range(n):
        ch = (1, 2, 3, 4)[i % 4]
        ft = i % 5
        rs = np.random.RandomState(i)
        px = rs.randint(0, 256, size=(side, side, ch), dtype=np.uint8)
        rows.append((i, "image", bytearray(encode_png(px, filter_type=ft))))
    return rows


def _run(spark, n: int, side: int) -> dict:
    from wde_spark.operators import multimodal as MM

    rows = _make_pngs(n, side)
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    ).repartition(spark.sparkContext.defaultParallelism).localCheckpoint()
    decoded_mb = sum(side * side * ((i % 4) + 1)
                     for i in range(n)) / 1e6

    def timed(decode: bool) -> float:
        t0 = time.time()
        MM.extract_features(media, decode_images=decode) \
            .write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    timed(True)  # warm both plans + the Arrow pool
    timed(False)
    t_dec = min(timed(True), timed(True))
    t_raw = min(timed(False), timed(False))
    return {
        "n_images": n, "side": side,
        "decoded_mb": round(decoded_mb, 1),
        "wall_decode_sec": t_dec,
        "wall_rawbytes_sec": t_raw,
        "images_per_sec": round(n / t_dec, 1),
        "decoded_mb_per_sec": round(decoded_mb / t_dec, 1),
    }


def main() -> None:
    args = [int(a) for a in sys.argv[1:]]
    n = args[0] if args else 2048
    sides = args[1:] or [64, 256]
    from wde_spark.core.session import get_session

    spark = get_session("stress_png_decode")
    points = [_run(spark, n, s) for s in sides]
    print(json.dumps({
        "what": "extract_features PNG-decode throughput (real codec path "
                "vs raw-byte fallback, same Arrow kernel)",
        "mix": "color types 1-4 x filters 0-4, engine-encoded",
        "points": points,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
