"""Decode throughput for the continuation-session codecs — GIF (LZW +
compositing), BI_RLE8 AVI video, G.711 and IMA ADPCM audio — through the
SAME row-local Arrow kernels the oracled queries use. The receipt records
items/sec and decoded-MB/sec per family at a corpus scale (default 20k
synthetic docs) two orders above the sf0.01 correctness gate — the
scale evidence behind "null-route → real decode" for each tier.

Usage: python tools/stress_media_codecs.py [n_docs]
Prints one JSON line (the measurements/ receipt).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _docs(spark, n: int):
    import hashlib

    rows = [(i, hashlib.sha256(str(i).encode()).hexdigest()
             * (1 + i % 5)) for i in range(n)]
    return spark.createDataFrame(
        rows, "doc_id long, text string"
    ).repartition(spark.sparkContext.defaultParallelism).localCheckpoint()


def _time(fn):
    t0 = time.time()
    n = fn()
    return n, round(time.time() - t0, 3)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .appName("stress-media-codecs").getOrCreate()
    )
    from wde_spark.operators import multimodal as MM

    docs = _docs(spark, n)
    out: dict = {"receipt": "stress_media_codecs", "n_docs": n}

    fams = {
        # name -> (media builder, stats kernel, decoded-bytes expression)
        "gif_static": (
            MM.attach_gifs,
            MM.image_rgba_stats,
            lambda df: df.agg(F.sum(
                F.col("width").cast("long") * F.col("height") * 4)),
        ),
        "gif_animated": (
            MM.attach_animated_gifs,
            MM.animation_frame_stats,
            lambda df: df.agg(F.sum(
                F.col("width").cast("long") * F.col("height") * 4)),
        ),
        "avi_rle8": (
            MM.attach_video_rle,
            MM.video_frame_stats,
            lambda df: df.agg(F.sum(
                F.col("width").cast("long") * F.col("height") * 3)),
        ),
        "audio_g711": (
            MM.attach_audio_g711,
            MM.audio_sample_stats,
            lambda df: df.agg(F.sum(
                F.col("n_frames").cast("long") * F.col("n_channels") * 2)),
        ),
        "audio_adpcm": (
            MM.attach_audio_adpcm,
            MM.audio_sample_stats,
            lambda df: df.agg(F.sum(
                F.col("n_frames").cast("long") * F.col("n_channels") * 2)),
        ),
        "qoi": (
            MM.attach_qoi,
            MM.image_rgba_stats,
            lambda df: df.agg(F.sum(
                F.col("width").cast("long") * F.col("height") * 4)),
        ),
        "bmp": (
            MM.attach_bmps,
            MM.image_rgba_stats,
            lambda df: df.agg(F.sum(
                F.col("width").cast("long") * F.col("height") * 3)),
        ),
        "jpeg_gray": (
            MM.attach_jpegs,
            MM.image_rgba_stats,
            lambda df: df.agg(F.sum(
                F.col("width").cast("long") * F.col("height"))),
        ),
        "jpeg_420_restart": (
            MM.attach_jpegs_420,
            MM.image_rgba_stats,
            lambda df: df.agg(F.sum(
                F.col("width").cast("long") * F.col("height") * 3)),
        ),
    }
    for name, (build, stats, decoded_bytes) in fams.items():
        media = build(docs).localCheckpoint()  # exclude synth cost
        payload_mb = media.agg(
            F.sum(F.octet_length("payload"))).first()[0] / 1e6
        res = stats(media).persist()
        _cnt, sec = _time(lambda r=res: r.count())  # decode once, cached
        dec_mb = decoded_bytes(res).first()[0] / 1e6
        res.unpersist()
        out[name] = {
            "payload_mb": round(payload_mb, 1),
            "decoded_mb": round(dec_mb, 1),
            "sec": sec,
            "docs_per_sec": round(n / sec, 1),
            "decoded_mb_per_sec": round(dec_mb / sec, 1),
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
