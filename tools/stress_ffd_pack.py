"""Packing-quality receipt: FFD bin packing vs the concat-and-chunk
baseline and vs first-fit in arrival order.

Writes measurements/stress_ffd_pack_r09.json with, per scale factor:
  - total_tokens, n_docs (weight > 0), oversize docs (> seq_len)
  - lower_bound_bins = ceil(total_tokens / seq_len) (fractional-fit bound)
  - ffd: bins, padding waste (unused slots in non-overfull bins),
    waste fraction of capacity
  - ff_arrival: same for first-fit WITHOUT the decreasing sort (what a
    naive streaming packer does) — the delta is the quality the sort buys
  - concat_chunk (pack_stream): sequences and split docs — zero padding
    by construction, but documents cross sequence boundaries; FFD trades
    bounded waste for never splitting

Usage: python tools/stress_ffd_pack.py [sf_dir ...]
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEQ_LEN = 128
N_BUCKETS = 8


def main() -> None:
    from pyspark.sql import functions as F

    from wde_spark.core.session import get_session
    from wde_spark.functions.strings import tokens
    from wde_spark.operators import layout as L

    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.01",
                               "/root/testdata/sf0.1"]
    spark = get_session("stress_ffd", cpus=8, shuffle_partitions=16)
    out = {"seq_len": SEQ_LEN, "n_buckets": N_BUCKETS, "sf": {}}
    for sf_dir in sf_dirs:
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        t = docs.select(
            "doc_id", F.size(tokens(F.col("text"))).alias("n_tok"))

        packed = L.ffd_pack(t, seq_len=SEQ_LEN, n_buckets=N_BUCKETS)
        fills = packed.groupBy("bucket", "bin_id").agg(
            F.sum("n_tok").alias("fill"))
        agg = fills.agg(
            F.count("*").alias("bins"),
            F.sum(F.when(F.col("fill") <= SEQ_LEN,
                         SEQ_LEN - F.col("fill")).otherwise(0))
            .alias("waste"),
            F.sum(F.when(F.col("fill") > SEQ_LEN, 1).otherwise(0))
            .alias("overfull_bins"),
        ).first()

        stats = t.filter(F.col("n_tok") > 0).agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            F.sum(F.when(F.col("n_tok") > SEQ_LEN, 1).otherwise(0))
            .alias("oversize_docs"),
        ).first()

        # first-fit in arrival (doc_id) order, same buckets — driver-side
        # replay is fine for a receipt (row counts are test-scale)
        rows = packed.select("doc_id", "bucket", "n_tok") \
            .orderBy("doc_id").collect()
        ff_bins: dict[int, list[int]] = {}
        for r in rows:
            fl = ff_bins.setdefault(r["bucket"], [])
            pos = next((i for i, f in enumerate(fl)
                        if f + r["n_tok"] <= SEQ_LEN), None)
            if pos is None:
                fl.append(r["n_tok"])
            else:
                fl[pos] += r["n_tok"]
        ff_n = sum(len(v) for v in ff_bins.values())
        ff_waste = sum(SEQ_LEN - f for v in ff_bins.values()
                       for f in v if f <= SEQ_LEN)

        chunked = L.pack_stream(t, seq_len=SEQ_LEN)
        cc = chunked.agg(
            F.countDistinct("seq_id").alias("sequences"),
            F.sum(F.when(F.col("start_in_seq") > 0, 0).otherwise(0))
            .alias("_z")).first()
        split_docs = (
            chunked.groupBy("doc_id").count().filter("count > 1").count())

        lb = math.ceil(stats["total_tokens"] / SEQ_LEN)
        out["sf"][sf_dir] = {
            "n_docs": stats["n_docs"],
            "total_tokens": int(stats["total_tokens"]),
            "oversize_docs": int(stats["oversize_docs"]),
            "lower_bound_bins": lb,
            "ffd": {
                "bins": int(agg["bins"]),
                "waste_tokens": int(agg["waste"]),
                "overfull_bins": int(agg["overfull_bins"]),
                "waste_frac": round(
                    agg["waste"] / (agg["bins"] * SEQ_LEN), 4),
                "bins_over_lower_bound": round(agg["bins"] / lb, 4),
            },
            "ff_arrival": {
                "bins": ff_n,
                "waste_tokens": ff_waste,
                "waste_frac": round(ff_waste / (ff_n * SEQ_LEN), 4),
            },
            "concat_chunk": {
                "sequences": int(cc["sequences"]),
                "split_docs": int(split_docs),
                "padding_waste": 0,
            },
        }
        print(sf_dir, json.dumps(out["sf"][sf_dir]))
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        os.pardir, "measurements", "stress_ffd_pack_r09.json")
    with open(os.path.normpath(path), "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote", os.path.normpath(path))
    spark.stop()


if __name__ == "__main__":
    main()
