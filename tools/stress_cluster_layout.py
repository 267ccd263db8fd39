"""Cluster-layout (range / Z-order) file-pruning receipt.

`compaction.compact(cluster_cols=...)` writes the folded ledger base
range-clustered (one column) or Z-ordered (two+ columns, bit-interleaved
16-bit keys). The claim: range predicates on a clustered column touch a
FRACTION of the base's parquet files — footer min/max excludes the rest —
where a hash-random layout intersects nearly every file. This is the
second granularity of data skipping (per-entry `_ledger_stats` sidecars
prune whole entries; the clustered layout prunes files/row-groups inside
the surviving base).

Method: build one ledger (base + deltas over two independent uniform key
columns k1, k2), fold it three ways — unclustered (hash layout), range-
clustered on k1, Z-ordered on (k1, k2) — with the same file-count target,
then for a ~5% range probe on each column count the parquet files whose
footer (min, max) intersects the range (pyarrow metadata walk, the same
statistic Spark's scan uses to skip row groups), plus the wall time of
the filtered Spark read. Merged rows are asserted identical across all
three layouts.

Expected shape: range layout prunes ~95% of files for k1 probes but
nothing for k2; Z-order prunes BOTH columns (each ~sqrt-partitioned),
the multi-column trade the interleave exists for.

Usage: python tools/stress_cluster_layout.py [base_rows] [n_files]
Prints one JSON line (pipe to measurements/).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from wde_spark.core.session import get_session
from wde_spark.streaming.compaction import (_entry_dir, compact,
                                            plan_entries, read_merged,
                                            write_base, write_delta)


def _intersecting_files(entry_dir: str, col: str, lo, hi) -> dict:
    """(files_total, files_intersecting) from parquet footer min/max —
    the statistic a scan's row-group pruning keys off."""
    import pyarrow.parquet as pq

    total = 0
    hit = 0
    for name in sorted(os.listdir(entry_dir)):
        if not name.endswith(".parquet"):
            continue
        total += 1
        md = pq.ParquetFile(os.path.join(entry_dir, name)).metadata
        fmin, fmax = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    st = c.statistics
                    fmin = st.min if fmin is None else min(fmin, st.min)
                    fmax = st.max if fmax is None else max(fmax, st.max)
        if fmin is None or not (fmax < lo or fmin > hi):
            hit += 1
    return {"files": total, "intersecting": hit}


def _probe(spark, ledger: str, col: str, lo, hi) -> dict:
    (seq, kind), = plan_entries(ledger)
    entry = _entry_dir(ledger, kind, seq)
    stats = _intersecting_files(entry, col, lo, hi)
    t0 = time.time()
    n = (spark.read.parquet(entry)
         .filter((F.col(col) >= lo) & (F.col(col) <= hi)).count())
    stats["rows"] = n
    stats["read_sec"] = round(time.time() - t0, 3)
    return stats


def _snapshot_hash(df) -> tuple:
    row = df.select(
        F.count("*").alias("n"),
        F.sum(F.conv(F.substring(F.md5(F.concat_ws(
            "|", "k1", "k2", "payload")), 1, 8), 16, 10)
            .cast("long")).alias("h")).first()
    return int(row["n"]), int(row["h"])


def main() -> None:
    base_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    spark = get_session()
    root = tempfile.mkdtemp(prefix="wde_stress_cluster_")
    domain = base_rows  # k1, k2 ~ independent uniforms over [0, domain)
    try:
        rows = spark.range(base_rows).select(
            ((F.col("id") * 48271 + 11) % domain).alias("k1"),
            ((F.col("id") * 69621 + 7) % domain).alias("k2"),
            F.md5(F.col("id").cast("string")).alias("payload"))
        delta = spark.range(base_rows // 20).select(
            ((F.col("id") * 16807 + 3) % domain).alias("k1"),
            ((F.col("id") * 75571 + 5) % domain).alias("k2"),
            F.md5((F.col("id") + 1).cast("string")).alias("payload"))
        # the fold target: same file count for every layout, so pruning
        # differences are layout, not granularity
        tfb = None  # sized by explicit n_files via repartition inside

        layouts = {}
        hashes = {}
        lo, hi = domain // 2, domain // 2 + domain // 20  # ~5% range
        for tag, cluster in (("hash", None),
                             ("range_k1", ["k1"]),
                             ("zorder_k1_k2", ["k1", "k2"])):
            ledger = os.path.join(root, tag)
            write_base(rows.repartition(n_files), ledger, 0)
            write_delta(delta.repartition(4), ledger, 1)
            t0 = time.time()
            # per-file size target chosen to land ~n_files output files
            bytes_live = sum(
                os.path.getsize(os.path.join(d, f))
                for s, k in plan_entries(ledger)
                for d in [_entry_dir(ledger, k, s)]
                for f in os.listdir(d) if f.endswith(".parquet"))
            compact(spark, ledger, ["k1", "k2"],
                    target_file_bytes=max(1, bytes_live // n_files),
                    cluster_cols=cluster)
            fold_sec = round(time.time() - t0, 3)
            hashes[tag] = _snapshot_hash(read_merged(
                spark, ledger, ["k1", "k2"]))
            layouts[tag] = {
                "fold_sec": fold_sec,
                "probe_k1": _probe(spark, ledger, "k1", lo, hi),
                "probe_k2": _probe(spark, ledger, "k2", lo, hi),
            }
        assert len(set(hashes.values())) == 1, hashes
        print(json.dumps({
            "metric": "cluster_layout_file_pruning",
            "base_rows": base_rows, "target_files": n_files,
            "probe_frac": 0.05,
            "layouts": layouts,
            "snapshot_equal": True,
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
