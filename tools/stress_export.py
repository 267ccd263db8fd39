"""Two-phase global-ranking stress — the scale property that matters for
`layout.export_shards` at 100 TB is that NO stage ever sees the corpus
in one partition: the naive form (one ROW_NUMBER over a global ORDER BY,
exactly what the DuckDB oracle states) funnels every row through a
single-partition window, while the two-phase form keeps the heavy window
PARTITIONED BY hash-prefix bucket (~n/256 rows each) and moves only 256
count rows through the driver.

This driver ranks an n-row synthetic id table both ways at two sizes,
checks the outputs are identical (rank-for-rank), and records wall
times — the receipt shows the naive form degrading toward the
single-core sort while the two-phase form tracks the parallel scan.

Usage: python tools/stress_export.py [n1] [n2]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F


def _naive(df, docs_per_shard):
    hx = F.md5(F.concat(F.lit("wde|"), F.col("doc_id").cast("string")))
    w = Window.orderBy(hx, "doc_id")  # single-partition: the oracle form
    return (
        df.withColumn("global_rank", F.row_number().over(w).cast("long"))
        .withColumn("shard_id",
                    ((F.col("global_rank") - 1) / docs_per_shard)
                    .cast("long"))
    )


def _run(spark, n, docs_per_shard=4096):
    from wde_spark.operators.layout import export_shards

    df = spark.range(n).select(F.col("id").alias("doc_id")) \
        .repartition(spark.sparkContext.defaultParallelism)
    df = df.localCheckpoint()  # isolate ranking cost from input generation

    chk = (F.col("global_rank") * F.col("doc_id")) % F.lit(1_000_000_007)

    t0 = time.time()
    two = export_shards(df, docs_per_shard)
    two.select(F.sum(chk).alias("chk")).collect()
    t_two = time.time() - t0

    t0 = time.time()
    nv = _naive(df, docs_per_shard)
    nv.select(F.sum(chk).alias("chk")).collect()
    t_naive = time.time() - t0

    # equality: rank-for-rank identical (checksum of rank*id is
    # order-insensitive and collision-hostile enough for a receipt; the
    # registry oracle does the exact per-row hash check at sf0.01)
    chk_two = two.agg(F.sum(chk).alias("c")).collect()[0]["c"]
    chk_nv = nv.agg(F.sum(chk).alias("c")).collect()[0]["c"]
    n_mismatch = (
        two.select("doc_id", "global_rank")
        .join(nv.select("doc_id", F.col("global_rank").alias("g2")),
              "doc_id")
        .filter(F.col("global_rank") != F.col("g2")).count()
        if n <= 1_000_000 else (0 if chk_two == chk_nv else -1)
    )
    return {"n": n, "sec_two_phase": round(t_two, 2),
            "sec_naive_global_window": round(t_naive, 2),
            "checksum_equal": bool(chk_two == chk_nv),
            "n_rank_mismatch": int(n_mismatch)}


def main():
    from wde_spark.core.session import get_session

    n1 = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n2 = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000_000
    spark = get_session("stress_export", cpus=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    _run(spark, 50_000)  # warm-up: JIT + codegen, not billed to any size
    out = {"runs": [_run(spark, n1), _run(spark, n2)]}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
