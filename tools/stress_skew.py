"""Skew-twin stress: one hot key holding 50% of all rows — the shape that
serializes plain window operators into a single task at scale — measured
against the skew-proof twins at two sizes so the scaling SLOPE is visible,
not just one wall time.

Covered pairs (each twin is output-identical to its plain form; equality
is hash-asserted here on the stress data itself, not just in unit tests):

  sessionize            vs sessionize_bucketed   (per-(user,bucket) windows)
  top_k_per_group       vs top_k_per_group_salted (local top-k per salt)
  last_write_wins       vs last_write_wins_agg    (max_by partial agg)

The plain forms' hot-key partition doubles when N doubles → their time
grows at least linearly in the HOT KEY's size with zero parallelism; the
twins keep every task bounded (bucket width / salt count / map-side
combine), so their time grows with N/cores. The printed JSON carries both
sizes' wall times and the plain/twin ratio at the larger size.

Usage: python tools/stress_skew.py [n_rows] [sf-multiplier]
(default 1_000_000 rows, x4 for the second point)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

HOT_FRACTION_KEYS = 100_000  # cold keys spread over this many ids
SPAN_SECONDS = 30 * 86_400   # event timestamps span 30 days


def skewed_events(spark, n: int) -> DataFrame:
    """n rows, key 0 holds 50%, the rest uniform over 100k keys; unique
    per-row tiebreak baked into ts/val so every ordering is total."""
    return (
        spark.range(n)
        .select(
            F.when(F.col("id") % 2 == 0, F.lit(0))
            .otherwise(F.col("id") % HOT_FRACTION_KEYS)
            .alias("user_id"),
            F.timestamp_seconds(
                (F.col("id") * 37) % SPAN_SECONDS
                + (F.col("id") / F.lit(1_000_000.0))  # unique sub-second
            ).alias("ts"),
            (F.col("id") % 997).alias("score"),
            F.col("id").alias("row_id"),
        )
        .repartition(32)
    )


def digest(df: DataFrame, cols: list[str]) -> int:
    # decimal(38,0) sum: order-insensitive and overflow-proof under ANSI
    return int(df.select(
        F.sum(F.xxhash64(*[F.col(c) for c in cols]).cast("decimal(38,0)"))
        .alias("h")
    ).first()["h"])


def timed(fn) -> tuple[float, int]:
    t0 = time.time()
    h = fn()
    return round(time.time() - t0, 2), h


def run_at(spark, n: int, ops: set[str]) -> dict:
    from wde_spark.operators import relational as R

    ev = skewed_events(spark, n).localCheckpoint(eager=True)
    out: dict[str, float | int] = {"n_rows": n}

    if "sessionize" in ops:
        sess_cols = ["user_id", "row_id", "session_id"]
        t, h_plain = timed(lambda: digest(
            R.sessionize(ev, "user_id", "ts", 1800), sess_cols))
        out["sessionize_plain_s"] = t
        t, h_twin = timed(lambda: digest(
            R.sessionize_bucketed(ev, "user_id", "ts", 1800, 86_400),
            sess_cols))
        out["sessionize_bucketed_s"] = t
        assert h_plain == h_twin, "sessionize twin output diverged"

    if "topk" in ops:
        topk_cols = ["user_id", "row_id", "rn"]
        order = [F.desc("score"), F.asc("row_id")]
        t, h_plain = timed(lambda: digest(
            R.top_k_per_group(ev, ["user_id"], order, 5), topk_cols))
        out["topk_plain_s"] = t
        t, h_twin = timed(lambda: digest(
            R.top_k_per_group_salted(ev, ["user_id"], order, 5), topk_cols))
        out["topk_salted_s"] = t
        assert h_plain == h_twin, "top-k twin output diverged"

    if "lww" in ops:
        lww_cols = ["user_id", "row_id"]
        t, h_plain = timed(lambda: digest(
            R.last_write_wins(ev, ["user_id"], F.col("row_id")), lww_cols))
        out["lww_window_s"] = t
        t, h_twin = timed(lambda: digest(
            R.last_write_wins_agg(ev, ["user_id"], F.col("row_id")),
            lww_cols))
        out["lww_agg_s"] = t
        assert h_plain == h_twin, "lww twin output diverged"

    ev.unpersist()
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    ops = set((sys.argv[3] if len(sys.argv) > 3
               else "sessionize,topk,lww").split(","))

    from wde_spark.core.session import get_session

    spark = get_session("stress_skew")
    small = run_at(spark, n, ops)
    big = run_at(spark, n * mult, ops)

    def slope(key: str) -> float:
        return round(big[key] / max(small[key], 0.01), 2)

    ratios = {}
    for name, p, tw in (("sessionize", "sessionize_plain_s",
                         "sessionize_bucketed_s"),
                        ("topk", "topk_plain_s", "topk_salted_s"),
                        ("lww", "lww_window_s", "lww_agg_s")):
        if p in big:
            ratios[name] = round(big[p] / max(big[tw], 0.01), 2)

    print(json.dumps({
        "hot_key_share": 0.5,
        "small": small,
        "big": big,
        "slopes": {k: slope(k) for k in small if k.endswith("_s")},
        "ratio_plain_over_twin_at_big": ratios,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
