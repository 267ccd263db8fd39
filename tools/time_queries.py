"""Time individual registry queries with the bench's methodology
(noop sink, warm tables + Arrow pool, min of N interleaved runs).

Usage: python tools/time_queries.py [-n RUNS] [sf_dir] QUERY [QUERY...]

Lighter than bench.py (no halves, no calibration, no best-known ledger):
for quick A/B measurements while optimizing. Prints one line per query:
min / all runs. Not a replacement for bench.py closes.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    runs = 3
    if args and args[0] == "-n":
        runs = int(args[1]); args = args[2:]
    if args and os.path.isdir(args[0]):
        sf_dir, names = args[0], args[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", args

    from wde_spark.core.session import get_session
    from wde_spark.core.catalog import TABLES, load_table
    from wde_spark.queries import QUERIES

    spark = get_session("wde_timeq")
    for t in TABLES:
        load_table(spark, sf_dir, t).write.format("noop").mode("overwrite").save()

    def _identity(batches):
        yield from batches

    spark.range(32).repartition(32).mapInPandas(
        _identity, "id long").write.format("noop").mode("overwrite").save()

    times: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(runs):
        for name in names:
            spark.sparkContext.setJobDescription(name)
            t0 = time.time()
            QUERIES[name](spark, sf_dir) \
                .write.format("noop").mode("overwrite").save()
            times[name].append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(None)
    for name in names:
        ts = times[name]
        print(f"{min(ts):7.3f}  {name}  runs={ts}")
    spark.stop()


if __name__ == "__main__":
    main()
