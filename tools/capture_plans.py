"""Capture `.explain("formatted")` output for named registry queries.

Usage: python tools/capture_plans.py OUT_DIR SUFFIX [sf_dir] QUERY [QUERY...]

Writes OUT_DIR/<query>_<SUFFIX>.txt for each query — the round's
before/after plan evidence (plans/r12/...). The plan is the pre-execution
formatted physical plan (AQE initial); queries whose construction runs
eager driver-side jobs (two-phase rank collects) execute those as part of
DataFrame construction, which is part of the measured query cost and is
noted in the header.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    if rest and os.path.isdir(rest[0]):
        sf_dir, names = rest[0], rest[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", rest
    os.makedirs(out_dir, exist_ok=True)

    from wde_spark.core.session import get_session
    from wde_spark.queries import QUERIES

    spark = get_session("wde_plans")
    for name in names:
        t0 = time.time()
        df = QUERIES[name](spark, sf_dir)
        build_s = time.time() - t0
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"== {name} ({suffix}) sf_dir={sf_dir} ==\n")
            fh.write(f"(DataFrame construction, incl. any eager two-phase "
                     f"collects: {build_s:.2f}s wall)\n\n")
            fh.write(plan)
        print(f"wrote {path}")
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
