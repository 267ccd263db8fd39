"""Scan-count sweep: flag headline queries whose executed plan reads the
same parquet table more than twice.

Each extra scan of a 100 TB table is a full extra pass of I/O, and the
pattern hides easily: union branches and differently-shaped aggregates
don't get ReusedExchange, so a plan that LOOKS like one pipeline quietly
reads its source 3-5x. This sweep caught (and the fixes removed):
  - connected_components symmetrization evaluating the upstream LSH
    verification twice (edges UNION swap(edges));
  - SNM / n-gram Jaccard rebuilding the shingle table for the size agg;
  - merge_changeset_orders' synthesized changeset rescanning orders per
    I/U/D branch.

Remaining >2-scan queries are DECLARED legitimate below — each scan
carries a different pushed filter or pruned projection, so at scale each
reads a fraction of the table, and collapsing them would trade pushdown
for a shuffle:
  - resolve_ladder_parts (3x part): the query-relaxation ladder builds
    its candidate forms from differently-pruned projections;
  - range_join_error_clicks (3x events): error side, click side, and the
    bucket spine each carry a distinct pushed filter;
  - funnel_signup_view_purchase (4x events): one pushed-filter scan per
    funnel stage plus the stage-1 frontier;
  - decontaminate_documents (3x documents): corpus side + the
    benchmark-derivation side (test scaffolding; production benchmarks
    arrive external).

Usage: python tools/scan_sweep.py [sf_dir]   — exits 1 on NEW offenders.
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DECLARED = {
    "resolve_ladder_parts": {"part": 3},
    "range_join_error_clicks": {"events": 3},
    "funnel_signup_view_purchase": {"events": 4},
    "decontaminate_documents": {"documents": 3},
    # expectations: scan 1 = the merged row-local+unique aggregation,
    # scans 2+3 = the FK check (orphan anti-join over o_custkey only +
    # its one-row total) — both column-pruned to a single key column
    "data_quality_orders": {"orders": 3},
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from bench import HEADLINE
    from wde_spark.core.session import get_session
    from wde_spark.queries import QUERIES

    spark = get_session("scan_sweep", cpus=16)
    offenders = []
    for name in HEADLINE:
        df = QUERIES[name](spark, sf_dir)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString() \
            .split("== Initial Plan ==")[0]
        counts = Counter(re.findall(r"(\w+)\.parquet", plan))
        flagged = {t: n for t, n in counts.items() if n > 2}
        if flagged and flagged != DECLARED.get(name):
            offenders.append((name, flagged))
            print(f"NEW OFFENDER {name}: {flagged}", flush=True)
        elif flagged:
            print(f"declared     {name}: {flagged}", flush=True)
        spark.catalog.clearCache()
    print(f"\n{len(offenders)} new offender(s)")
    return 1 if offenders else 0


if __name__ == "__main__":
    raise SystemExit(main())
