"""Propose the next driver-window rotation.

The round driver hash-checks only the FIRST 50 registry entries
(`wde_spark/queries.py::_DRIVER_PRIORITY`). This tool reads every
CORRECTNESS_r*.json in the repo root, computes which queries have never
had a driver row, and prints a proposed next window: all never-checked
queries first (they need evidence most), topped up with the
longest-unchecked previously-green queries (regression re-checks),
keeping the `entry()` flagship and anything currently red in the window.

Advisory only — it EDITS NOTHING. Apply by updating _DRIVER_PRIORITY and
the pinned expectation in tests/test_driver_priority_window (or its
equivalent), then re-run the full oracle drive.

Usage: python tools/plan_rotation.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import __spark_entry__ as E

    names = list(E.queries().keys())
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    last_checked: dict[str, int] = {}
    latest_fail: dict[str, int] = {}
    rounds = sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")))
    for path in rounds:
        rnd = int("".join(ch for ch in os.path.basename(path) if ch.isdigit()))
        data = json.load(open(path))
        for q, row in data.items():
            last_checked[q] = max(rnd, last_checked.get(q, 0))
            ok = row.get("hash_match") or (
                row.get("rows_match") and "hash_match" not in row)
            if not ok:
                latest_fail[q] = max(rnd, latest_fail.get(q, 0))

    latest_round = max(last_checked.values(), default=0)
    # red in the most recent round AND still registered (renamed/removed
    # queries would crash names.index and have no slot to keep anyway)
    red_now = {q for q, r in latest_fail.items()
               if r == latest_round and r == last_checked[q] and q in names}

    never = [q for q in names if q not in last_checked]
    # oldest-evidence first among the already-checked
    stale = sorted((q for q in names if q in last_checked),
                   key=lambda q: (last_checked[q], names.index(q)))

    # the entry() flagship must keep a driver row every round — pin it
    # first, as the tool's own policy promises
    flagship = names[0]
    window: list[str] = []
    for q in ([flagship] + never + sorted(red_now, key=names.index) + stale):
        if q not in window:
            window.append(q)
        if len(window) == 50:
            break

    print(f"registry: {len(names)} queries; driver rounds seen: {len(rounds)}")
    print(f"never driver-checked: {len(never)}")
    for q in never:
        print(f"  {q}")
    if red_now:
        print(f"red in latest round (keep in window): {sorted(red_now)}")
    print("\nproposed next _DRIVER_PRIORITY (50):")
    for q in window:
        tag = ("NEVER" if q in never else
               f"last r{last_checked[q]}" + (" RED" if q in red_now else ""))
        print(f"  {q:45s} {tag}")


if __name__ == "__main__":
    main()
