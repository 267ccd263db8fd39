"""One-time extraction of the reference's static lookup tables into JSON.

The reference (katabase/3_WikidataEnrichment, script/tables/matching.py)
ships its normalization dimension tables as Python literals. The engine
stores them as plain JSON data files under wde_spark/data/ — data, not code;
the engine loads them as broadcast maps (SURVEY.md §1.1 "Static lookup
tables").

Run: python tools/extract_matching_tables.py
"""
from __future__ import annotations

import importlib.util
import json
import os

REF = "/root/reference/script/tables/matching.py"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "wde_spark", "data")

TABLES = [
    "names", "comp_names", "status", "functions", "dpts", "provinces",
    "colonies", "countries", "events", "other",
]


def main() -> None:
    spec = importlib.util.spec_from_file_location("ref_matching", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    os.makedirs(OUT, exist_ok=True)
    for name in TABLES:
        obj = getattr(mod, name)
        with open(os.path.join(OUT, f"{name}.json"), "w", encoding="utf-8") as f:
            # Preserve insertion order: the reference's substring-match loops
            # iterate these dicts in declaration order and first-match wins.
            json.dump(obj, f, ensure_ascii=False, indent=1)
        kind = "map" if isinstance(obj, dict) else "list"
        print(f"{name}: {kind} with {len(obj)} entries")


if __name__ == "__main__":
    main()
