"""Version-ledger utilities for the copy-on-write snapshot directories the
streaming sinks maintain (`cdc.py`, `sketch_maintenance.py`,
`dedup_admission.py`, `embedding_admission.py`): every batch writes an
immutable `v{n}` directory, so the ledger gives three things a table
format gives — time travel (read any past version), history, and
compaction (drop old versions; each version is self-contained, so
compaction is a directory delete, never a rewrite).
"""

from __future__ import annotations

import os
import shutil


def version_history(target_dir: str) -> list[int]:
    """Sorted version numbers present under `target_dir`."""
    return sorted(int(p[1:]) for p in os.listdir(target_dir)
                  if p.startswith("v") and p[1:].isdigit())


def version_dir(target_dir: str, n: int) -> str:
    d = os.path.join(target_dir, f"v{n}")
    if not os.path.isdir(d):
        raise FileNotFoundError(
            f"version v{n} not found under {target_dir} "
            f"(have: {version_history(target_dir)})")
    return d


def read_version(spark, target_dir: str, n: int, subdir: str = ""):
    """Time travel: the snapshot as of version `n` (optionally a named
    sub-table, e.g. 'corpus' / 'codes' for the admission sinks)."""
    return spark.read.parquet(os.path.join(version_dir(target_dir, n), subdir))


def compact_versions(target_dir: str, keep_last: int = 2) -> list[int]:
    """Delete all but the newest `keep_last` versions; returns the dropped
    version numbers. Safe at any time: versions are immutable and
    self-contained, and the maintainers only ever read `v{batch_id}` (the
    newest completed version) — so `keep_last >= 2` tolerates a crash
    between a batch's read and its write."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    hist = version_history(target_dir)
    drop = hist[:-keep_last] if len(hist) > keep_last else []
    for n in drop:
        shutil.rmtree(os.path.join(target_dir, f"v{n}"))
    return drop
