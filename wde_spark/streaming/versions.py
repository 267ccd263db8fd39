"""Version-ledger utilities for the copy-on-write snapshot directories the
streaming sinks maintain (`cdc.py`, `sketch_maintenance.py`,
`dedup_admission.py`, `embedding_admission.py`): every batch writes an
immutable `v{n}` directory, so the ledger gives three things a table
format gives — time travel (read any past version), history, and
compaction (drop old versions; each version is self-contained, so
compaction is a directory delete, never a rewrite).

Filesystem abstraction: plain local paths use `os`/`shutil` directly (no
JVM round-trip); any path with a URI scheme (`hdfs://…`, `s3a://…`,
`file:///…`) routes through the Hadoop FileSystem API via the session's
JVM — listing, existence checks, and recursive deletes all go through
`org.apache.hadoop.fs.FileSystem`, so time travel and compaction work
against whatever object store the cluster's Hadoop conf can reach. The
`spark` argument is only required for scheme'd paths (falls back to the
active session); local-path behavior is byte-for-byte what it was.
"""

from __future__ import annotations

import os
import posixpath
import re
import shutil

_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*:/")


def _is_uri(path: str) -> bool:
    return bool(_SCHEME_RE.match(path))


def _join(base: str, *parts: str) -> str:
    """Path join that preserves URI schemes (posix separators) and matches
    os.path.join for plain local paths."""
    parts = tuple(p for p in parts if p)
    if _is_uri(base):
        return posixpath.join(base, *parts)
    return os.path.join(base, *parts)


def _hadoop_fs(spark, path: str):
    """(FileSystem, Path-class) for `path`, resolved through the session's
    Hadoop configuration (which carries the cluster's object-store
    credentials and scheme→implementation bindings)."""
    if spark is None:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
    if spark is None:
        raise ValueError(
            f"a SparkSession is required to reach non-local ledger path "
            f"{path!r} (Hadoop FileSystem API)")
    jpath_cls = spark._jvm.org.apache.hadoop.fs.Path
    fs = jpath_cls(path).getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath_cls


def version_history(target_dir: str, spark=None) -> list[int]:
    """Sorted version numbers present under `target_dir`."""
    if not _is_uri(target_dir):
        return sorted(int(p[1:]) for p in os.listdir(target_dir)
                      if p.startswith("v") and p[1:].isdigit())
    fs, jpath = _hadoop_fs(spark, target_dir)
    root = jpath(target_dir)
    if not fs.exists(root):
        raise FileNotFoundError(target_dir)
    names = [st.getPath().getName() for st in fs.listStatus(root)]
    return sorted(int(n[1:]) for n in names
                  if n.startswith("v") and n[1:].isdigit())


def version_dir(target_dir: str, n: int, spark=None) -> str:
    d = _join(target_dir, f"v{n}")
    if _is_uri(target_dir):
        fs, jpath = _hadoop_fs(spark, target_dir)
        present = fs.exists(jpath(d))
    else:
        present = os.path.isdir(d)
    if not present:
        raise FileNotFoundError(
            f"version v{n} not found under {target_dir} "
            f"(have: {version_history(target_dir, spark)})")
    return d


def read_version(spark, target_dir: str, n: int, subdir: str = ""):
    """Time travel: the snapshot as of version `n` (optionally a named
    sub-table, e.g. 'corpus' / 'codes' for the admission sinks)."""
    return spark.read.parquet(
        _join(version_dir(target_dir, n, spark), subdir))


def compact_versions(target_dir: str, keep_last: int = 2,
                     spark=None) -> list[int]:
    """Delete all but the newest `keep_last` versions; returns the dropped
    version numbers. Safe at any time: versions are immutable and
    self-contained, and the maintainers only ever read `v{batch_id}` (the
    newest completed version) — so `keep_last >= 2` tolerates a crash
    between a batch's read and its write."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    hist = version_history(target_dir, spark)
    drop = hist[:-keep_last] if len(hist) > keep_last else []
    if _is_uri(target_dir):
        fs, jpath = _hadoop_fs(spark, target_dir)
        for n in drop:
            fs.delete(jpath(_join(target_dir, f"v{n}")), True)
    else:
        for n in drop:
            shutil.rmtree(_join(target_dir, f"v{n}"))
    return drop
