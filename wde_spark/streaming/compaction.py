"""Delta-ledger maintained tables: merge-on-read + compaction — the
table-format idiom (Delta/Iceberg MOR) the full-snapshot COW sinks
deliberately skip.

The existing maintainers (`cdc.py`, `codebook_maintenance.py`,
`embedding_admission.py`, ...) write a SELF-CONTAINED `v{n}` snapshot per
micro-batch: reads touch one version, compaction is a directory delete.
That is the right trade for MODEL-sized state (a 16x64 codebook, a Bloom
bitmap). For CORPUS-sized maintained tables — PQ codes over billions of
vectors, per-doc admission ledgers — a full snapshot per batch rewrites
the world every batch: O(corpus) write amplification for an O(batch)
change. The delta ledger flips it:

  * each batch appends `d{n}` — ONLY the rows it changed (upserts, plus
    tombstones for deletes): O(batch) write;
  * reads union the latest base `b{k}` with every delta `d{n}`, n > k,
    and keep the row from the HIGHEST ledger sequence per key
    (last-writer-wins merge-on-read);
  * compaction folds base + deltas into a new base `b{max_n}` and
    deletes what it merged — read amplification (files + rows unioned
    per read) drops back to 1 base, and the ledger keeps growing from
    there.

Layout: `target_dir/b{n}` (base) and `target_dir/d{n}` (delta) parquet
directories, `n` a strictly increasing sequence shared by both kinds.
Writers never mutate an existing entry (replaying a crashed batch
rewrites the same `d{n}` with the same bytes — deterministic content in,
idempotent ledger out), so readers at any moment see a consistent
prefix.

Tombstones: a delta row with `_op = 'D'` deletes its key; `_op = 'U'`
upserts. `read_merged` drops tombstoned keys after the LWW pick;
compaction physically removes them (a tombstone never survives into a
base).

At 100 TB: the BASE IS NEVER SHUFFLED on a merged read — the LWW
window runs over the deltas only (batch-sized by the write contract),
and their key set anti-joins the base (AQE broadcasts it in the
designed regime; an overdue ledger degrades to a shuffle join instead
of flattening the driver). A fully-compacted ledger reads as one plain
scan. Compaction itself is one merged read plus one base write —
O(table), amortized over the batches it absorbs via `maybe_compact`'s
entry budget, exactly the economics of OPTIMIZE/rewrite_data_files in
the table formats.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_ENTRY_RE = re.compile(r"^([bd])(\d+)$")


def ledger_entries(target_dir: str) -> list:
    """Sorted (seq, kind) entries present under `target_dir`
    (kind 'b' base / 'd' delta)."""
    if not os.path.isdir(target_dir):
        return []
    out = []
    for name in os.listdir(target_dir):
        m = _ENTRY_RE.match(name)
        if m:
            out.append((int(m.group(2)), m.group(1)))
    return sorted(out)


def _entry_dir(target_dir: str, kind: str, seq: int) -> str:
    return os.path.join(target_dir, f"{kind}{seq}")


_STATS_FILE = "_ledger_stats.json"  # underscore-prefixed: Spark's
# parquet reader ignores it inside the entry directory


def _write_stats(df: DataFrame, entry: str, stats_col: str) -> None:
    import json

    row = df.agg(F.min(stats_col).alias("lo"),
                 F.max(stats_col).alias("hi"),
                 F.count("*").alias("n")).first()
    with open(os.path.join(entry, _STATS_FILE), "w") as fh:
        json.dump({"col": stats_col,
                   "min": row["lo"], "max": row["hi"],
                   "rows": row["n"]}, fh)


def entry_stats(target_dir: str, kind: str, seq: int) -> dict | None:
    """The (col, min, max, rows) stats recorded for an entry, or None
    when the writer did not request stats."""
    import json

    p = os.path.join(_entry_dir(target_dir, kind, seq), _STATS_FILE)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return json.load(fh)


def write_base(df: DataFrame, target_dir: str, seq: int,
               stats_col: str | None = None) -> None:
    """Write a self-contained base at ledger sequence `seq`. The frame
    must NOT contain tombstones (bases hold live rows only).
    `stats_col` records the column's (min, max, rows) next to the data
    (one extra O(batch) agg) so range reads can skip the entry."""
    os.makedirs(target_dir, exist_ok=True)
    entry = _entry_dir(target_dir, "b", seq)
    df.write.mode("overwrite").parquet(entry)
    if stats_col is not None:
        _write_stats(df, entry, stats_col)


def write_delta(df: DataFrame, target_dir: str, seq: int,
                op_col: str = "_op",
                stats_col: str | None = None) -> None:
    """Append the batch's changed rows at sequence `seq`. `op_col`
    ('U' upsert / 'D' delete) is added as all-'U' when absent.
    `stats_col`: see `write_base` — tombstone rows count toward the
    range too (a delete for key k lives wherever k does)."""
    os.makedirs(target_dir, exist_ok=True)
    if op_col not in df.columns:
        df = df.withColumn(op_col, F.lit("U"))
    entry = _entry_dir(target_dir, "d", seq)
    df.write.mode("overwrite").parquet(entry)
    if stats_col is not None:
        _write_stats(df, entry, stats_col)


def plan_entries(target_dir: str, as_of: int | None = None,
                 key_range: tuple | None = None) -> list:
    """The (seq, kind) entries a merged read must touch: the latest
    base <= as_of plus every later delta, MINUS entries whose recorded
    (min, max) stats don't intersect `key_range` — the data-skipping
    half of the table-format idiom. Entries without stats are never
    pruned (correct by default); pruning is exact for LWW because a
    skipped entry provably holds no key in range, so it can neither
    supply nor supersede an in-range row."""
    entries = ledger_entries(target_dir)
    if as_of is not None:
        entries = [e for e in entries if e[0] <= as_of]
    bases = [s for s, k in entries if k == "b"]
    start = max(bases) if bases else None
    live = [(s, k) for s, k in entries
            if (k == "b" and s == start)
            or (k == "d" and (start is None or s > start))]
    if key_range is None:
        return live
    lo, hi = key_range
    kept = []
    for seq, kind in live:
        st = entry_stats(target_dir, kind, seq)
        if st is not None and st["min"] is not None and (
                st["max"] < lo or st["min"] > hi):
            continue
        kept.append((seq, kind))
    return kept


def read_merged(spark, target_dir: str, key_cols,
                as_of: int | None = None,
                key_range: tuple | None = None) -> DataFrame:
    """Merge-on-read: latest base <= as_of, plus every later delta
    <= as_of; last-writer-wins per key, tombstones dropped. With
    `as_of=None` reads the full ledger (time travel otherwise — the
    maintainers replay against `as_of=batch_id` for idempotency).

    The BASE IS NEVER SHUFFLED: the LWW window runs over the deltas
    only (batch-sized by the write contract), whose key set then
    broadcast-anti-joins the base — so a merged read costs one base
    scan plus delta-sized work, not a table-sized repartition. A
    fully-compacted ledger collapses further to a plain scan. (If
    deltas outgrow broadcast, the ledger is overdue for `compact` /
    `maybe_compact` — that cadence, not a bigger join, is the fix.)"""
    key_cols = list(key_cols)
    entries = ledger_entries(target_dir)
    if as_of is not None:
        entries = [e for e in entries if e[0] <= as_of]
    if not entries:
        raise FileNotFoundError(
            f"no ledger entries under {target_dir} (as_of={as_of})")
    live = plan_entries(target_dir, as_of, key_range)
    if key_range is not None and not live:
        # every entry's stats exclude the range: empty result, schema
        # from the newest entry
        seq, kind = entries[-1]
        empty = spark.read.parquet(
            _entry_dir(target_dir, kind, seq)).limit(0)
        if "_op" in empty.columns:
            empty = empty.drop("_op")
        return empty
    base_df = None
    parts = []
    for seq, kind in live:
        if kind == "b":
            base_df = spark.read.parquet(
                _entry_dir(target_dir, "b", seq))
        else:
            parts.append(
                spark.read.parquet(_entry_dir(target_dir, "d", seq))
                .withColumn("_seq", F.lit(seq)))
    if key_range is not None:
        # `key_range` applies to key_cols[0] (the stats column by the
        # write contract); the residual filter pushes to every scan
        lo, hi = key_range
        rng = (F.col(key_cols[0]) >= F.lit(lo)) \
            & (F.col(key_cols[0]) <= F.lit(hi))
        if base_df is not None:
            base_df = base_df.filter(rng)
        parts = [p.filter(rng) for p in parts]
    if not parts:
        # fully compacted ledger: a base holds live, unique-keyed rows
        # by construction, so the read is a plain scan — no LWW window,
        # no join. This is the payoff compaction buys.
        return base_df
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    w = Window.partitionBy(*key_cols).orderBy(F.col("_seq").desc())
    delta_live = (merged.withColumn("_rk", F.row_number().over(w))
                  .filter((F.col("_rk") == 1) & (F.col("_op") == "U"))
                  .drop("_rk", "_seq", "_op"))
    if base_df is None:
        return delta_live
    delta_keys = merged.select(*key_cols).distinct()
    # no forced broadcast: AQE broadcasts the (batch-sized) key set in
    # the designed regime, and an overdue-for-compaction ledger whose
    # keys outgrow the threshold degrades to a shuffle join instead of
    # flattening the driver
    survivors = base_df.join(delta_keys, key_cols, "left_anti")
    return survivors.unionByName(delta_live)


def read_amplification(target_dir: str) -> dict:
    """What one merged read must touch RIGHT NOW: ledger entries unioned
    and parquet part-files opened — the quantity compaction exists to
    push back down."""
    live = plan_entries(target_dir)
    n_files = 0
    for seq, kind in live:
        d = _entry_dir(target_dir, kind, seq)
        n_files += sum(1 for f in os.listdir(d)
                       if f.endswith(".parquet"))
    return {"entries": len(live), "files": n_files}


def maybe_compact(spark, target_dir: str, key_cols,
                  max_entries: int = 8) -> dict | None:
    """Compaction cadence: fold the ledger iff a merged read would
    touch more than `max_entries` live entries (base + deltas). Call
    after each delta append — the maintainer's auto-OPTIMIZE. Bounds
    read amplification at `max_entries` while amortizing each O(table)
    fold over that many O(batch) appends; returns compact()'s result
    when it ran, None when the ledger was within budget.

    Retention horizon: a fold absorbs every live delta, so `as_of`
    reads EARLIER than the new base become unavailable (exactly the
    table formats' vacuum/retention trade). Run it between COMMITTED
    micro-batches — the streaming maintainers replay at most the last
    uncommitted batch, which is always at or above the fold point."""
    amp = read_amplification(target_dir)
    if amp["entries"] <= max_entries:
        return None
    return compact(spark, target_dir, key_cols)


def compact(spark, target_dir: str, key_cols,
            vacuum_absorbed: bool = True) -> dict:
    """Fold the live base + deltas into a new base at the ledger's max
    live sequence. The merged read BEFORE equals the base read AFTER by
    construction (same LWW pick, materialized); returns
    {'new_base': seq, 'removed': [...]}.

    `vacuum_absorbed=False` is the OPTIMIZE/VACUUM split: the fold
    lands (readers that list the ledger from now on touch only the new
    base) but absorbed entries stay on disk — in-flight readers that
    already planned over them never lose a directory, and `as_of` time
    travel keeps working across the fold — until a later `vacuum`
    reclaims them after the retention delay the deployment chooses."""
    import shutil

    live = plan_entries(target_dir)
    if not live:
        raise FileNotFoundError(f"no ledger entries under {target_dir}")
    if len(live) == 1 and live[0][1] == "b":
        return {"new_base": live[0][0], "removed": []}  # already compact
    top = max(s for s, _k in live)
    snapshot = read_merged(spark, target_dir, key_cols).cache()
    snapshot.count()  # materialize BEFORE touching the ledger
    # preserve data-skipping across folds: if any live entry recorded
    # stats, the folded base records them on the same column
    stats_col = next(
        (st["col"] for seq, kind in live
         if (st := entry_stats(target_dir, kind, seq)) is not None),
        None)
    tmp = _entry_dir(target_dir, "b", top) + ".compacting"
    shutil.rmtree(tmp, ignore_errors=True)
    snapshot.write.mode("overwrite").parquet(tmp)
    if stats_col is not None:
        _write_stats(snapshot, tmp, stats_col)
    snapshot.unpersist()
    os.rename(tmp, _entry_dir(target_dir, "b", top))
    removed = vacuum(target_dir) if vacuum_absorbed else []
    return {"new_base": top, "removed": removed}


def vacuum(target_dir: str) -> list:
    """Delete every absorbed entry — anything a fresh merged read no
    longer touches (superseded bases, folded deltas). Run it only after
    in-flight readers have drained (the table formats' retention
    delay); until then absorbed entries serve as_of history and keep
    concurrent readers' plans valid."""
    import shutil

    live = set(plan_entries(target_dir))
    removed = []
    for seq, kind in ledger_entries(target_dir):
        if (seq, kind) not in live:
            shutil.rmtree(_entry_dir(target_dir, kind, seq))
            removed.append(f"{kind}{seq}")
    return removed
