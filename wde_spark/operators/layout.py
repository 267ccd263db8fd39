"""Data-layout operators — clustering a table so scans can skip data.

At 100 TB the scan is the dominant cost, and parquet min/max statistics
(per row group / per file) let a filtered scan skip everything whose stats
exclude the predicate. Skipping only works if the layout CLUSTERS the
filter columns:

- one column → `repartitionByRange` + `sortWithinPartitions` on it;
- several columns queried together → a space-filling curve: map the tuple
  to one integer that preserves locality in EVERY dimension, then
  range-partition and sort by it. This is the Z-order (Morton) clustering
  the lakehouse formats expose as `OPTIMIZE ... ZORDER BY`; here it is a
  plain column expression + a range write, so it needs no table format.

`tests/test_scale_layout.py` proves the effect mechanically: after
Z-ordering, the fraction of files whose [min, max] ranges survive a
two-column point/range predicate collapses versus the natural layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def zorder_value(a: str, b: str, bits: int = 16) -> Column:
    """Morton/Z-curve value interleaving the low `bits` bits of two
    non-negative integer column expressions (SQL strings). Row-local — a
    pure expression, no shuffle; 2×`bits` output bits must fit a long."""
    assert 1 <= bits <= 31
    return F.expr(
        f"""
        aggregate(
          sequence(0, {bits - 1}), 0L,
          (acc, i) -> acc
            | shiftleft(shiftright(cast(({a}) as bigint), i) & 1L, 2 * i)
            | shiftleft(shiftright(cast(({b}) as bigint), i) & 1L, 2 * i + 1))
        """
    )


def write_zordered(
    df: DataFrame, out: str, a: str, b: str,
    n_files: int = 16, bits: int = 16,
) -> None:
    """Cluster `df` on the Z-curve of (a, b) and write `n_files` parquet
    files: range-partition on the z-value (each file owns a contiguous
    curve segment → tight min/max on BOTH source columns), sort within each
    file (tight row-group stats too), then drop the helper column — the
    projection is narrow, so the clustering survives the write."""
    (
        df.withColumn("_z", zorder_value(a, b, bits))
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite").parquet(out)
    )


def export_shards(df: DataFrame, docs_per_shard: int,
                  id_col: str = "doc_id", salt: str = "wde",
                  n_buckets: int = 256) -> DataFrame:
    """Deterministic GLOBAL SHUFFLE + fixed-size shard assignment — the
    last stage of a training-data pipeline (docs leave the engine as
    uniformly shuffled, reproducible shards; a model's data order must
    not follow ingest order, and re-running the export on the same
    corpus must yield byte-identical shards).

    Every row gets (global_rank, shard_id, seq_in_shard) under the total
    order of a salted md5 of its id — content-free, uniform, and
    engine-independent. The ranking is the scale-safe TWO-PHASE form,
    never a single-partition window:

      1. bucket = first `n_buckets`-slice of the hash (one scan);
      2. per-bucket counts -> driver (n_buckets rows, the k-means
         collect pattern) -> cumulative offsets rejoined as a broadcast
         n_buckets-row table;
      3. local rank inside each bucket (window PARTITIONED BY bucket —
         ~n/n_buckets rows per partition at any corpus size);
      4. global_rank = offset[bucket] + local_rank.

    Equivalent to ROW_NUMBER() OVER (ORDER BY hash) because bucket order
    is the hash's own prefix order: ranks within bucket b all sort after
    every bucket < b. At 100 TB raise `n_buckets` (hex prefix length) so
    buckets stay executor-sized; the driver still sees only n_buckets
    rows."""
    assert docs_per_shard > 0
    hx = F.md5(F.concat(F.lit(salt + "|"),
                        F.col(id_col).cast("string")))
    # prefix length that yields exactly n_buckets hex buckets
    plen = 1
    while 16 ** plen < n_buckets:
        plen += 1
    keyed = df.withColumn("_hx", hx).withColumn(
        "_bkt", F.substring("_hx", 1, plen))
    counts = keyed.groupBy("_bkt").agg(F.count("*").alias("_c"))
    rows = sorted((r["_bkt"], r["_c"]) for r in counts.collect())
    offs, acc = [], 0
    for b, c in rows:
        offs.append((b, acc))
        acc += c
    spark = df.sparkSession
    off_df = spark.createDataFrame(offs, "_bkt string, _off long")
    w = Window.partitionBy("_bkt").orderBy("_hx", id_col)
    ranked = (
        keyed.join(F.broadcast(off_df), "_bkt")
        .withColumn("_lr", F.row_number().over(w))
        .withColumn("global_rank", (F.col("_off") + F.col("_lr"))
                    .cast("long"))
    )
    return (
        ranked.withColumn(
            "shard_id",
            ((F.col("global_rank") - 1) / docs_per_shard)
            .cast("long"))
        .withColumn(
            "seq_in_shard",
            ((F.col("global_rank") - 1) % docs_per_shard).cast("long"))
        .drop("_hx", "_bkt", "_off", "_lr")
    )


def shard_manifest_increment(n_so_far: int, batch: DataFrame,
                             docs_per_shard: int,
                             id_col: str = "doc_id",
                             salt: str = "wde") -> DataFrame:
    """APPEND-ONLY shard assignment for a new batch: rows rank
    deterministically WITHIN the batch (the same salted-hash two-phase
    ranking as `export_shards`) and take global ranks after the
    `n_so_far` rows already exported — the last partial shard fills
    first, then new shards open. `n_so_far` is ledger metadata (one
    count), never a scan of prior manifests.

    Semantics contract (pinned in tests): composing increments over
    batches B1..Bn equals ranking each batch independently and
    concatenating — ARRIVAL-ORDER sharding. This is deliberately NOT
    `export_shards` over the union (corpus-wide hash order): an
    append-only stream cannot re-rank history, and shards already
    shipped to trainers must never be rewritten. Re-sharding the world
    is the batch operator's job."""
    assert n_so_far >= 0
    shifted = export_shards(batch, docs_per_shard, id_col, salt) \
        .withColumn("global_rank",
                    (F.col("global_rank") + n_so_far).cast("long"))
    return (
        shifted.withColumn(
            "shard_id",
            ((F.col("global_rank") - 1) / docs_per_shard).cast("long"))
        .withColumn(
            "seq_in_shard",
            ((F.col("global_rank") - 1) % docs_per_shard).cast("long"))
    )
