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

from pyspark.sql import Column, DataFrame
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
