"""Declarative data-quality expectations — the admission control a 100 TB
ingest runs before data reaches the pipeline (the dbt-test / Delta-
constraint counterpart, engine-side).

Checks are DATA, not code: build a list with the `check_*` constructors,
run them with `run_expectations`, get one row per check
(check, violations, total, ok). Execution shape:

- all ROW-LOCAL checks (not-null, range, accepted-values, regex) fold
  into ONE conditional aggregation over a single scan — adding a check
  adds a sum(CASE...), never a pass;
- `check_unique` is one extra hash agg (count minus distinct count over
  non-NULL keys — dbt ignore-NULL semantics: rows with any NULL key
  column are excluded, they are `check_not_null`'s job);
- `check_fk` is one anti-join per referenced dimension, broadcast when
  the dimension is small (the usual case).

Violations COUNT, they do not fail the job — the caller decides (gate,
quarantine, alert); a NULL in a range/accepted check is NOT a violation
(that is `check_not_null`'s job, mirroring SQL three-valued logic).
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class Check(NamedTuple):
    name: str
    kind: str            # 'rowlocal' | 'unique' | 'fk'
    predicate: Column | None = None       # rowlocal: TRUE == violated
    cols: tuple[str, ...] = ()            # unique: the key columns
    dim: DataFrame | None = None          # fk: referenced dimension
    dim_col: str | None = None
    col: str | None = None                # fk: referencing column


def check_not_null(col: str) -> Check:
    return Check(f"not_null:{col}", "rowlocal", F.col(col).isNull())


def check_range(col: str, lo=None, hi=None) -> Check:
    c = F.lit(False)
    if lo is not None:
        c = c | (F.col(col) < lo)
    if hi is not None:
        c = c | (F.col(col) > hi)
    return Check(f"range:{col}", "rowlocal", F.col(col).isNotNull() & c)


def check_accepted(col: str, values: list) -> Check:
    return Check(f"accepted:{col}", "rowlocal",
                 F.col(col).isNotNull() & ~F.col(col).isin(values))


def check_regex(col: str, pattern: str) -> Check:
    return Check(f"regex:{col}", "rowlocal",
                 F.col(col).isNotNull() & ~F.col(col).rlike(pattern))


def check_unique(*cols: str) -> Check:
    return Check(f"unique:{','.join(cols)}", "unique", cols=tuple(cols))


def check_fk(col: str, dim: DataFrame, dim_col: str) -> Check:
    return Check(f"fk:{col}", "fk", dim=dim, dim_col=dim_col, col=col)


def run_expectations(df: DataFrame, checks: list[Check]) -> DataFrame:
    """One row per check: (check, violations, total, ok), ordered by check
    name for deterministic output."""
    spark = df.sparkSession
    total = F.count(F.lit(1)).alias("total")

    parts: list[DataFrame] = []
    onescan = [c for c in checks if c.kind in ("rowlocal", "unique")]
    if onescan:
        cols = []
        for i, c in enumerate(onescan):
            if c.kind == "rowlocal":
                # SUM over zero rows is NULL, not 0
                cols.append(F.coalesce(
                    F.sum(F.when(c.predicate, 1).otherwise(0)), F.lit(0))
                    .alias(f"v{i}"))
            else:  # unique: mixed distinct agg rides the same scan (Expand)
                # dbt ignore-NULL semantics, explicitly: rows where ANY key
                # column is NULL are excluded from the uniqueness count
                # entirely (they are `check_not_null`'s job). Without the
                # guard, count_distinct(struct(...)) would count the
                # all-NULL struct as one distinct value — n NULL-key rows
                # would score n-1 violations here while a SQL
                # COUNT(col)-COUNT(DISTINCT col) oracle scores 0.
                notnull = F.lit(True)
                for x in c.cols:
                    notnull = notnull & F.col(x).isNotNull()
                keyed = F.when(notnull,
                               F.struct(*[F.col(x) for x in c.cols]))
                cols.append((F.count(keyed) - F.count_distinct(keyed))
                            .alias(f"v{i}"))
        agg = df.agg(total, *cols)
        # ONE agg exploded into per-check rows. A per-check `.select` over
        # the agg would make each union branch a separate subtree that
        # RE-EVALUATES the aggregation — N checks, N full scans (measured:
        # 14 scans / 8.5 s for six checks at sf0.1; this form, one scan
        # for every row-local + uniqueness check together).
        parts.append(agg.select(
            F.explode(F.array(*[
                F.struct(
                    F.lit(c.name).alias("check"),
                    F.col(f"v{i}").cast("long").alias("violations"),
                ) for i, c in enumerate(onescan)
            ])).alias("p"),
            F.col("total").cast("long").alias("total"),
        ).select("p.check", "p.violations", "total"))
    for c in checks:
        if c.kind == "fk":
            n_total = df.agg(F.count(F.lit(1)).alias("t"))
            orphans = (
                df.select(F.col(c.col))
                .filter(F.col(c.col).isNotNull())
                .join(c.dim.select(F.col(c.dim_col).alias(c.col)).distinct(),
                      c.col, "left_anti")
                .agg(F.count(F.lit(1)).alias("v"))
            )
            parts.append(orphans.crossJoin(n_total).select(
                F.lit(c.name).alias("check"),
                F.col("v").cast("long").alias("violations"),
                F.col("t").cast("long").alias("total"),
            ))
    if not parts:
        return spark.createDataFrame(
            [], "check string, violations long, total long, ok boolean")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn("ok", F.col("violations") == 0) \
        .orderBy("check")
