"""Audit every registry query for driver-hash-unsafe output types.

The round driver compares Spark output vs the DuckDB oracle by hashing a
pandas canonicalization of both result sets. Three whole classes of
representation divergence have produced false-red rows even when every
value was identical:

  1. DECIMAL outputs  — DuckDB DECIMAL -> pandas float64, Spark -> Decimal
     objects (r3 `merge_changeset_orders`).
  2. HUGEINT widening — DuckDB `SUM(BIGINT)` widens to HUGEINT (r1 q12,
     r3 `json_props_stats_events`).
  3. ARRAY columns    — the driver canonicalizer crashes sorting list
     cells ("unhashable type: list", r2 `multimodal_features`).

Plus the latent ones we refuse to ship: TIMESTAMP (unit/NTZ churn across
testdata regenerations), FLOAT32 (repr divergence vs double), MAP/STRUCT/
BINARY (canonicalizer-hostile), and any canonical-type mismatch between
the two engines for the same column.

This tool derives the Spark output schema (lazy — no job run for plan-only
queries) and `DESCRIBE`s the oracle SQL in DuckDB, maps both to a canonical
type lattice {int, double, str, bool, date}, and fails loudly on anything
outside it or any cross-engine mismatch.

Usage: python tools/check_hash_safety.py [sf_dir] [query ...]
Exit 0 = every checked slot is hash-safe.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

# Canonical safe lattice. Everything else is a finding.
_SPARK_SAFE = {
    "bigint": "int", "int": "int", "smallint": "int", "tinyint": "int",
    "double": "double",
    "string": "str",
    "boolean": "bool",
    "date": "date",
}

_DUCK_SAFE = {
    "BIGINT": "int", "INTEGER": "int", "SMALLINT": "int", "TINYINT": "int",
    "UINTEGER": "int", "USMALLINT": "int", "UTINYINT": "int",
    "DOUBLE": "double",
    "VARCHAR": "str",
    "BOOLEAN": "bool",
    "DATE": "date",
}

# Oracle-text heuristics for aggregates that widen before an outer CAST can
# be checked schema-side (DESCRIBE already catches the widened type; these
# patterns exist to point at the offending expression in the report).
_HUGEINT_HINT = re.compile(r"(?<!CAST\()\bSUM\s*\(", re.IGNORECASE)


def spark_findings(name, schema):
    out = []
    for f in schema.fields:
        t = f.dataType.simpleString()
        if t not in _SPARK_SAFE:
            out.append(f"spark col `{f.name}` type {t}")
    return out


def duck_findings(name, desc_rows):
    out = []
    for col, typ in desc_rows:
        base = typ.split("(")[0].strip().upper()
        if typ.upper() not in _DUCK_SAFE and base not in _DUCK_SAFE:
            out.append(f"duck col `{col}` type {typ}")
    return out


def mismatch_findings(schema, desc_rows):
    out = []
    duck = {c: t for c, t in desc_rows}
    for f in schema.fields:
        st = _SPARK_SAFE.get(f.dataType.simpleString())
        dt_raw = duck.get(f.name)
        if dt_raw is None:
            continue  # column-set mismatch is the driver's own check
        dt = _DUCK_SAFE.get(dt_raw.upper()) or _DUCK_SAFE.get(
            dt_raw.split("(")[0].strip().upper()
        )
        if st and dt and st != dt:
            out.append(
                f"engine type mismatch on `{f.name}`: spark {st} vs duck {dt}"
            )
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import duckdb

    from wde_spark.core.session import get_session
    from wde_spark.core.catalog import TABLES
    from wde_spark.queries import QUERIES, ORACLE

    spark = get_session("check_hash_safety", cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    n_bad = n_ok = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        findings = []
        try:
            schema = fn(spark, sf_dir).schema
        except Exception as e:  # noqa: BLE001
            findings.append(f"SPARK ERROR {type(e).__name__}: {str(e)[:200]}")
            schema = None
        if schema is not None:
            findings += spark_findings(name, schema)
        desc = None
        if name in ORACLE:
            try:
                desc = [
                    (r[0], r[1])
                    for r in con.execute(
                        "DESCRIBE " + ORACLE[name]
                    ).fetchall()
                ]
            except Exception as e:  # noqa: BLE001
                findings.append(
                    f"ORACLE DESCRIBE ERROR {type(e).__name__}: {str(e)[:200]}"
                )
            if desc is not None:
                findings += duck_findings(name, desc)
                if schema is not None:
                    findings += mismatch_findings(schema, desc)
        if findings:
            n_bad += 1
            print(f"UNSAFE {name}")
            for x in findings:
                print(f"    {x}")
            if name in ORACLE and _HUGEINT_HINT.search(ORACLE[name]) and any(
                "HUGEINT" in x for x in findings
            ):
                print("    hint: wrap the SUM as CAST(SUM(...) AS BIGINT)")
        else:
            n_ok += 1
    print(f"\n{n_ok} safe, {n_bad} unsafe")
    spark.stop()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
