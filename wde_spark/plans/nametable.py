"""Nametable builder — stage `-n` (SURVEY.md §3.1 first step; §2.3 J4).

Reference parity: script/utils/nametable.py:19-118 (`csvbuilder`): per
tei:item, pair names with traits by position when counts line up, else fall
back to `"; "`-joined lists — the five cases below, byte-identical including
the reference's selective whitespace normalization (case 3 writes raw
strings; the others collapse whitespace without trimming).

Spark-first shape: the whole case analysis is a single row-local column
expression producing `array<struct<name,trait>>`, then one `posexplode` —
no UDF, no shuffle; Catalyst sees it all and whole-stage-codegens it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _norm(c: Column) -> Column:
    # `s.replace("\n", "")` then `re.sub(r"\s+", " ", s)` — NO trim
    # (nametable.py:68 et al.)
    return F.regexp_replace(F.regexp_replace(c, "\n", ""), r"\s+", " ")


def _pair(name: Column, trait: Column) -> Column:
    return F.struct(name.alias("name"), trait.alias("trait"))


def nametable_rows(items: DataFrame) -> DataFrame:
    """items(catalogue_id, item_pos, xml_id, names, traits) →
    nametable(xml_id, wd_id='', name, trait) with ordering columns
    (catalogue_id, item_pos, row_pos) preserved."""
    names, traits = F.col("names"), F.col("traits")
    n, t = F.size(names), F.size(traits)
    joined_names = F.array_join(F.transform(names, _norm), "; ")
    joined_traits = F.array_join(F.transform(traits, _norm), "; ")

    rows = (
        # case 1 — no traits: single name, or "; "-joined name list
        F.when(
            t == 0,
            F.when(n == 1, F.array(_pair(_norm(names[0]), F.lit(""))))
            .otherwise(F.array(_pair(joined_names, F.lit("")))),
        )
        # case 2 — count mismatch, several traits: one row of joined lists
        .when((t != n) & (t > 1), F.array(_pair(joined_names, joined_traits)))
        # case 3 — count mismatch, exactly one trait: trait goes to the
        # FIRST name; raw (un-normalized) values, per the reference
        .when(
            (t != n) & (t == 1),
            F.transform(
                names,
                lambda x, i: _pair(x, F.when(i == 0, traits[0]).otherwise(F.lit(""))),
            ),
        )
        # case 4 — aligned counts > 1: positional zip (J4)
        .when((t == n) & (n > 1),
              F.zip_with(names, traits, lambda a, b: _pair(_norm(a), _norm(b))))
        # case 5 — exactly one of each
        .otherwise(F.array(_pair(_norm(names[0]), _norm(traits[0])))))

    return (
        items.select(
            "catalogue_id", "item_pos", "xml_id",
            F.posexplode(rows).alias("row_pos", "pair"),
        )
        .select(
            "catalogue_id", "item_pos", "row_pos", "xml_id",
            F.lit("").alias("wd_id"),
            F.col("pair.name").alias("name"),
            F.col("pair.trait").alias("trait"),
        )
    )
