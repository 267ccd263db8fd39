"""Utility `-c`: full-corpus word count vs the shipped golden
trait_wordcount.json (409 catalogues, 82.9k items)."""

from __future__ import annotations

import json
import os

import pytest

REF = "/root/reference"
GOLDEN = os.path.join(REF, "script", "tables", "trait_wordcount.json")

pytestmark = pytest.mark.skipif(
    not os.path.isfile(GOLDEN), reason="reference tree not available")


def test_trait_wordcount_matches_golden(spark):
    from wde_spark.plans.nametable import nametable_rows
    from wde_spark.plans.wordcount import trait_wordcount
    from wde_spark.sources.tei import read_tei_items

    items = read_tei_items(
        spark, os.path.join(REF, "Catalogues", "*", "CAT_*.xml"))
    counts = trait_wordcount(nametable_rows(items))
    mine = {r.word: r.n for r in counts.collect()}

    golden = json.load(open(GOLDEN, encoding="utf-8"))
    # two artifacts of the reference's TSV round-trip, excluded by design:
    # - "" (punctuation-only tokens cleaned to empty),
    # - the header token "trait" counted once by its header-less csv.reader.
    golden.pop("", None)
    header_extra = {"trait": 1}

    missing = {w for w in golden if w not in mine}
    extra = {w for w in mine if w not in golden}
    diffs = {
        w: (golden[w], mine[w])
        for w in golden
        if w in mine and mine[w] + header_extra.get(w, 0) != golden[w]
    }
    assert not missing, f"{len(missing)} missing; sample: {sorted(missing)[:10]}"
    assert not extra, f"{len(extra)} extra; sample: {sorted(extra)[:10]}"
    assert not diffs, f"{len(diffs)} count diffs; sample: {list(diffs.items())[:10]}"
    assert len(mine) >= 10_000
