"""J6/A5/W4 differential — our generated WDQS enrichment queries must be
token-identical to what the reference's `config_sparql` sends
(script/sparql.py:167-364). Captured by stubbing `launch_sparql`; compared
whitespace-normalized (SPARQL is whitespace-insensitive; the reference's
indentation is an f-string artifact)."""

import os
import re
import sys

import pytest

from wde_spark.sources.wdqs import config_queries

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "script")),
    reason="reference tree not available")


def _norm(q: str) -> str:
    return re.sub(r"\s+", " ", q).strip()


@pytest.fixture(scope="module")
def ref_sparql():
    from conftest import stub_reference_deps

    stub_reference_deps()
    sys.path.insert(0, REF)
    import script.sparql as ref_sparql

    yield ref_sparql
    sys.path.remove(REF)


def test_config_queries_match_reference(ref_sparql):
    for qid in ("Q535", "Q42"):
        captured: list[str] = []
        orig = ref_sparql.launch_sparql
        ref_sparql.launch_sparql = lambda q, w_id: captured.append(q) or {}
        try:
            ref_sparql.config_sparql(qid)
        finally:
            ref_sparql.launch_sparql = orig
        ours = config_queries(qid)
        assert len(captured) == 4
        for i, (ref_q, our_q) in enumerate(zip(captured, ours)):
            assert _norm(our_q) == _norm(ref_q), f"query {i + 1} diverges"


def test_reference_bugs_reproduced():
    q1 = config_queries("Q1")[0]
    assert "wdt:119 ?burialplace" in q1       # missing 'P' kept
    assert "wdt:P570 ?deathplace" in q1       # death-date property kept


def test_enrich_live_offline_replay(spark):
    """enrich_live over a canned fetcher: the 4-query grid is fetched per
    QID, resume-filtered, and normalized into the enrichment store."""
    import json as _json

    from wde_spark.sources.wdqs import enrich_live

    def fake_fetch(query: str) -> dict:
        # echo a single binding naming which query index ran, derived from a
        # var unique to each query text
        marker = ("instance" if "?instance" in query else
                  "educ" if "?educ" in query else
                  "title" if "?title" in query else "viafID")
        return {"head": {"vars": [marker]},
                "results": {"bindings": [
                    {marker: {"type": "literal", "value": f"v-{marker}"}}]}}

    qids = spark.createDataFrame([("Q1",), ("Q2",), ("Q3",)], "qid string")
    done = spark.createDataFrame([("Q3",)], "qid string")
    out = enrich_live(qids, fake_fetch, done=done, n_workers=2).collect()
    assert sorted(r.qid for r in out) == ["Q1", "Q2"]
    for r in out:
        m = dict(r.enrichment)
        assert m == {"instance": ["v-instance"], "educ": ["v-educ"],
                     "title": ["v-title"], "viafID": ["v-viafID"]}
