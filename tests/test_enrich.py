"""Stage `-s` normalization: differential vs the reference's
`result_tojson` run in-process on adversarial SPARQL-JSON fixtures."""

from __future__ import annotations

import json
import os
import random
import sys


import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "script")),
    reason="reference tree not available")


@pytest.fixture(scope="module")
def ref_strings():
    from conftest import stub_reference_deps

    stub_reference_deps()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from script.utils.classes import Strings

    return Strings


def _fixture_docs():
    """SPARQL-JSON docs exercising: cartesian dup, punctuation-variant dup,
    case-variant dup, entity-URI cleaning, timestamp cleaning, absent vars,
    count vars, empty bindings."""
    rng = random.Random(7)
    ent = "http://www.wikidata.org/entity/"
    base_vals = {
        "occupation": [f"{ent}Q36180", f"{ent}Q36180", f"{ent}Q49757"],
        "occupationL": ["writer", "Writer!", "  writer ", "poet"],
        "birth": ["1802-02-26T00:00:00Z", "1802-02-26T00:00:00Z"],
        "workcount": ["312"],
        "citizenshipL": ["France", "france.", "FRANCE", "Spain"],
    }
    docs = []
    for qid_i in range(6):
        all_vars = list(base_vals) + ["neverbound"]
        bindings = []
        n_bind = rng.randint(0, 12)
        for _ in range(n_bind):
            bind = {}
            for v in base_vals:
                if rng.random() < 0.8:
                    bind[v] = {"type": "literal",
                               "value": rng.choice(base_vals[v])}
            bindings.append(bind)
        docs.append((f"Q{1000 + qid_i}", 1, json.dumps(
            {"head": {"vars": all_vars},
             "results": {"bindings": bindings}})))
    return docs


def _ref_result_tojson(Strings, doc: str) -> dict:
    """The reference's normalization loop (classes.py:163-195), driven by
    its own Strings.clean/compare."""
    wd = json.loads(doc)
    out = {}
    var = wd["head"]["vars"]
    for bind in wd["results"]["bindings"]:
        for v in var:
            if v not in out:
                out[v] = [Strings.clean(bind[v]["value"])] if v in bind else []
            elif v in bind and Strings.clean(bind[v]["value"]) not in out[v]:
                same = any(
                    Strings.compare(Strings.clean(bind[v]["value"]), o)
                    for o in out[v]
                )
                if not same:
                    out[v].append(Strings.clean(bind[v]["value"]))
    return out


def test_enrich_matches_reference(spark, ref_strings):
    from wde_spark.plans.enrich import enrich_offline

    docs = _fixture_docs()
    raw = spark.createDataFrame(docs, "qid string, query_idx int, json string")
    got = {r.qid: dict(r.enrichment)
           for r in enrich_offline(raw).collect()}

    for qid, _, doc in docs:
        expected = _ref_result_tojson(ref_strings, doc)
        mine = got.get(qid, {})
        # vars whose binding rows were all absent still appear (as []) in
        # both shapes; compare the full dict
        assert mine == expected, (qid, mine, expected)


def test_sparql_xml_to_json_roundtrip(spark):
    """F18 — SPARQL-XML → SPARQL-JSON conversion feeds the same enrich
    plan and produces identical stores."""
    from wde_spark.plans.enrich import enrich_offline, sparql_xml_to_json
    import json as _json

    xml = """<?xml version="1.0"?>
    <sparql xmlns="http://www.w3.org/2005/sparql-results#">
      <head><variable name="occ"/><variable name="occL"/><variable name="never"/></head>
      <results>
        <result>
          <binding name="occ"><uri>http://www.wikidata.org/entity/Q36180</uri></binding>
          <binding name="occL"><literal xml:lang="en">writer</literal></binding>
        </result>
        <result>
          <binding name="occ"><uri>http://www.wikidata.org/entity/Q36180</uri></binding>
          <binding name="occL"><literal xml:lang="en">Writer!</literal></binding>
        </result>
      </results>
    </sparql>"""
    doc = sparql_xml_to_json(xml)
    assert doc["head"]["vars"] == ["occ", "occL", "never"]
    assert len(doc["results"]["bindings"]) == 2
    assert doc["results"]["bindings"][0]["occL"]["xml:lang"] == "en"

    raw = spark.createDataFrame(
        [("Q42", 1, _json.dumps(doc))], "qid string, query_idx int, json string")
    store = {r.qid: dict(r.enrichment) for r in enrich_offline(raw).collect()}
    assert store == {"Q42": {"occ": ["Q36180"], "occL": ["writer"], "never": []}}


def test_enrichment_store_upsert(spark):
    """S5 upsert semantics on the store (last write wins per qid)."""
    from wde_spark.sources.cache import upsert

    old = spark.createDataFrame(
        [("Q1", "a"), ("Q2", "b")], "qid string, payload string")
    new = spark.createDataFrame(
        [("Q2", "B"), ("Q3", "c")], "qid string, payload string")
    got = {r.qid: r.payload for r in upsert(old, new, key="qid").collect()}
    assert got == {"Q1": "a", "Q2": "B", "Q3": "c"}
