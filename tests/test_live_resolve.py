"""Live-mode resolution: wave-by-wave ladder with a counting fake
transport — verifies (a) result equality with offline mode, (b) the
early-exit API economy (no row fetches a candidate past its first hit,
queries are deduplicated before fetching)."""

from __future__ import annotations

import csv
import os

import pytest

REF = "/root/reference"
GOLDEN = os.path.join(REF, "script", "tables", "nametable_test_withid.tsv")

pytestmark = pytest.mark.skipif(
    not os.path.isfile(GOLDEN), reason="reference tree not available")


def test_resolve_live_matches_offline(spark):
    from wde_spark.sources.cache import read_query_cache
    from wde_spark.sources.http import resolve_live
    from wde_spark.plans.resolve import resolve_offline

    rows = []
    with open(GOLDEN, encoding="utf-8") as f:
        for i, r in enumerate(csv.reader(f, delimiter="\t", quotechar='"')):
            rows.append(("TEST", 0, i, r[0], r[2], r[3]))
    nt = spark.createDataFrame(
        rows[:60],
        "catalogue_id string, item_pos int, row_pos int, xml_id string,"
        "name string, trait string",
    )

    full_cache = read_query_cache(
        spark, os.path.join(REF, "script", "logs", "idqueried_*.json")).cache()
    snapshot = {r.qstr: (r.qid, r.title, r.snippet) for r in full_cache.collect()}

    # fetch_fn runs in executor worker processes — log fetches through the
    # (shared, local-mode) filesystem, O_APPEND is atomic per line
    import tempfile

    log_path = tempfile.mktemp(suffix=".fetchlog")

    def counting_fetch(qstr: str) -> dict:
        with open(log_path, "a", encoding="utf-8") as fh:
            fh.write(qstr + "\n")
        qid, title, snippet = snapshot.get(qstr, ("", "", ""))
        return {"qid": qid, "title": title, "snippet": snippet}

    empty_cache = full_cache.limit(0)
    resolved_live, final_cache = resolve_live(
        nt, empty_cache, counting_fetch, n_workers=2)
    live = {r.tei_xml_id: r.wd_id
            for r in resolved_live.collect()}

    # same answers as running offline against the full recorded cache,
    # except certitude: fetched entries default to False pending rescoring
    offline = {r.tei_xml_id: r.wd_id
               for r in resolve_offline(nt, full_cache).collect()}
    assert live == offline

    with open(log_path, encoding="utf-8") as fh:
        seen = [ln.rstrip("\n") for ln in fh if ln.strip()]
    os.unlink(log_path)
    fetch_count = {"n": len(seen)}
    # economy: every query fetched at most once (dedup across rows+waves)
    assert len(seen) == len(set(seen))
    # economy: strictly fewer fetches than the total candidate universe
    from wde_spark.plans.resolve import attach_qdicts, _candidates_batch
    from pyspark.sql import types as T
    qd = attach_qdicts(nt)
    wc = qd.mapInPandas(
        _candidates_batch,
        schema=T.StructType(list(qd.schema.fields)
                            + [T.StructField("candidates",
                                             T.ArrayType(T.StringType())),
                               T.StructField("cand_certs",
                                             T.ArrayType(T.BooleanType()))]))
    all_cands = set()
    n_first = 0
    for r in wc.select("candidates").collect():
        all_cands.update(r.candidates or [])
        n_first += 1 if r.candidates else 0
    assert n_first <= fetch_count["n"] <= len(all_cands)


def test_synthetic_cache_hit_rate_sweep(spark):
    """Reference `makedummy` generalized: sweep controlled cache hit-rates
    through the live-resolve waves and assert the fetch economy —
    (a) a cached query is NEVER fetched, (b) fetch volume is monotone
    non-increasing in hit rate, (c) full coverage fetches nothing."""
    import csv as _csv
    import tempfile

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from wde_spark.plans.resolve import _candidates_batch, attach_qdicts
    from wde_spark.sources.cache import synthetic_cache
    from wde_spark.sources.http import resolve_live

    rows = []
    with open(GOLDEN, encoding="utf-8") as f:
        for i, r in enumerate(_csv.reader(f, delimiter="\t", quotechar='"')):
            rows.append(("TEST", 0, i, r[0], r[2], r[3]))
    nt = spark.createDataFrame(
        rows[:40],
        "catalogue_id string, item_pos int, row_pos int, xml_id string,"
        "name string, trait string",
    )
    qd = attach_qdicts(nt)
    wc = qd.mapInPandas(
        _candidates_batch,
        schema=T.StructType(list(qd.schema.fields)
                            + [T.StructField("candidates",
                                             T.ArrayType(T.StringType())),
                               T.StructField("cand_certs",
                                             T.ArrayType(T.BooleanType()))]))
    universe = wc.select(F.explode("candidates").alias("qstr"))

    fetched_by_rate = {}
    for rate in (0.0, 0.5, 1.0):
        cache = synthetic_cache(universe, rate)
        cached_keys = {r.qstr for r in cache.select("qstr").collect()}
        log_path = tempfile.mktemp(suffix=".fetchlog")

        def miss_fetch(qstr: str, _p=log_path) -> dict:
            with open(_p, "a", encoding="utf-8") as fh:
                fh.write(qstr + "\n")
            return {"qid": "", "title": "", "snippet": ""}

        resolved, _ = resolve_live(nt, cache, miss_fetch, n_workers=2)
        resolved.collect()
        try:
            with open(log_path, encoding="utf-8") as fh:
                fetched = {ln.rstrip("\n") for ln in fh if ln.strip()}
        except FileNotFoundError:
            fetched = set()
        else:
            os.unlink(log_path)
        assert not (fetched & cached_keys), \
            f"hit_rate={rate}: cached queries were re-fetched"
        fetched_by_rate[rate] = len(fetched)

    assert fetched_by_rate[1.0] == 0
    assert fetched_by_rate[0.0] >= fetched_by_rate[0.5] >= fetched_by_rate[1.0]
    assert fetched_by_rate[0.0] > fetched_by_rate[0.5], \
        "a 50% cache must absorb some fetches"
