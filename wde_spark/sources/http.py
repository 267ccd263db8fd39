"""Live external-lookup sources — SURVEY.md §2.1 S8 (Wikidata full-text
search REST API) and S9 (WDQS SPARQL endpoint).

Reference parity: script/itemtoid.py:45-114 (GET w/api.php?action=query&
list=search&srlimit=1, gzip, custom UA, certitude scoring) and
script/sparql.py:19-92 (SPARQLWrapper against query.wikidata.org, JSON with
XML fallback).

Spark shape (SURVEY.md §2.10): the network boundary is a `mapPartitions`
client —
- queries are **deduplicated and cache-anti-joined before any fetch**
  (strictly better than the reference, which memoizes but never batches);
- one HTTP session per partition, reused across rows, with a politeness
  delay (API etiquette) — parallelism is capped by partition count, so
  `repartition(n_workers)` IS the rate limiter;
- every fetched row comes back as a normal DataFrame row and is merged
  into the cache table (sources/cache.upsert), so a re-run touches the
  network only for misses (the reference's resume semantics, P1, with no
  log files).

Offline by default: tests and the driver environment have no network;
`fetch_fn` is injectable, and `offline_fetcher` replays from a cache
table. The stdlib `urllib` client is used (no third-party HTTP dep).
"""

from __future__ import annotations

import json
import time
import urllib.parse
import urllib.request
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F

from .cache import CACHE_SCHEMA

USER_AGENT = "wde-spark/1.0 (PySpark WikidataEnrichment engine)"
SEARCH_URL = "https://www.wikidata.org/w/api.php"
WDQS_URL = "https://query.wikidata.org/sparql"

FetchFn = Callable[[str], dict]


def _http_get_json(url: str, params: dict, timeout: float = 30.0) -> dict:
    q = urllib.parse.urlencode(params)
    req = urllib.request.Request(
        f"{url}?{q}",
        headers={"User-Agent": USER_AGENT, "Accept-Encoding": "gzip"},
    )
    import gzip as _gzip

    with urllib.request.urlopen(req, timeout=timeout) as resp:
        data = resp.read()
        if resp.headers.get("Content-Encoding") == "gzip":
            data = _gzip.decompress(data)
    return json.loads(data)


def wikidata_search_fetcher(delay_s: float = 0.2,
                            timeout: float = 30.0) -> FetchFn:
    """S8 — srlimit=1 full-text search; returns the reference's result
    shape {qid, title, snippet} ('' on no hit), itemtoid.py:65-88."""
    import re

    def fetch(qstr: str) -> dict:
        time.sleep(delay_s)
        js = _http_get_json(SEARCH_URL, {
            "action": "query", "list": "search", "srsearch": qstr.strip(),
            "srlimit": 1, "srprop": "title|titlesnippet|snippet",
            "format": "json",
        }, timeout)
        try:
            hit = js["query"]["search"][0]
            strip = lambda s: re.sub(r"<.*?>", "", s)
            return {"qid": hit["title"], "title": strip(hit["titlesnippet"]),
                    "snippet": strip(hit["snippet"])}
        except (KeyError, IndexError):
            return {"qid": "", "title": "", "snippet": ""}

    return fetch


def sparql_fetcher(delay_s: float = 0.5, timeout: float = 60.0) -> FetchFn:
    """S9 — one SPARQL query against WDQS, SPARQL-JSON out
    (sparql.py:60-67; the XML fallback ladder stays client-side)."""

    def fetch(query: str) -> dict:
        time.sleep(delay_s)
        return _http_get_json(WDQS_URL, {"query": query, "format": "json"},
                              timeout)

    return fetch


def offline_fetcher(cache_rows: dict[str, tuple]) -> FetchFn:
    """Replay fetcher for tests/CI: a dict snapshot of the cache table."""

    def fetch(qstr: str) -> dict:
        qid, title, snippet = cache_rows.get(qstr, ("", "", ""))[:3]
        return {"qid": qid, "title": title, "snippet": snippet}

    return fetch


def fetch_search_results(queries: DataFrame, fetch_fn: FetchFn,
                         qstr_col: str = "qstr",
                         n_workers: int = 4) -> DataFrame:
    """Fetch search results for every *distinct* query string, from
    `n_workers` concurrent partitions (the parallelism/politeness knob).
    Returns rows in the cache-table schema, certitude left false — score
    it with functions.classify.certitude against the query's qdict."""
    distinct = queries.select(qstr_col).distinct().repartition(n_workers)

    def work(rows: Iterator[Row]) -> Iterator[Row]:
        for r in rows:
            qstr = r[qstr_col]
            out = fetch_fn(qstr)
            yield Row(part=qstr[:1], qstr=qstr, qid=out["qid"],
                      title=out["title"], snippet=out["snippet"], cert=False)

    return queries.sparkSession.createDataFrame(
        distinct.rdd.mapPartitions(work), CACHE_SCHEMA)


def resolve_live(nametable: DataFrame, cache: DataFrame,
                 fetch_fn: FetchFn, max_waves: int | None = None,
                 n_workers: int = 4) -> tuple[DataFrame, DataFrame]:
    """Live stage `-i`: wave-by-wave ladder descent preserving the
    reference's early-exit API economy (SURVEY.md §4) —

        wave r: rows still unresolved try their rank-r candidate:
                cache join first, then ONE batched fetch for the misses;
                hits (qid != '') retire their row.

    Each wave is a join + an anti-join + a bounded fetch; no row ever
    fetches a candidate later than its first hit. Returns
    (resolved DataFrame in nametable_out shape, updated cache table)."""
    from ..plans.resolve import attach_qdicts, resolve_offline
    from .cache import upsert

    qd = attach_qdicts(nametable)
    from ..plans.resolve import _candidates_batch  # same kernel as offline
    from pyspark.sql import types as T

    with_cands = qd.mapInPandas(
        _candidates_batch,
        schema=T.StructType(
            list(qd.schema.fields)
            + [T.StructField("candidates", T.ArrayType(T.StringType())),
               T.StructField("cand_certs", T.ArrayType(T.BooleanType()))]),
    )
    n_ranks = max_waves or (with_cands.agg(
        F.max(F.size("candidates"))).collect()[0][0] or 0)

    key = ["catalogue_id", "item_pos", "row_pos"]
    remaining = with_cands.select(*key, "candidates")
    cur_cache = cache
    for rank in range(n_ranks):
        wave = (
            remaining.select(
                *key,
                F.try_element_at("candidates", F.lit(rank + 1)).alias("qstr"))
            .filter(F.col("qstr").isNotNull())
        )
        misses = (
            wave.select("qstr").distinct()
            .join(cur_cache.select("qstr"), "qstr", "left_anti")
        )
        fetched = fetch_search_results(misses, fetch_fn, n_workers=n_workers)
        # localCheckpoint: the loop would otherwise stack one join lineage
        # per wave onto every later plan
        cur_cache = upsert(cur_cache, fetched).localCheckpoint(eager=True)
        hits = wave.join(cur_cache.filter(F.col("qid") != ""), "qstr") \
            .select(*key)
        remaining = remaining.join(hits, key, "left_anti") \
            .localCheckpoint(eager=True)
        if remaining.isEmpty():
            break
    # with the cache now covering every candidate any unresolved row can
    # reach, the offline plan computes the final assignment in one pass;
    # certitude is rescored (fresh fetches carry no recorded certitude)
    return resolve_offline(nametable, cur_cache,
                           certitude_source="computed"), cur_cache
