"""Property-based differentials: the scalable formulations of the temporal
and graph operators (union+carry-forward as-of join, bucketed range join,
min-label-propagation components) must equal brute-force reference
implementations on arbitrary small inputs — including the adversarial
cases fixed-fixture tests miss (duplicate timestamps, bucket-boundary
values, chains longer than one propagation round)."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from wde_spark.operators import graph as G
from wde_spark.operators import relational as R

BASE = dt.datetime(2024, 1, 1)


def _ts(sec: int) -> dt.datetime:
    return BASE + dt.timedelta(seconds=sec)


events = st.lists(
    st.tuples(st.integers(0, 2),      # user
              st.integers(0, 40),     # seconds offset
              st.integers(0, 999)),   # payload
    min_size=0, max_size=12,
)


@settings(max_examples=12, deadline=None)
@given(left=events, right=events)
def test_asof_join_matches_bruteforce(spark, left, right):
    ldf = spark.createDataFrame(
        [(u, _ts(s), i, float(v)) for i, (u, s, v) in enumerate(left)],
        "user_id long, ts timestamp, event_id long, value double",
    )
    rdf = spark.createDataFrame(
        [(u, _ts(s), 1000 + i, float(v)) for i, (u, s, v) in enumerate(right)],
        "user_id long, ts timestamp, event_id long, value double",
    )
    out = {
        r.event_id: (r.asof.event_id if r.asof else None)
        for r in R.asof_join(
            ldf.select("user_id", "ts", "event_id"), rdf,
            on="user_id", ts_col="ts", payload_cols=["value"],
            tie_col="event_id",
        ).collect()
    }
    # brute force: max (ts, event_id) among right rows with ts <= left.ts
    rrows = [(u, _ts(s), 1000 + i) for i, (u, s, _) in enumerate(right)]
    for i, (u, s, _) in enumerate(left):
        cands = [(ts, eid) for (ru, ts, eid) in rrows
                 if ru == u and ts <= _ts(s)]
        expect = max(cands)[1] if cands else None
        assert out[i] == expect, (i, u, s)


@settings(max_examples=12, deadline=None)
@given(left=events, right=events, window=st.sampled_from([5, 7, 16]))
def test_range_join_matches_bruteforce(spark, left, right, window):
    ldf = spark.createDataFrame(
        [(u, _ts(s), i) for i, (u, s, _) in enumerate(left)],
        "user_id long, ts timestamp, event_id long",
    )
    rdf = spark.createDataFrame(
        [(u, _ts(s), 1000 + i) for i, (u, s, _) in enumerate(right)],
        "user_id long, rts timestamp, rid long",
    )
    got = {(r.event_id, r.rid)
           for r in R.range_join(ldf, rdf, "user_id", "ts", "rts",
                                 window).collect()}
    expect = set()
    for i, (u, s, _) in enumerate(left):
        for j, (ru, rs, _) in enumerate(right):
            if ru == u and s - window <= rs < s:
                expect.add((i, 1000 + j))
    assert got == expect


edges_strategy = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)),
    min_size=1, max_size=14,
)


@settings(max_examples=10, deadline=None)
@given(edges=edges_strategy)
def test_connected_components_matches_union_find(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.node: r.component
           for r in G.connected_components(df).collect()}

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    expect = {n: find(n) for n in parent}
    # normalize union-find roots to min-of-class
    roots: dict[int, int] = {}
    for n, r in expect.items():
        roots[find(r)] = min(roots.get(find(r), n), n)
    expect = {n: roots[find(n)] for n in parent}
    assert got == expect
    # the large-star/small-star escalation path must agree exactly
    star = {r.node: r.component
            for r in G.connected_components_star(df).collect()}
    assert star == expect


sess_events = st.lists(
    st.tuples(st.integers(0, 2),        # user
              st.integers(0, 500)),     # seconds offset (spans >3 buckets
    min_size=0, max_size=24)            #  at bucket_seconds=120)


@settings(max_examples=12, deadline=None)
@given(rows=sess_events, gap=st.integers(30, 120))
def test_sessionize_bucketed_fuzz_equals_plain(spark, rows, gap):
    """Bucketed sessionization == plain sessionization for arbitrary event
    sets and gap thresholds, with buckets as small as soundness allows
    (bucket = gap), forcing heavy boundary merging and multi-bucket
    chains — the regime the fixed-fixture test cannot sweep."""
    df = spark.createDataFrame(
        [(u, _ts(s)) for u, s in rows], "user_id long, ts timestamp")
    plain = {(r.user_id, r.ts, r.session_id)
             for r in R.sessionize(df, "user_id", "ts", gap).collect()}
    buck = {(r.user_id, r.ts, r.session_id)
            for r in R.sessionize_bucketed(
                df, "user_id", "ts", gap, bucket_seconds=gap).collect()}
    assert plain == buck


@settings(max_examples=10, deadline=None)
@given(rows=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 30)),
                     min_size=0, max_size=20),
       k=st.integers(1, 4))
def test_salted_topk_fuzz_equals_plain(spark, rows, k):
    """Salted top-k == plain top-k for arbitrary inputs including heavy
    duplicate order values (total order comes from the id tiebreak)."""
    df = spark.createDataFrame(
        [(u, i, float(v)) for i, (u, v) in enumerate(rows)],
        "k long, id long, v double")
    plain = {(r.k, r.id, r.rn) for r in R.top_k_per_group(
        df, ["k"], [F.desc("v"), F.asc("id")], k).collect()}
    salted = {(r.k, r.id, r.rn) for r in R.top_k_per_group_salted(
        df, ["k"], [F.desc("v"), F.asc("id")], k, n_salts=4).collect()}
    assert plain == salted
