"""FFD bin packing (`layout.ffd_pack`) properties: validity (no bin
overfull unless a single oversized doc owns it, every positive-weight doc
assigned exactly once), determinism across runs and partitionings, the
first-fit-decreasing invariant itself (a doc never fits an EARLIER bin
than the one it got), and quality (FFD uses no more bins than arrival-
order first-fit).
"""

from __future__ import annotations

import collections

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
SEQ = 128


def _weights(spark):
    from wde_spark.functions.strings import tokens

    return (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", F.size(tokens(F.col("text"))).alias("n_tok"))
    )


def _pack(spark, df, **kw):
    from wde_spark.operators import layout as L

    kw.setdefault("seq_len", SEQ)
    kw.setdefault("n_buckets", 8)
    return L.ffd_pack(df, **kw).collect()


def test_valid_packing(spark):
    t = _weights(spark)
    rows = _pack(spark, t)
    n_pos = t.filter("n_tok > 0").count()
    assert len(rows) == n_pos
    assert len({r["doc_id"] for r in rows}) == n_pos
    fills = collections.Counter()
    members = collections.Counter()
    for r in rows:
        fills[(r["bucket"], r["bin_id"])] += r["n_tok"]
        members[(r["bucket"], r["bin_id"])] += 1
    for key, fill in fills.items():
        # overfull only when a single oversized doc owns the bin
        assert fill <= SEQ or members[key] == 1, (key, fill, members[key])


def test_ffd_invariant_and_beats_arrival_order(spark):
    rows = sorted(_pack(spark, _weights(spark)),
                  key=lambda r: (r["bucket"], -r["n_tok"], r["doc_id"]))
    by_bucket = collections.defaultdict(list)
    for r in rows:
        by_bucket[r["bucket"]].append(r)
    ffd_bins = 0
    for docs in by_bucket.values():
        fills: dict[int, int] = {}
        for r in docs:
            b = r["bin_id"]
            prior = fills.get(b, 0)
            # first-fit: no EARLIER bin could have held this doc
            for eb in range(1, b):
                assert fills[eb] + r["n_tok"] > SEQ, (r, eb, fills[eb])
            fills[b] = prior + r["n_tok"]
        ffd_bins += len(fills)
        # decreasing order ⇒ bins fill monotonically: ids are contiguous
        assert sorted(fills) == list(range(1, len(fills) + 1))

    # arrival-order first-fit on the same buckets can only use >= bins
    ff_bins = 0
    for docs in by_bucket.values():
        fl: list[int] = []
        for r in sorted(docs, key=lambda r: r["doc_id"]):
            pos = next((i for i, f in enumerate(fl)
                        if f + r["n_tok"] <= SEQ), None)
            if pos is None:
                fl.append(r["n_tok"])
            else:
                fl[pos] += r["n_tok"]
        ff_bins += len(fl)
    assert ffd_bins <= ff_bins


def test_deterministic_across_partitionings(spark):
    t = _weights(spark)
    a = {(r["doc_id"]): (r["bucket"], r["bin_id"])
         for r in _pack(spark, t)}
    b = {(r["doc_id"]): (r["bucket"], r["bin_id"])
         for r in _pack(spark, t.repartition(13))}
    assert a == b


def test_oversized_doc_gets_own_bin(spark):
    df = spark.createDataFrame(
        [(1, 500), (2, 100), (3, 100), (4, 28)], "doc_id long, n_tok long")
    rows = _pack(spark, df, n_buckets=1)
    by_doc = {r["doc_id"]: r for r in rows}
    big_bin = by_doc[1]["bin_id"]
    sharing = [r for r in rows
               if r["bin_id"] == big_bin and r["doc_id"] != 1]
    assert not sharing  # nothing ever fits after an oversized item
    # and zero-weight docs are dropped
    df0 = spark.createDataFrame([(1, 0), (2, 5)], "doc_id long, n_tok long")
    assert [r["doc_id"] for r in _pack(spark, df0, n_buckets=1)] == [2]
