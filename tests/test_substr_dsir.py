"""Exact-substring span dedup (`dedup.duplicate_spans` /
`strip_duplicate_spans`, the ExactSubstr shape of Lee et al. ACL 2022)
and DSIR importance resampling (`operators/dsir.py`, Xie et al. 2023) —
hand-checked spans on crafted corpora, island-merge edges, the removal
rebuild, ratio direction, Gumbel determinism, and top-k semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wde_spark.operators import dedup as D
from wde_spark.operators import dsir as DS
from wde_spark.operators import lm_score as LM

SCHEMA = "doc_id long, text string"


# ---------------------------------------------------------------------------
# duplicate_spans
# ---------------------------------------------------------------------------


def _spans(spark, corpus, k, min_count=2):
    df = D.duplicate_spans(
        spark.createDataFrame(corpus, SCHEMA), k=k, min_count=min_count)
    return {(r.doc_id, r.span_start, r.span_end, r.n_windows)
            for r in df.collect()}


def test_cross_doc_repeat_marks_both_docs(spark):
    """A 3-token run shared by two docs produces one span in each, at the
    right positions."""
    corpus = [(1, "x y z p q r"), (2, "a b x y z c")]
    got = _spans(spark, corpus, k=3)
    assert got == {(1, 1, 3, 1), (2, 3, 5, 1)}


def test_within_doc_repeat_counts(spark):
    """ExactSubstr counts within-document repeats: a doc repeating its own
    3-gram is flagged with no second document involved."""
    corpus = [(1, "x y z w x y z")]
    got = _spans(spark, corpus, k=3)
    # "x y z" at p=1 and p=5; gap 4 > k so the two occurrences stay
    # separate maximal spans (token 4 "w" is not duplicated material)
    assert got == {(1, 1, 3, 1), (1, 5, 7, 1)}


def test_overlapping_windows_merge_to_maximal_span(spark):
    """A repeated 4-token run with k=3 yields two overlapping duplicated
    windows that merge into ONE maximal span covering all 4 tokens."""
    corpus = [(1, "a b c d zz"), (2, "yy a b c d")]
    got = _spans(spark, corpus, k=3)
    assert got == {(1, 1, 4, 2), (2, 2, 5, 2)}


def test_gap_larger_than_k_splits_islands(spark):
    """Two duplicated runs separated by more than k fresh tokens stay two
    spans."""
    corpus = [
        (1, "a b c u1 u2 u3 u4 d e f"),
        (2, "a b c v1 v2 v3 v4 d e f"),
    ]
    got = _spans(spark, corpus, k=3)
    assert got == {(1, 1, 3, 1), (1, 8, 10, 1),
                   (2, 1, 3, 1), (2, 8, 10, 1)}


def test_min_count_threshold(spark):
    """min_count=3 ignores a window that appears only twice."""
    corpus = [(1, "a b c q"), (2, "a b c r"), (3, "z z2 z3")]
    assert _spans(spark, corpus, k=3, min_count=3) == set()
    corpus.append((4, "a b c s"))
    assert _spans(spark, corpus, k=3, min_count=3) == {
        (1, 1, 3, 1), (2, 1, 3, 1), (4, 1, 3, 1)}


def test_short_docs_emit_nothing(spark):
    corpus = [(1, "a b"), (2, "a b")]  # shorter than k
    assert _spans(spark, corpus, k=3) == set()


def test_guarantee_any_repeat_of_2k_minus_1_found(spark):
    """The windowed-hash guarantee: a repeated run of length 2k-1 tokens
    contains a full aligned k-window however it straddles, so it is
    always found (here: 5-token run, k=3)."""
    corpus = [(1, "m n o p q t1 t2"), (2, "s1 s2 m n o p q")]
    got = _spans(spark, corpus, k=3)
    assert (1, 1, 5, 3) in got and (2, 3, 7, 3) in got


# ---------------------------------------------------------------------------
# strip_duplicate_spans
# ---------------------------------------------------------------------------


def _strip(spark, corpus, k):
    df = D.strip_duplicate_spans(spark.createDataFrame(corpus, SCHEMA), k=k)
    return {r.doc_id: (r.n_tokens, r.n_kept, r.text_clean)
            for r in df.collect()}


def test_strip_removes_exactly_the_spans(spark):
    corpus = [(1, "a b c d zz"), (2, "yy a b c d")]
    got = _strip(spark, corpus, k=3)
    assert got[1] == (5, 1, "zz")
    assert got[2] == (5, 1, "yy")


def test_strip_untouched_doc_roundtrips(spark):
    corpus = [(1, "left alone entirely"), (2, "a b c d"), (3, "a b c e")]
    got = _strip(spark, corpus, k=3)
    assert got[1] == (3, 3, "left alone entirely")
    assert got[2] == (4, 1, "d")
    assert got[3] == (4, 1, "e")


def test_strip_fully_covered_doc_goes_empty(spark):
    corpus = [(1, "a b c"), (2, "a b c")]
    got = _strip(spark, corpus, k=3)
    assert got[1] == (3, 0, "")
    assert got[2] == (3, 0, "")


# ---------------------------------------------------------------------------
# DSIR
# ---------------------------------------------------------------------------

TARGET = [(100, "spark query plan spark query plan spark query plan")]
RAW = [
    (1, "spark query plan spark query optimizer"),
    (2, "banana banana smoothie recipe banana"),
    (3, "spark query plan"),
]


@pytest.fixture(scope="module")
def ratios(spark):
    docs = spark.createDataFrame(RAW, SCHEMA)
    target_lm = LM.train_bigram_lm(spark.createDataFrame(TARGET, SCHEMA))
    raw_lm = LM.train_bigram_lm(
        spark.createDataFrame(TARGET + RAW, SCHEMA))
    return DS.dsir_logratio(docs, target_lm, raw_lm).cache()


def test_ratio_prefers_target_like_docs(ratios):
    r = {x.doc_id: x.log_ratio for x in ratios.collect()}
    # doc 1/3 are made of target bigrams; doc 2 shares none
    assert r[1] > r[2] and r[3] > r[2]


def test_short_doc_gets_null_ratio(spark):
    docs = spark.createDataFrame([(9, "single")], SCHEMA)
    lm = LM.train_bigram_lm(spark.createDataFrame(TARGET, SCHEMA))
    row = DS.dsir_logratio(docs, lm, lm).collect()[0]
    assert row.n_bigrams == 0 and row.log_ratio is None
    # identical models => every scored doc has ratio exactly 0
    docs2 = spark.createDataFrame(RAW, SCHEMA)
    assert all(r.log_ratio == 0.0
               for r in DS.dsir_logratio(docs2, lm, lm).collect())


def test_gumbel_noise_deterministic_and_spread(spark):
    df = spark.range(200).select(
        DS.gumbel_noise(F.col("id")).alias("g1"),
        DS.gumbel_noise(F.col("id")).alias("g2"),
        DS.gumbel_noise(F.col("id"), salt="other").alias("g3"),
    )
    rows = df.collect()
    assert all(r.g1 == r.g2 for r in rows)          # replayable
    assert sum(1 for r in rows if r.g1 != r.g3) > 150  # salt changes draws
    med = sorted(r.g1 for r in rows)[100]
    assert 0.0 < med < 0.9  # Gumbel(0,1) median is ~0.3665


def test_sample_k_and_determinism(spark, ratios):
    s1 = DS.dsir_sample(ratios, k=2)
    s2 = DS.dsir_sample(ratios, k=2)
    ids1 = sorted(r.doc_id for r in s1.collect())
    assert ids1 == sorted(r.doc_id for r in s2.collect())
    assert len(ids1) == 2
    assert "sel_key" in s1.columns and "log_ratio" in s1.columns


def test_temperature_zero_is_hard_topk(spark, ratios):
    ids = {r.doc_id for r in DS.dsir_sample(ratios, k=2,
                                            temperature=0.0).collect()}
    by_ratio = sorted(ratios.collect(), key=lambda r: (-r.log_ratio, r.doc_id))
    assert ids == {by_ratio[0].doc_id, by_ratio[1].doc_id}


# ---------------------------------------------------------------------------
# incremental substring dedup
# ---------------------------------------------------------------------------


def test_substr_increment_equals_full_rerun_on_batch(spark):
    """The contract: spans of the batch from (state of corpus) must equal
    duplicate_spans(corpus ∪ batch) restricted to batch docs — including
    a batch window whose ONLY other occurrence is in the prior corpus,
    and an intra-batch duplicate the state has never seen."""
    corpus = [(1, "a b c d e f"), (2, "p q r s t u")]
    batch = [(10, "a b c x1 x2 x3"),      # dup only via corpus doc 1
             (11, "m m2 m3 w"), (12, "m m2 m3 v")]  # intra-batch dup
    cdf = spark.createDataFrame(corpus, SCHEMA)
    bdf = spark.createDataFrame(batch, SCHEMA)
    state = D.substr_state(cdf, k=3)
    spans, state2 = D.substr_increment(state, bdf, k=3)
    got = {(r.doc_id, r.span_start, r.span_end, r.n_windows)
           for r in spans.collect()}
    full = {(r.doc_id, r.span_start, r.span_end, r.n_windows)
            for r in D.duplicate_spans(cdf.unionByName(bdf), k=3).collect()
            if r.doc_id >= 10}
    assert got == full
    assert got == {(10, 1, 3, 1), (11, 1, 3, 1), (12, 1, 3, 1)}
    # merged state counts = counts over corpus ∪ batch
    want = {r.wh: r.c for r in
            D.substr_state(cdf.unionByName(bdf), k=3).collect()}
    assert {r.wh: r.c for r in state2.collect()} == want


def test_substr_increment_chained_batches(spark):
    """Chaining increments: the second batch dedups against corpus ∪
    batch1 via the MERGED state, never re-reading their text."""
    cdf = spark.createDataFrame([(1, "a b c d")], SCHEMA)
    b1 = spark.createDataFrame([(10, "q r s t")], SCHEMA)
    b2 = spark.createDataFrame([(20, "q r s z")], SCHEMA)  # dups b1 via state
    state = D.substr_state(cdf, k=3)
    _, state1 = D.substr_increment(state, b1, k=3)
    spans2, _ = D.substr_increment(state1, b2, k=3)
    got = {(r.doc_id, r.span_start, r.span_end) for r in spans2.collect()}
    assert got == {(20, 1, 3)}


def test_substr_increment_empty_batch_and_state(spark):
    empty = spark.createDataFrame([], SCHEMA)
    cdf = spark.createDataFrame([(1, "a b c d")], SCHEMA)
    # empty batch: no spans, state unchanged
    spans, state2 = D.substr_increment(D.substr_state(cdf, k=3), empty, k=3)
    assert spans.count() == 0
    assert state2.count() == D.substr_state(cdf, k=3).count()
    # empty state (cold start): increment ≡ plain duplicate_spans on batch
    b = spark.createDataFrame([(1, "a b c x"), (2, "a b c y")], SCHEMA)
    spans, _ = D.substr_increment(D.substr_state(empty, k=3), b, k=3)
    assert {(r.doc_id, r.span_start, r.span_end) for r in spans.collect()} \
        == {(1, 1, 3), (2, 1, 3)}


# ---------------------------------------------------------------------------
# streaming substring-state maintainer
# ---------------------------------------------------------------------------


def test_streaming_substr_matches_sequential_increments(spark, tmp_path):
    """Streamed batches must produce byte-equal ledgers to calling
    substr_increment sequentially, the final state must equal
    substr_state over everything, and replay must rewrite identical
    versions (exactly-once effect)."""
    import os

    from wde_spark.streaming import substr_admission as SA

    corpus = [(1, "a b c d e"), (2, "p q r s t")]
    b1 = [(10, "a b c x y"), (11, "n1 n2 n3 n4")]
    b2 = [(20, "n1 n2 n3 z"), (21, "p q r w w2")]
    cdf = spark.createDataFrame(corpus, SCHEMA)

    src = tmp_path / "docs"
    for i, rows in enumerate((b1, b2)):
        spark.createDataFrame(rows, SCHEMA).coalesce(1) \
            .write.mode("overwrite").parquet(str(src / f"f{i}.parquet"))
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*.parquet"))
    )
    target, ckpt = str(tmp_path / "sub"), str(tmp_path / "ckpt")
    SA.streaming_substr_maintain(stream, cdf, target, ckpt, k=3)

    got = {(r.batch_id, r.doc_id, r.span_start, r.span_end)
           for r in SA.read_spans(spark, target).collect()}
    # sequential reference
    state = D.substr_state(cdf, k=3)
    want = set()
    for bid, rows in enumerate((b1, b2)):
        spans, state = D.substr_increment(
            state, spark.createDataFrame(rows, SCHEMA), k=3)
        want |= {(bid, r.doc_id, r.span_start, r.span_end)
                 for r in spans.collect()}
    assert got == want
    # the cross-batch dup (n1 n2 n3) was caught via state, not text
    assert any(d == 20 for _, d, _, _ in got)
    # final state == one-shot state over all docs
    final = {r.wh: r.c for r in SA.read_state(spark, target, 2).collect()}
    all_docs = spark.createDataFrame(corpus + b1 + b2, SCHEMA)
    assert final == {r.wh: r.c
                     for r in D.substr_state(all_docs, k=3).collect()}
    # replay: same versions, same ledger
    versions = sorted(os.listdir(target))
    SA.streaming_substr_maintain(stream, cdf, target, ckpt, k=3)
    assert sorted(os.listdir(target)) == versions
    assert {(r.batch_id, r.doc_id, r.span_start, r.span_end)
            for r in SA.read_spans(spark, target).collect()} == got


# ---------------------------------------------------------------------------
# DSIR-gated streaming admission
# ---------------------------------------------------------------------------


def test_dsir_gated_admission_quarantine_and_replay(spark, tmp_path):
    """Target-like batch docs are admitted, off-distribution docs land in
    the quarantine ledger with their ratios, and replaying the stream
    rewrites identical versions."""
    import os

    from wde_spark.operators import dedup as D2
    from wde_spark.streaming import dsir_admission as DA

    target = [(100, "alpha beta gamma alpha beta gamma alpha beta")]
    init = target + [(1, "noise one two three four"),
                     (2, "other filler words here now")]
    # doc 11's bigrams are raw-corpus material (seen by the raw model,
    # unseen by target) => negative ratio. A doc unseen by BOTH models
    # scores exactly 0 under the shared vocabulary (the floors cancel) —
    # "no evidence either way", which a 0.0 cutoff would admit.
    batch = [(10, "alpha beta gamma alpha beta delta"),   # target-like
             (11, "noise one two three four")]
    cdf = D2.dedup_corpus(spark.createDataFrame(init, SCHEMA),
                          max_bucket=None)
    tdf = spark.createDataFrame(target, SCHEMA)

    src = tmp_path / "docs"
    spark.createDataFrame(batch, SCHEMA).coalesce(1) \
        .write.mode("overwrite").parquet(str(src / "f0.parquet"))
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*.parquet"))
    )
    corpus_dir = str(tmp_path / "corpus")
    qdir = str(tmp_path / "quarantine")
    DA.streaming_dsir_dedup_admission(
        stream, cdf, tdf, corpus_dir, str(tmp_path / "ckpt"), qdir,
        cutoff=0.0, max_bucket=None)

    from wde_spark.streaming.dedup_admission import read_corpus

    kept = {r.doc_id for r in read_corpus(spark, corpus_dir).collect()}
    quar = {r.doc_id: r.log_ratio
            for r in DA.read_quarantine(spark, qdir).collect()}
    assert 10 in kept and 11 not in kept
    assert set(quar) == {11} and quar[11] < 0
    # replay: same versions, same quarantine
    versions = sorted(os.listdir(corpus_dir))
    DA.streaming_dsir_dedup_admission(
        stream, cdf, tdf, corpus_dir, str(tmp_path / "ckpt"), qdir,
        cutoff=0.0, max_bucket=None)
    assert sorted(os.listdir(corpus_dir)) == versions
    assert {r.doc_id for r in DA.read_quarantine(spark, qdir).collect()} \
        == {11}
