"""Exact-BPE token counting: hand-verified encodings, trainer parity on
the classic worked example, determinism of the shipped demo vocabulary,
and the distributed count path vs an independent pure-Python reference."""

from __future__ import annotations

import re

from conftest import SF_SMOKE

from wde_spark.operators import bpe as B
from wde_spark.operators import textstats as T


def test_encode_word_hand_cases():
    """lowest-rank-first merging, hand-traced:
    merges [(l,o),(lo,w),(e,r)]:  lower -> lo w e r -> low e r -> low er."""
    ranks = {("l", "o"): 0, ("lo", "w"): 1, ("e", "r"): 2}
    assert B.encode_word("lower", ranks) == ["low", "er"]
    assert B.encode_word("low", ranks) == ["low"]
    assert B.encode_word("xyz", ranks) == ["x", "y", "z"]  # no merge applies
    assert B.encode_word("o", ranks) == ["o"]
    # rank order matters, not adjacency order: (e,r) outranks nothing here,
    # but (l,o) must fire before (lo,w) can exist
    assert B.encode_word("rolower", ranks) == ["r", "o", "low", "er"]


def test_trainer_hand_case():
    """{'abab': 3}: pair (a,b) freq 6 beats (b,a) freq 3 → merge 1 = (a,b);
    then ('ab','ab') freq 3 → merge 2 = (ab,ab)."""
    merges = B.train_bpe_merges({"abab": 3}, 10)
    assert merges[:2] == [("a", "b"), ("ab", "ab")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert B.encode_word("abab", ranks) == ["abab"]
    assert B.encode_word("aba", ranks) == ["ab", "a"]


def test_trainer_sennrich_example():
    """The ACL'16 paper's worked vocabulary (sans end-of-word marker):
    'es' (9) then 'est' (9) are the first merges; deterministic tie-break
    picks lexicographically-smallest on equal counts."""
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = B.train_bpe_merges(freqs, 4)
    assert merges[0] == ("e", "s")      # 6+3 = 9
    assert merges[1] == ("es", "t")     # 9
    ranks = {p: i for i, p in enumerate(merges)}
    assert "est" in B.encode_word("newest", ranks)


def test_demo_vocab_regenerates_identically():
    """The checked-in artifact is exactly what the frozen generator
    produces — drift in trainer, sample, or file format fails here."""
    import tools.gen_bpe_demo_vocab as G

    words = re.findall(B.PRETOKEN_RE, G.SAMPLE)
    freqs: dict[str, int] = {}
    for w in words:
        freqs[w] = freqs.get(w, 0) + 1
    expect = B.train_bpe_merges(freqs, G.NUM_MERGES)
    assert B.load_merges(B.DEMO_MERGES_PATH) == expect


def test_bpe_token_counts_match_reference(spark):
    """The distributed distinct-word path == a row-at-a-time pure-Python
    reference on mixed text (repeats, punctuation, digits, empty doc)."""
    rows = [
        (0, "the lazy dog jumps over the lazy dog"),
        (1, "catalyst optimizes the plan, then executes it 42 times!"),
        (2, ""),
        (3, "the the the"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    merges = B.load_merges(B.DEMO_MERGES_PATH)
    ranks = {p: i for i, p in enumerate(merges)}

    got = {r.doc_id: r.bpe_tokens
           for r in B.bpe_token_counts(docs, merges).collect()}
    expect = {
        i: sum(len(B.encode_word(w, ranks))
               for w in re.findall(B.PRETOKEN_RE, text))
        for i, text in rows
    }
    assert got == expect
    assert got[2] == 0  # empty doc present, counted as zero


def test_token_stats_exact_vs_approx(spark):
    """token_stats(merges=...) swaps in the exact count; the default stays
    the regex approximation; ws_tokens identical in both forms."""
    docs = spark.createDataFrame(
        [(0, "the quick brown fox"), (1, "streaming watermark state")],
        "doc_id long, text string")
    merges = B.load_merges(B.DEMO_MERGES_PATH)
    approx = {r.doc_id: r for r in T.token_stats(docs).collect()}
    exact = {r.doc_id: r for r in T.token_stats(docs, merges=merges).collect()}
    ranks = {p: i for i, p in enumerate(merges)}
    for i, text in [(0, "the quick brown fox"),
                    (1, "streaming watermark state")]:
        assert exact[i].ws_tokens == approx[i].ws_tokens
        assert exact[i].bpe_tokens == sum(
            len(B.encode_word(w, ranks))
            for w in re.findall(B.PRETOKEN_RE, text))
    # 'the' is a single learned token exactly, approximation agrees there;
    # rarer words split into multiple subwords → exact >= one per pretoken
    assert exact[1].bpe_tokens >= approx[1].bpe_tokens


def test_bpe_smoke_on_documents_table(spark):
    """The exact path runs over the real documents table shape."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    merges = B.load_merges(B.DEMO_MERGES_PATH)
    out = T.token_stats(docs, merges=merges)
    assert out.columns == ["doc_id", "ws_tokens", "bpe_tokens",
                           "chars_per_token"]
    row = out.orderBy("doc_id").first()
    assert row.bpe_tokens >= row.ws_tokens  # subwords never fewer than words


def test_token_stats_null_text_parity(spark):
    """NULL text must yield bpe_tokens=NULL in BOTH counting modes — a
    `bpe_tokens < n` curation filter has to drop/keep the same rows
    whichever mode is active (review finding, round 4)."""
    from wde_spark.operators.textstats import token_stats

    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "some text")], "doc_id long, text string")
    merges = B.load_merges(B.DEMO_MERGES_PATH)
    approx = {r.doc_id: r.bpe_tokens for r in token_stats(docs).collect()}
    exact = {r.doc_id: r.bpe_tokens
             for r in token_stats(docs, merges=merges).collect()}
    assert approx[1] is None and exact[1] is None
    assert exact[2] == 0


# ---------------------------------------------------------------------------
# distributed training
# ---------------------------------------------------------------------------


def test_learn_bpe_merges_matches_driver_trainer(spark):
    """The distributed trainer must produce the EXACT merge sequence of
    the reference driver-side `train_bpe_merges` over the same word
    frequencies (same counts, same greedy left-to-right merge, same
    count-then-lexicographic tie-break)."""
    corpus = [
        (1, "low lower lowest low low"),
        (2, "new newer newest new"),
        (3, "wide wider widest lower"),
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    wf = {}
    for _, t in corpus:
        for w in t.split():
            wf[w] = wf.get(w, 0) + 1
    want = B.train_bpe_merges(wf, 12)
    # local_vocab_max=0 forces the distributed per-iteration arm — the
    # size-adaptive switch would otherwise collect this tiny vocab and
    # make the differential assertion vacuous.
    got = B.learn_bpe_merges(docs, 12, local_vocab_max=0)
    assert got == want
    assert len(got) == 12 and got[0] == ("l", "o")  # 'lo' appears 7x
    # the small-vocab arm must agree with both.
    assert B.learn_bpe_merges(docs, 12) == want


def test_learn_bpe_merges_overlapping_runs(spark):
    """Greedy left-to-right on repeated characters: 'aaaa' merges to
    (a,a)->aa twice, then (aa,aa) — identical in both trainers."""
    docs = spark.createDataFrame([(1, "aaaa aaaa aab")],
                                 "doc_id long, text string")
    want = B.train_bpe_merges({"aaaa": 2, "aab": 1}, 4)
    got = B.learn_bpe_merges(docs, 4, local_vocab_max=0)
    assert got == want
    assert got[0] == ("a", "a")
    assert B.learn_bpe_merges(docs, 4) == want


def test_learn_bpe_merges_exhausts_pairs(spark):
    """Asking for more merges than exist stops early, like the driver
    trainer."""
    docs = spark.createDataFrame([(1, "ab ab")], "doc_id long, text string")
    got = B.learn_bpe_merges(docs, 10, local_vocab_max=0)
    assert got == B.train_bpe_merges({"ab": 2}, 10)
    assert got == [("a", "b")]
    assert B.learn_bpe_merges(docs, 10) == got
