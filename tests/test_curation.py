"""Training-data curation operators — hand-computed expectations."""

from __future__ import annotations

from pyspark.sql import functions as F

from wde_spark.operators import curation as CU


def test_repetition_stats_values(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b a b"),           # 2-grams: ab ba ab ba ab -> 3 dup of 5
         (2, "one two three four"),    # all distinct
         (3, "x\nx\ny")],              # 3 lines, 1 dup
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in CU.repetition_stats(docs).collect()}
    assert out[1].dup_2gram_frac == round(3 / 5, 4)
    assert not out[1].passes_repetition
    assert out[2].dup_2gram_frac == 0.0 and out[2].passes_repetition
    assert out[3].dup_line_frac == round(1 / 3, 4)
    assert not out[3].passes_repetition


def test_pii_redact_counts_and_text(spark):
    docs = spark.createDataFrame(
        [(1, "mail me at jo.doe@example.org or call +1 (555) 123-4567 now"),
         (2, "server at 10.0.255.1 leaked 123456789012"),
         (3, "nothing sensitive here")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in CU.pii_redact(docs).collect()}
    assert out[1].n_email == 1 and out[1].n_phone == 1
    assert "[EMAIL]" in out[1].redacted and "[PHONE]" in out[1].redacted
    assert "jo.doe" not in out[1].redacted
    assert out[2].n_ipv4 == 1 and out[2].n_digit_run == 1
    assert "[IPV4]" in out[2].redacted
    assert out[3].redacted == "nothing sensitive here"
    assert out[3].n_email == out[3].n_phone == out[3].n_ipv4 == 0


def test_decontaminate_flags_overlap(spark):
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps high"),
         (2, "a totally different document body"),
         (3, "quick brown fox runs away fast")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox appears in benchmarks")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in CU.decontaminate(docs, bench).collect()}
    # doc 1 shares 3-gram shingles "the quick brown" and "quick brown fox"
    assert out[1].contaminated and out[1].n_shared_shingles == 2
    assert not out[2].contaminated and out[2].n_shared_shingles == 0
    assert out[3].contaminated and out[3].n_shared_shingles == 1


def test_chunk_documents_overlap_geometry(spark):
    text = " ".join(f"t{i}" for i in range(10))
    docs = spark.createDataFrame([(1, text), (2, "")],
                                 "doc_id long, text string")
    out = CU.chunk_documents(docs, max_tokens=4, overlap=1).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    c1 = sorted(by_doc[1], key=lambda r: r.chunk_idx)
    # stride 3 over 10 tokens: raw starts 0,3,6,9 — but start 9 would hold
    # only the carried-over token t9 (9 + overlap >= 10), so it is dropped:
    # a trailing chunk with zero new tokens is pure duplication
    assert [r.n_tokens for r in c1] == [4, 4, 4]
    assert c1[0].chunk_text == "t0 t1 t2 t3"
    assert c1[1].chunk_text == "t3 t4 t5 t6"  # 1-token overlap
    assert c1[2].chunk_text == "t6 t7 t8 t9"
    # full coverage: every token appears in some chunk
    covered = set()
    for r in c1:
        covered.update(r.chunk_text.split())
    assert covered == {f"t{i}" for i in range(10)}
    # empty doc -> single chunk of the empty-string token
    assert len(by_doc[2]) == 1


def test_winnowing_shared_run_guarantee(spark):
    """Winnowing's core property: two documents sharing a character run of
    length >= w + k - 1 (= 23 at defaults) share at least one fingerprint;
    unrelated texts share none."""
    from wde_spark.operators.textstats import winnowing_fingerprints

    shared = "identical shared passage of text here"  # 37 chars
    docs = spark.createDataFrame(
        [(1, "prefix one then " + shared + " tail alpha"),
         (2, "other beginning " + shared + " different end"),
         (3, "completely unrelated content with nothing in common at all")],
        "doc_id long, text string",
    )
    fps = {}
    for r in winnowing_fingerprints(docs).collect():
        fps.setdefault(r.doc_id, set()).add(r.fp)
    assert fps[1] & fps[2], "shared 37-char run must share a fingerprint"
    assert not (fps[1] & fps[3]) and not (fps[2] & fps[3])


def test_winnowing_short_and_empty_docs(spark):
    from wde_spark.operators.textstats import winnowing_fingerprints

    docs = spark.createDataFrame(
        [(1, "tiny"), (2, "")], "doc_id long, text string")
    out = {}
    for r in winnowing_fingerprints(docs).collect():
        out.setdefault(r.doc_id, []).append(r.fp)
    # shorter than one gram -> exactly one fingerprint (hash of what exists)
    assert len(out[1]) == 1 and len(out[2]) == 1


def test_chunk_documents_properties_fuzz(spark):
    """Chunking invariants over a sweep of (n_tokens, max_tokens, overlap):
    full coverage (every token in some chunk), bounded size, correct
    consecutive overlap, and no chunk made entirely of carried-over
    tokens."""
    cases = [(n, m, o) for n in (1, 3, 7, 8, 9, 16, 17, 63, 64, 65, 120)
             for m, o in ((8, 0), (8, 3), (8, 7), (64, 8))]
    rows = [(i, " ".join(f"w{j}" for j in range(n)))
            for i, (n, _, _) in enumerate(cases)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for i, (n, m, o) in enumerate(cases):
        out = sorted(
            CU.chunk_documents(docs.filter(F.col("doc_id") == i),
                               max_tokens=m, overlap=o).collect(),
            key=lambda r: r.chunk_idx)
        toks = [f"w{j}" for j in range(n)]
        covered = []
        prev_tokens = None
        for r in out:
            ck = r.chunk_text.split()
            assert len(ck) <= m, (n, m, o)
            covered.extend(ck)
            if prev_tokens is not None:
                shared = set(prev_tokens) & set(ck)
                assert len(shared) <= o or len(ck) <= o, (n, m, o)
                assert len(set(ck) - set(prev_tokens)) > 0, \
                    f"wholly-redundant chunk at {(n, m, o)}"
            prev_tokens = ck
        assert set(covered) == set(toks), (n, m, o)


def test_decontaminate_bloom_matches_exact(spark):
    """Bloom prefilter + exact verify must be BIT-IDENTICAL to exact
    decontamination (no false negatives by construction; false positives
    removed by the verify join)."""
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{(i * 7 + j) % 40}" for j in range(12)))
         for i in range(60)],
        "doc_id long, text string",
    )
    bench = docs.filter(F.col("doc_id") % 9 == 0)
    exact = {r.doc_id: r for r in CU.decontaminate(docs, bench).collect()}
    bloom = {r.doc_id: r
             for r in CU.decontaminate_bloom(docs, bench).collect()}
    assert set(exact) == set(bloom)
    for i in exact:
        assert bloom[i].n_shared_shingles == exact[i].n_shared_shingles, i
        assert bloom[i].contaminated == exact[i].contaminated, i
        # candidates can only over-approximate the exact hits
        assert bloom[i].n_bloom_candidates >= exact[i].n_shared_shingles
        assert bloom[i].n_bloom_fp == \
            bloom[i].n_bloom_candidates - bloom[i].n_shared_shingles


def test_decontaminate_bloom_tiny_filter_fps_still_exact(spark):
    """An adversarially small filter (64 bits, saturated) must produce
    false-positive CANDIDATES — proving the prefilter is probabilistic,
    not a disguised exact join — while the verified verdict stays exact."""
    docs = spark.createDataFrame(
        [(i, " ".join(f"u{(i * 13 + j) % 90}" for j in range(12)))
         for i in range(80)],
        "doc_id long, text string",
    )
    bench = docs.filter(F.col("doc_id") % 11 == 0)
    exact = {r.doc_id: r for r in CU.decontaminate(docs, bench).collect()}
    bloom = {r.doc_id: r
             for r in CU.decontaminate_bloom(docs, bench,
                                             m_bits=64).collect()}
    assert sum(r.n_bloom_fp for r in bloom.values()) > 0
    for i in exact:
        assert bloom[i].n_shared_shingles == exact[i].n_shared_shingles
        assert bloom[i].contaminated == exact[i].contaminated
