"""NULL / blank text robustness: a real crawl corpus carries NULL text
(fetch failures), empty strings, and whitespace-only documents. Operators
must neither crash nor let degenerate docs pollute near-dup results:
a NULL-text doc has no shingles, so it can never appear in a VERIFIED
near-dup pair (banding may group degenerate docs; verification is the
precision gate that keeps them out).
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def weird_docs(spark):
    return spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, "normal document text here"),
         (5, "normal document text here")],
        "doc_id long, text string")


def test_dedup_tiers_survive_and_exclude_null(weird_docs):
    from wde_spark.operators import dedup as D

    # exact: NULLs form their own class, blanks canonicalize together,
    # the two real duplicates collapse
    fps = {r.keep_id: r.dup_count for r in D.exact_dedup(weird_docs).collect()}
    assert fps[4] == 2

    pairs = {(r.id_a, r.id_b) for r in
             D.neardup_lsh_verified(weird_docs).collect()}
    assert (4, 5) in pairs
    assert not any(1 in p for p in pairs), \
        "NULL-text doc must never survive Jaccard verification"

    # signatures exist for every row (NULL signature for NULL text is fine;
    # it must not crash the aggregation)
    assert D.minhash_signatures(weird_docs).count() == 5
    assert D.simhash(weird_docs).count() == 5


def test_textstats_and_curation_survive(weird_docs):
    from wde_spark.operators import curation as CU
    from wde_spark.operators import textstats as TS

    for fn in (TS.quality_score, TS.lang_id, TS.token_stats,
               TS.winnowing_fingerprints, TS.tfidf_topk,
               CU.repetition_stats, CU.pii_redact, CU.chunk_documents):
        fn(weird_docs).count()  # must not raise

    # quality gate must fail degenerate docs, not error on them
    q = {r.doc_id: r.passes_quality for r in
         TS.quality_score(weird_docs).collect()}
    assert q[2] is not True and q[3] is not True
