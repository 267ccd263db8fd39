"""Statistical contract of the affine minhash family
(`operators/dedup._MH_PERM` over 32-bit shingle digests): the fraction of
agreeing signature positions is an unbiased estimator of Jaccard
similarity.  This is THE property that makes LSH banding work — if the
family breaks it (bad constants, modulus bias, an overflow), banding
collision probabilities silently stop tracking similarity and near-dup
recall collapses with no error anywhere.

Checked against a pure-Python mirror of the family over synthetic shingle
sets with KNOWN Jaccard, plus a Spark-vs-mirror equality pin so the mirror
cannot drift from the shipped column expressions.
"""

from __future__ import annotations

import hashlib

import pytest

from wde_spark.operators.dedup import _MH_P, _MH_PERM


def _h32(sh: str) -> int:
    return int(hashlib.md5(sh.encode()).hexdigest()[:8], 16)


def _signature(shingles: set[str], k: int) -> list[int]:
    hs = [_h32(s) for s in shingles]
    return [min((a * h + b) % _MH_P for h in hs)
            for a, b in _MH_PERM[:k]]


def _jaccard(a: set, b: set) -> float:
    return len(a & b) / len(a | b)


def test_agreement_tracks_jaccard():
    """Across overlap levels 0.1..0.9, mean signature agreement over many
    independent set-pairs must sit within 0.1 of true Jaccard (16 hashes
    → se ≈ sqrt(j(1-j)/16)/sqrt(trials) ≈ 0.01 at 100 trials)."""
    for overlap in (2, 5, 8):
        total = 10
        agree_sum = 0.0
        jac_sum = 0.0
        trials = 100
        for t in range(trials):
            # two sets of `total` shingles sharing `overlap` of them
            shared = {f"s{t}_{i}" for i in range(overlap)}
            a = shared | {f"a{t}_{i}" for i in range(total - overlap)}
            b = shared | {f"b{t}_{i}" for i in range(total - overlap)}
            sa, sb = _signature(a, 16), _signature(b, 16)
            agree_sum += sum(x == y for x, y in zip(sa, sb)) / 16
            jac_sum += _jaccard(a, b)
        mean_agree = agree_sum / trials
        mean_jac = jac_sum / trials
        assert abs(mean_agree - mean_jac) < 0.1, \
            f"overlap {overlap}: agreement {mean_agree:.3f} vs jaccard {mean_jac:.3f}"


def test_identical_and_disjoint_extremes():
    a = {f"x{i}" for i in range(20)}
    assert _signature(a, 16) == _signature(set(a), 16)
    b = {f"y{i}" for i in range(20)}
    sa, sb = _signature(a, 16), _signature(b, 16)
    # 16 positions over disjoint 20-element sets: expected agreement
    # ~16 * 40/2^32 ≈ 0; any agreement means the family is degenerate
    assert sum(x == y for x, y in zip(sa, sb)) <= 1


def test_permutation_values_in_range():
    a = {f"x{i}" for i in range(50)}
    for v in _signature(a, 16):
        assert 0 <= v < _MH_P


@pytest.mark.usefixtures("spark")
def test_mirror_matches_spark(spark):
    """The pure-Python mirror must produce the exact signatures the shipped
    column expressions produce — otherwise the statistical evidence above
    is about the wrong family."""
    from wde_spark.operators.dedup import minhash_signatures

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "one two three four five six seven")],
        "doc_id long, text string")
    rows = {r["doc_id"]: [r[f"mh_{j}"] for j in range(16)]
            for r in minhash_signatures(docs, num_hashes=16,
                                        shingle_k=3).collect()}

    def sh3(text: str) -> set[str]:
        toks = text.split()
        return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}

    assert rows[1] == _signature(sh3("alpha beta gamma delta epsilon zeta"), 16)
    assert rows[2] == _signature(sh3("one two three four five six seven"), 16)
