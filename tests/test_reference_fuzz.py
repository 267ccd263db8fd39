"""Property-based differentials: on randomized inputs, the engine's
classifier primitives must agree with the reference implementation exactly
(the 200-row golden set can't cover every regex corner; hypothesis can get
much closer)."""

from __future__ import annotations

import contextlib
import io
import os
import sys

import pytest

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "script")),
    reason="reference tree not available")

# French-catalogue-shaped text: capitalized runs, abbreviations with dots,
# hyphens/commas/parens, digits (years), accented letters.
ALPHabet = (
    "ABCDEFGHIJLMNPRSTVÀÉÈ"
    "abcdefghijlmnoprstuvéèêàçœ"
    " .,-()'0123456789"
)
name_text = st.text(alphabet=ALPHabet, min_size=0, max_size=60)


def _dict_tokens() -> list[str]:
    """Seed tokens that steer generation into every classification branch:
    lookup-table keys (geography, events, titles, occupations, abbrevs)
    plus structural markers."""
    from wde_spark.data import load

    toks = ["le même", "DIVERS", "Chartes", "charte", "N. 1727", "M. 1806",
            "Dumas", "père", "fils", "(", ")", "révolution", "guerre",
            "1848", "église"]
    for t in ("provinces", "colonies"):
        toks.extend(load(t)[:8])
    toks.extend(list(load("dpts"))[:8])
    for t in ("countries", "events", "status", "functions", "names",
              "comp_names", "other"):
        toks.extend(list(load(t))[:8])
    return toks


seeded_text = st.lists(
    st.one_of(st.sampled_from(_dict_tokens()),
              st.text(alphabet=ALPHabet, min_size=1, max_size=10)),
    min_size=0, max_size=8,
).map(" ".join)


@pytest.fixture(scope="module")
def ref_mods():
    from conftest import stub_reference_deps

    stub_reference_deps()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import script.utils.itemtoid_prep as ref_prep
    import script.utils.rgx as ref_rgx

    return ref_rgx, ref_prep


@settings(max_examples=400, deadline=None)
@given(s=name_text)
def test_namebuild_fuzz(ref_mods, s):
    ref_rgx, _ = ref_mods
    from wde_spark.functions.names import namebuild

    assert namebuild(s) == tuple(ref_rgx.namebuild(s))


@settings(max_examples=500, deadline=None)
@given(name=st.one_of(name_text, seeded_text),
       trait=st.one_of(name_text, seeded_text))
def test_prep_query_fuzz(ref_mods, name, trait):
    _, ref_prep = ref_mods
    from wde_spark.functions.classify import QDICT_FIELDS, prep_query

    empty = {k: "" for k in QDICT_FIELDS[:-1]} | {"rebuilt": False}
    try:
        with contextlib.redirect_stdout(io.StringIO()):
            ref_q, _ = ref_prep.prep_query([name, trait], dict(empty))
    except Exception:
        # the reference crashes on some degenerate inputs (known latent
        # bugs, SURVEY.md §4); no parity to check there
        return
    mine = prep_query(name, trait)
    if mine is None:  # "le même" — reference returns prev (empty here)
        assert ref_q == empty
    else:
        got = dict(zip(QDICT_FIELDS, mine.as_tuple()))
        assert got == dict(ref_q)


@settings(max_examples=300, deadline=None)
@given(s=name_text)
def test_clean_query_string_fuzz(ref_mods, s):
    """F5 vs the reference's inline cleaning (itemtoid.py:128-132)."""
    import re

    from wde_spark.functions.classify import clean_query_string

    toks = s.lower().split()
    q = re.sub(r"\s+", " ", " ".join(sorted(set(toks), key=toks.index)))
    q = re.sub(r"(!|\.|\?|;|/|\\|:|&|\(|\)|\[|\]|#|\"|,|^'|_)", " ", q)
    q = re.sub(r"\s+", " ", q).strip()
    assert clean_query_string(s) == q
