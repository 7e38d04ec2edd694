"""Property-based tests (hypothesis) for the suffix-pass math — pure
numpy, no Spark session. The reference has no property tests (SURVEY §5);
these pin the two invariants the distributed pass' exactness rests on:

1. content-only hashing: the anchored-window hash is a function of the
   substring's codepoints alone, independent of position or surrounding
   text — the property that makes cross-doc window equality ⟺ substring
   equality (up to 128-bit collisions).
2. winnowing detection guarantee: any two texts sharing a run of
   ≥ min_len chars emit at least one identical (hash, aligned) window —
   no false negatives by construction, for ANY content and alignment.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from simages_spark.operators.suffix import (
    _B1,
    _anchors_and_hashes,
    _codepoints,
    _substring_hashes,
    winnow_params,
)

texts = st.text(
    alphabet=st.characters(min_codepoint=97, max_codepoint=122), min_size=0
)


@settings(max_examples=200, deadline=None)
@given(
    prefix_a=texts, prefix_b=texts, shared=st.text(
        alphabet=st.characters(min_codepoint=97, max_codepoint=122),
        min_size=8, max_size=40,
    ),
)
def test_substring_hash_is_content_only(prefix_a, prefix_b, shared):
    """hash(arr_a[pa:pa+w]) == hash(arr_b[pb:pb+w]) whenever the
    substrings are equal, at ANY positions pa != pb."""
    a = _codepoints(prefix_a + shared + "x")
    b = _codepoints(prefix_b + shared + "y")
    w = len(shared)
    pa, pb = len(prefix_a), len(prefix_b)
    ha = _substring_hashes(a, np.array([pa]), w, _B1)[0]
    hb = _substring_hashes(b, np.array([pb]), w, _B1)[0]
    assert ha == hb
    # and differing substrings differ (w.h.p.; deterministic examples)
    if len(prefix_a) >= w and prefix_a[:w] != shared:
        h_other = _substring_hashes(a, np.array([0]), w, _B1)[0]
        assert h_other != ha


@settings(max_examples=100, deadline=None)
@given(
    data=st.data(),
    shared_len=st.integers(min_value=64, max_value=120),
)
def test_winnowing_detection_guarantee(data, shared_len):
    """Two docs sharing a ≥min_len-char run ALWAYS emit a common
    (h1, h2) window hash — the no-false-negatives guarantee the
    candidate join depends on."""
    min_len = 64
    rng = np.random.default_rng(data.draw(st.integers(0, 2**32 - 1)))

    def rand_text(n):
        return "".join(chr(97 + c) for c in rng.integers(0, 26, n))

    shared = rand_text(shared_len)
    doc_a = rand_text(data.draw(st.integers(0, 80))) + shared + rand_text(
        data.draw(st.integers(0, 80))
    )
    doc_b = rand_text(data.draw(st.integers(0, 80))) + shared + rand_text(
        data.draw(st.integers(0, 80))
    )
    _, h1a, h2a = _anchors_and_hashes(doc_a, min_len)
    _, h1b, h2b = _anchors_and_hashes(doc_b, min_len)
    common = set(zip(h1a.tolist(), h2a.tolist())) & set(
        zip(h1b.tolist(), h2b.tolist())
    )
    assert common, (
        f"shared {shared_len}-char run produced no common window "
        f"(len_a={len(doc_a)}, len_b={len(doc_b)})"
    )


def test_winnow_params_guarantee_identity():
    """win + w - 1 == min_len for every min_len the CLI accepts."""
    for min_len in range(17, 512):
        w, win = winnow_params(min_len)
        assert win + w - 1 == min_len
        assert w >= 2 and win >= 16


def test_substring_spans_planted_positions(spark):
    """substring_dup_spans returns the exact aligned maximal-run spans of
    a planted 100-char boilerplate block (0-based codepoint offsets)."""
    from simages_spark.operators.suffix import substring_dup_spans

    import random

    rng = random.Random(7)
    boiler = "".join(chr(ord("A") + rng.randrange(26)) for _ in range(100))
    doc_a = "x" * 17 + boiler + "y" * 30
    doc_b = "z" * 55 + boiler + "q" * 10
    doc_c = "completely unrelated filler far below the window length"
    docs = spark.createDataFrame(
        [(1, doc_a), (2, doc_b), (3, doc_c)], "doc_id long, text string"
    )
    got = substring_dup_spans(docs, min_len=64).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["src"], r["dst"]) == (1, 2)
    assert (r["pos_src"], r["pos_dst"], r["run_len"]) == (17, 55, 100)


def test_substring_spans_two_diagonals(spark):
    """A block repeated at two positions in dst yields one span per
    alignment (diagonal), both maximal."""
    from simages_spark.operators.suffix import substring_dup_spans

    import random

    rng = random.Random(11)
    boiler = "".join(chr(ord("a") + rng.randrange(26)) for _ in range(80))
    doc_a = "x" * 10 + boiler + "y" * 10
    doc_b = boiler + "-" * 5 + boiler
    docs = spark.createDataFrame(
        [(1, doc_a), (2, doc_b)], "doc_id long, text string"
    )
    got = {
        (r["pos_src"], r["pos_dst"], r["run_len"])
        for r in substring_dup_spans(docs, min_len=64).collect()
    }
    assert got == {(10, 0, 80), (10, 85, 80)}
