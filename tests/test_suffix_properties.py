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


def _py_strip(rows: dict, spans: list) -> dict:
    """Pure-Python reference for strip_duplicate_spans: loser pick by the
    keeper order, interval merge (overlap + touch), splice."""

    def prio(d):
        ts = rows[d][1]
        return (1 if ts is None else 0, ts if ts is not None else 0, d)

    cuts: dict[int, list] = {}
    for src, dst, ps, pd_, rl in spans:
        loser, pos = (dst, pd_) if prio(src) < prio(dst) else (src, ps)
        cuts.setdefault(loser, []).append((pos, pos + rl))
    out = {}
    for d, (text, _) in rows.items():
        merged: list[tuple[int, int]] = []
        for s, e in sorted(cuts.get(d, [])):
            if merged and s <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((s, e))
        kept, prev = [], 0
        for s, e in merged:
            kept.append(text[prev:s])
            prev = e
        kept.append(text[prev:])
        out[d] = (
            "".join(kept),
            len(merged),
            sum(e - s for s, e in merged),
        )
    return out


def _strip_corpus(seed: int):
    """Randomized corpus with planted shared blocks: multiple winners per
    loser, overlapping/touching cuts, null and tied warc_ts."""
    import random

    rng = random.Random(seed)
    blocks = [
        "".join(chr(ord("a") + rng.randrange(26)) for _ in range(rng.randrange(70, 101)))
        for _ in range(6)
    ]
    rows = {}
    for d in range(1, 21):
        parts = []
        for _ in range(rng.randrange(1, 4)):
            if rng.random() < 0.6:
                parts.append(blocks[rng.randrange(len(blocks))])
            else:
                parts.append(
                    "".join(
                        chr(ord("A") + rng.randrange(26))
                        for _ in range(rng.randrange(5, 40))
                    )
                )
        ts = None if d % 7 == 0 else d % 3  # nulls + ties (doc_id breaks)
        rows[d] = ("".join(parts), ts)
    return rows


def test_strip_duplicate_spans_matches_python_reference(spark):
    """Operator output == pure-Python reference (loser pick + interval
    merge + splice) applied to the SAME span set, on a randomized corpus
    with stacked/overlapping cuts and null/tied timestamps."""
    from simages_spark.operators.suffix import (
        strip_duplicate_spans,
        substring_dup_spans,
    )

    for seed in (3, 17):
        rows = _strip_corpus(seed)
        docs = spark.createDataFrame(
            [(d, t, ts) for d, (t, ts) in rows.items()],
            "doc_id long, text string, warc_ts long",
        )
        spans_df = substring_dup_spans(docs, min_len=64)
        spans = [
            (r["src"], r["dst"], r["pos_src"], r["pos_dst"], r["run_len"])
            for r in spans_df.collect()
        ]
        assert spans, f"seed {seed} planted no shared runs"
        expect = _py_strip(rows, spans)
        got = {
            r["doc_id"]: (r["text"], r["n_spans_removed"], r["n_chars_removed"])
            for r in strip_duplicate_spans(docs, min_len=64).collect()
        }
        assert got == expect


def test_strip_earliest_keeps_and_partition_invariance(spark):
    """The globally earliest holder of a run keeps it (at least one
    occurrence of every duplicated block survives), and the output is
    invariant under repartitioning."""
    from simages_spark.operators.suffix import strip_duplicate_spans

    import random

    rng = random.Random(23)
    boiler = "".join(chr(ord("a") + rng.randrange(26)) for _ in range(90))
    docs = spark.createDataFrame(
        [
            (1, "keep " + boiler + " one", 5),   # earliest holder
            (2, boiler, 7),                        # fully consumed
            (3, "pre" + boiler + "post", None),   # null ts ranks last
        ],
        "doc_id long, text string, warc_ts long",
    )
    out = {
        r["doc_id"]: r["text"]
        for r in strip_duplicate_spans(docs, min_len=64).collect()
    }
    assert boiler in out[1]  # earliest keeps
    assert out[2] == ""  # entire text was the duplicated run
    assert boiler not in out[3]
    assert sum(boiler in t for t in out.values()) == 1

    out7 = {
        r["doc_id"]: r["text"]
        for r in strip_duplicate_spans(docs.repartition(7), min_len=64).collect()
    }
    assert out7 == out


def test_strip_touching_cuts_merge_once(spark):
    """Two spans from different winners that touch inside the loser merge
    to ONE removed interval (no double count, no seam chars lost)."""
    from simages_spark.operators.suffix import strip_duplicate_spans

    import random

    rng = random.Random(31)
    a = "".join(chr(ord("a") + rng.randrange(26)) for _ in range(70))
    b = "".join(chr(ord("A") + rng.randrange(26)) for _ in range(70))
    docs = spark.createDataFrame(
        [
            (1, a, 0),           # winner of run a
            (2, b, 0),           # winner of run b
            (3, "L" + a + b + "R", 9),  # loser: cuts [1,71) and [71,141) touch
        ],
        "doc_id long, text string, warc_ts long",
    )
    out = {
        r["doc_id"]: (r["text"], r["n_spans_removed"], r["n_chars_removed"])
        for r in strip_duplicate_spans(docs, min_len=64).collect()
    }
    assert out[3] == ("LR", 1, 140)
    assert out[1] == (a, 0, 0) and out[2] == (b, 0, 0)
