"""Round-6 optimization guard: the batched anchor kernel and the grouped
extension must be exactly equivalent to the round-5 per-doc forms.

The optimization rewrote `anchored_windows` to one vectorized pass per
Arrow batch (`_anchors_batch` + `_sliding_leftmost_argmin`) and grouped
`_extend_matches` per (src, dst) with in-run anchor skipping. Both are
pure plan/kernel changes — these tests pin the bit-level contract:
`_anchors_and_hashes` (the original per-doc path, kept as the reference)
and the batched path must agree row for row.
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from simages_spark.operators.suffix import (
    _anchors_and_hashes,
    _anchors_batch,
    _kgram_hashes,
    _sliding_leftmost_argmin,
    substring_dup_pairs,
    substring_dup_spans,
)

ALPHABET = "ab xyé世\n\t0"


def _random_texts(n: int, min_len: int, seed: int) -> list[str]:
    rng = random.Random(seed)
    lengths = [0, 1, min_len - 1, min_len, min_len + 1, 200, 997, 3000]
    out = []
    for _ in range(n):
        ln = rng.choice(lengths)
        if rng.random() < 0.3 and out:
            # planted shared runs: splice a slice of an earlier doc
            base = rng.choice(out)
            if len(base) > min_len:
                s = rng.randrange(0, len(base) - min_len)
                run = base[s : s + min_len + rng.randrange(0, 64)]
                pad = "".join(rng.choice(ALPHABET) for _ in range(ln))
                out.append(pad[: ln // 2] + run + pad[ln // 2 :])
                continue
        out.append("".join(rng.choice(ALPHABET) for _ in range(ln)))
    return out


def _per_doc_rows(ids, texts, min_len):
    rows = []
    for i, t in zip(ids, texts):
        pos, h1, h2 = _anchors_and_hashes(t, min_len)
        rows.extend(
            (int(i), int(p), int(a), int(b)) for p, a, b in zip(pos, h1, h2)
        )
    return rows


@pytest.mark.parametrize("min_len", [33, 40, 64, 128])
def test_batched_anchors_equal_per_doc(min_len):
    texts = _random_texts(300, min_len, seed=min_len)
    ids = np.arange(len(texts), dtype=np.int64)
    ref = _per_doc_rows(ids, texts, min_len)
    d, p, h1, h2 = _anchors_batch(ids, texts, min_len)
    got = list(zip(d.tolist(), p.tolist(), h1.tolist(), h2.tolist()))
    assert got == ref


def test_batched_anchors_empty_and_all_short():
    ids = np.arange(3, dtype=np.int64)
    d, p, h1, h2 = _anchors_batch(ids, ["", "ab", "x" * 63], 64)
    assert len(d) == len(p) == len(h1) == len(h2) == 0


def test_sliding_leftmost_argmin_matches_naive():
    rng = np.random.default_rng(11)
    for w in (2, 3, 5, 16, 32, 33):
        # small value range forces ties → exercises the leftmost rule
        h = rng.integers(0, 6, size=500).astype(np.uint64)
        got = _sliding_leftmost_argmin(h, w)
        sw = np.lib.stride_tricks.sliding_window_view(h, w)
        ref = sw.argmin(axis=1) + np.arange(len(h) - w + 1)
        assert np.array_equal(got, ref)


def test_kgram_hashes_unchanged_reference():
    # the batched kernel reproduces _kgram_hashes via the B^(K-1) scale
    # factor; pin _kgram_hashes itself against a literal polynomial
    arr = np.array([3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9, 3, 2, 3],
                   dtype=np.uint64)
    h = _kgram_hashes(arr)
    B = 1099511628211
    expect = []
    for i in range(len(arr) - 16 + 1):
        v = 0
        for j in range(16):
            v = (v + int(arr[i + j]) * pow(B, 16 - 1 - j, 2**64)) % 2**64
        expect.append(v)
    assert [int(x) for x in h.view(np.uint64)] == expect


def test_spans_and_pairs_on_planted_corpus(spark):
    """End-to-end: grouped extension + in-run skipping reproduce the
    brute-force span semantics on a corpus with planted shared runs
    (including multiple runs between one doc pair on one diagonal)."""
    run1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    run2 = "one two three four five six seven eight nine ten eleven twelve!!"
    assert len(run1) >= 64 and len(run2) >= 64
    docs = [
        (1, f"PRE {run1} MID {run2} POST"),
        # same runs at the same relative offset → same diagonal, two runs
        (2, f"pre {run1} mid {run2} post"),
        (3, f"{run1}"),
        (4, "unrelated " * 20),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    spans = {
        (r.src, r.dst, r.pos_src, r.pos_dst, r.run_len)
        for r in substring_dup_spans(df, 64).collect()
    }
    # doc1/doc2: two distinct maximal runs on one diagonal
    assert {(s[0], s[1]) for s in spans} == {(1, 2), (1, 3), (2, 3)}
    d12 = [s for s in spans if (s[0], s[1]) == (1, 2)]
    assert len(d12) == 2
    pairs = {
        (r.src, r.dst) for r in substring_dup_pairs(df, 64).collect()
    }
    assert pairs == {(1, 2), (1, 3), (2, 3)}
