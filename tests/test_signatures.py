"""MinHash / SimHash signature properties + determinism."""

from __future__ import annotations

import numpy as np

from simages_spark.config import DedupConfig
from simages_spark.functions.shingles import hash_shingles, shingle_strings
from simages_spark.functions.signatures import (
    compute_signatures,
    minhash_of_hashes,
    perm_params,
    signature_metrics,
    simhash_of_hashes,
)

CFG = DedupConfig()


def test_perm_params_deterministic():
    a1, b1 = perm_params(128, 42)
    a2, b2 = perm_params(128, 42)
    assert np.array_equal(a1, a2) and np.array_equal(b1, b2)
    assert np.all(a1 % 2 == 1)  # multiply-shift needs odd multipliers
    a3, _ = perm_params(128, 43)
    assert not np.array_equal(a1, a3)


def test_minhash_identical_sets_match():
    a, b = perm_params(128, 42)
    h = hash_shingles(shingle_strings("the quick brown fox jumps over the lazy dog"))
    m1 = minhash_of_hashes(h, a, b)
    m2 = minhash_of_hashes(h.copy(), a, b)
    assert np.array_equal(m1, m2)
    assert m1.shape == (128,)


def test_minhash_estimates_jaccard():
    rng = np.random.default_rng(0)
    a, b = perm_params(128, 42)
    base = rng.integers(0, 2**63, 200, dtype=np.uint64)
    # ~50% overlap set
    other = np.concatenate(
        [base[:100], rng.integers(0, 2**63, 100, dtype=np.uint64)]
    )
    m1, m2 = minhash_of_hashes(base, a, b), minhash_of_hashes(other, a, b)
    est = float(np.mean(m1 == m2))
    true_j = len(np.intersect1d(base, other)) / len(np.union1d(base, other))
    assert abs(est - true_j) < 0.15


def test_simhash_close_for_near_dup():
    rng = np.random.default_rng(1)
    base = rng.integers(0, 2**63, 300, dtype=np.uint64)
    near = base.copy()
    near[:5] = rng.integers(0, 2**63, 5, dtype=np.uint64)  # 5/300 changed
    s1, s2 = simhash_of_hashes(base), simhash_of_hashes(near)
    ham = bin((s1 ^ s2) & (2**64 - 1)).count("1")
    assert ham <= 6
    far = rng.integers(0, 2**63, 300, dtype=np.uint64)
    ham_far = bin((s1 ^ simhash_of_hashes(far)) & (2**64 - 1)).count("1")
    assert ham_far > 10


def test_compute_signatures_df(spark, docs_sf0001):
    sig = compute_signatures(docs_sf0001, CFG)
    rows = sig.collect()
    assert len(rows) == docs_sf0001.count()
    for r in rows[:10]:
        assert len(r["minhash"]) == 128
        assert r["num_shingles"] == len(r["shingle_hashes"])
        assert len(set(r["shingle_hashes"])) == len(r["shingle_hashes"])
        assert 0 <= r["simhash"] < 2**CFG.simhash_bits
        assert all(0 <= h < 2**60 for h in r["shingle_hashes"])


def test_shingle_cap_not_silent(spark):
    """>max_shingles_per_doc docs are truncated deterministically (smallest
    hashes kept) and the truncation is SURFACED, never silent."""
    from simages_spark.functions.shingles import hash_shingles, shingle_strings

    small = DedupConfig(max_shingles_per_doc=10)
    text = " ".join(f"tok{i}" for i in range(50))  # 46 distinct 5-gram shingles
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = compute_signatures(df, small).collect()[0]
    assert row["num_shingles_raw"] == len(shingle_strings(text))
    assert row["num_shingles"] == 10
    expected = sorted(hash_shingles(shingle_strings(text)).tolist())[:10]
    assert sorted(row["shingle_hashes"]) == expected
    m = signature_metrics(compute_signatures(df, small)).collect()[0]
    assert m["n_truncated_docs"] == 1
    assert m["max_shingles_raw"] == row["num_shingles_raw"]


def test_null_and_empty_text_tolerated(spark):
    """S3 malformed-row tolerance: null/empty text → empty signature row,
    no crash, no pairing (reference skips corrupt files with a log,
    extractor.py:114-136)."""
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, "real words here ok")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in compute_signatures(df, CFG).collect()}
    assert len(rows) == 4
    for d in (1, 2, 3):
        assert rows[d]["num_shingles"] == 0
        assert rows[d]["shingle_hashes"] == []
    assert rows[4]["num_shingles"] == 1


def test_signatures_stable_across_partitioning(spark, docs_sf0001):
    """Determinism vs parallelism — the parallel==serial contract
    (reference: src/simages/duplicate_images/tests/test.py:72-75)."""
    s1 = {
        r["doc_id"]: (tuple(r["minhash"]), r["simhash"])
        for r in compute_signatures(docs_sf0001.repartition(1), CFG).collect()
    }
    s2 = {
        r["doc_id"]: (tuple(r["minhash"]), r["simhash"])
        for r in compute_signatures(docs_sf0001.repartition(16), CFG).collect()
    }
    assert s1 == s2
