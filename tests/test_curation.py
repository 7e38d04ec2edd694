"""Curation operators: decontamination, stratified sampling, token-budget
mix — each checked against an independent pure-Python reference, and the
distributed prefix sum checked for partitioning invariance (the property
the two-phase design must preserve at any cluster size)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from simages_spark.functions.shingles import hash_shingles, shingle_strings, tokenize
from simages_spark.operators.curation import (
    SAMPLE_MOD,
    SAMPLE_MULT,
    decontamination_report,
    sample_key_col,
    stratified_sample,
    token_budget_mix,
)

WORDS = "the quick brown fox jumps over a lazy dog near riverbank stone".split()


def _random_docs(n: int, seed: int) -> list[tuple[int, str, str, str]]:
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        text = " ".join(rng.choice(WORDS) for _ in range(rng.randint(0, 40)))
        rows.append((i, text, rng.choice(["en", "de", "fr", "es"]),
                     f"src{rng.randint(0, 4)}"))
    return rows


def _py_key(doc_id: int) -> int:
    return ((doc_id % SAMPLE_MOD + SAMPLE_MOD) % SAMPLE_MOD * SAMPLE_MULT) % SAMPLE_MOD


def test_decontamination_matches_python_reference(spark):
    rows = _random_docs(80, seed=7)
    # plant contamination: doc 50 copies doc 3's text, doc 51 shares a tail
    rows[50] = (50, rows[3][1], "en", "src0")
    rows[51] = (51, rows[5][1] + " extra tail words here", "en", "src1")
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    bench = df.where(F.col("doc_id") < 10)
    corpus = df.where(F.col("doc_id") >= 10)
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_overlap"])
        for r in decontamination_report(corpus, bench, k=5).collect()
    }

    bench_hashes = set()
    for i, text, _, _ in rows[:10]:
        bench_hashes |= set(hash_shingles(shingle_strings(text, 5)).tolist())
    expect = {}
    for i, text, _, _ in rows[10:]:
        h = set(hash_shingles(shingle_strings(text, 5)).tolist())
        ov = len(h & bench_hashes)
        if ov:
            expect[i] = (len(h), ov)
    assert got == expect
    assert 50 in got and 51 in got  # the planted contamination is flagged


def test_stratified_sample_deterministic_and_nested(spark):
    rows = _random_docs(300, seed=11)
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    rates = {"en": 0.5, "de": 0.25}
    got = {
        r["doc_id"]
        for r in stratified_sample(df, rates, default_rate=0.1).collect()
    }
    expect = set()
    for i, _, lang, _ in rows:
        thresh = int(rates.get(lang, 0.1) * SAMPLE_MOD)
        if _py_key(i) < thresh:
            expect.add(i)
    assert got == expect
    # partitioning invariance (pure map — but pin it anyway)
    got17 = {
        r["doc_id"]
        for r in stratified_sample(df.repartition(17), rates, 0.1).collect()
    }
    assert got17 == got
    # nested thresholds: halving every rate yields a subset
    half = {
        r["doc_id"]
        for r in stratified_sample(
            df, {k: v / 2 for k, v in rates.items()}, 0.05
        ).collect()
    }
    assert half <= got


def test_sample_key_negative_ids_nonnegative(spark):
    df = spark.range(1).select(F.lit(-12345678901).alias("doc_id"))
    key = df.select(sample_key_col(F.col("doc_id")).alias("k")).head()["k"]
    assert 0 <= key < SAMPLE_MOD
    assert key == _py_key(-12345678901)


def _py_mix(rows, budgets, default_budget):
    """Reference: per-source inclusive prefix sum in (key, doc_id) order."""
    toks = {i: len(tokenize(t)) for i, t, _, _ in rows}
    by_source: dict[str, list] = {}
    for i, t, _, s in rows:
        by_source.setdefault(s, []).append(i)
    keep = {}
    for s, ids in by_source.items():
        ids.sort(key=lambda i: (_py_key(i), i))
        cum = 0
        for i in ids:
            cum += toks[i]
            if cum <= budgets.get(s, default_budget):
                keep[i] = (s, toks[i], cum)
    return keep


@pytest.mark.parametrize("parts", [3, 17])
def test_token_budget_mix_matches_reference_any_partitioning(spark, parts):
    rows = _random_docs(250, seed=23)
    rows[7] = (7, "", "en", "src0")  # zero-token doc
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).repartition(parts)
    budgets = {"src0": 150, "src1": 80, "src2": 0, "src3": 400}
    got = {
        r["doc_id"]: (r["source"], r["n_tokens"], r["cum_tokens"])
        for r in token_budget_mix(df, budgets, default_budget=0,
                                  num_partitions=parts).collect()
    }
    assert got == _py_mix(rows, budgets, 0)
    # budget-0 / unknown sources contribute nothing
    assert all(s not in ("src2", "src4") for s, _, _ in got.values())


def test_token_budget_mix_single_partition_edge(spark):
    rows = [(1, "a b c", "en", "sA"), (2, "d e", "en", "sA"), (3, "f", "en", "sA")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    got = {
        r["doc_id"]: r["cum_tokens"]
        for r in token_budget_mix(df, {"sA": 5}, num_partitions=1).collect()
    }
    # key order decides which docs fit the 5-token budget
    assert got == {i: c for i, (_, _, c) in _py_mix(rows, {"sA": 5}, 0).items()}
