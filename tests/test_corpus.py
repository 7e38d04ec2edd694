"""Synthetic pages corpus: determinism, byte-identity, planted structure."""

from __future__ import annotations

from pyspark.sql import functions as F

from simages_spark.config import DedupConfig
from simages_spark.operators.bruteforce import bruteforce_jaccard_pairs
from simages_spark.sources.corpus import (
    extract_text,
    generate_pages,
    ingest,
    mint_doc_ids,
)

N = 200


def test_generator_deterministic_across_partitioning(spark):
    a = {r["url"]: r["text"] for r in generate_pages(spark, N, 42, 2).collect()}
    b = {r["url"]: r["text"] for r in generate_pages(spark, N, 42, 16).collect()}
    assert a == b
    assert len(a) == N


def test_text_extraction_byte_identical(spark):
    """input_hint invariant: canonicalized text from html == stored text,
    byte for byte, for every url."""
    pages = extract_text(generate_pages(spark, N, 42, 4))
    mismatches = pages.where(
        F.col("extracted_text") != F.col("text")
    ).count()
    assert mismatches == 0


def test_doc_id_minting_stable(spark):
    pages = generate_pages(spark, N, 42, 4)
    ids1 = {r["url"]: r["doc_id"] for r in mint_doc_ids(pages.repartition(3)).collect()}
    ids2 = {r["url"]: r["doc_id"] for r in mint_doc_ids(pages.repartition(13)).collect()}
    assert ids1 == ids2
    assert len(set(ids1.values())) == N  # no collisions at this scale


def test_planted_duplicates_exist(spark):
    pages = mint_doc_ids(generate_pages(spark, N, 42, 4))
    docs = pages.select("doc_id", "text")
    # exact copies (roles 0,1) → one j=1.0 pair per group, always
    exact = bruteforce_jaccard_pairs(docs, DedupConfig(), threshold=0.9999).count()
    assert exact >= N // 8
    # near-dups (role 2, ~1% token edits) sit well above 0.5 even for the
    # shortest docs (1 edit kills ≤5 of ≥36 shingles)
    at_tau = bruteforce_jaccard_pairs(docs, DedupConfig(), threshold=0.5).count()
    assert at_tau >= 3 * (N // 8) * 0.9


def test_ingest_idempotent(spark):
    """Running ingest twice leaves the corpus unchanged (mirror of
    test_add/test_remove, reference: src/simages/duplicate_images/tests/test.py:117-144)."""
    first = generate_pages(spark, N, 42, 4)
    known = first.select("url")
    again = ingest(generate_pages(spark, N, 42, 4), known.toDF("url"))
    assert again.count() == 0
    more = ingest(generate_pages(spark, N + 50, 42, 4), known.toDF("url"))
    assert more.count() == 50


def test_planted_truth_is_exact_everywhere():
    """Ground truth must be EXACT at every index: role-1 docs byte-equal
    their role-0 base even where the hot-boilerplate footer lands
    (idx%97==0 once broke byte-identity inside planted groups — an
    'exact duplicate' the exact tier could never match)."""
    from simages_spark.sources.corpus import _page_row

    # cover several multiples of 97 hitting roles 0..2 (97→role 1,
    # 194→role 2, 776→role 0) plus a plain stretch
    for g in list(range(0, 30)) + [12, 24, 97, 388]:
        base_idx = g * 8
        t0 = _page_row(7, base_idx)[3]
        t1 = _page_row(7, base_idx + 1)[3]
        assert t0 == t1, f"group {g}: role-1 not byte-identical"
        t2 = _page_row(7, base_idx + 2)[3]
        a, b = set(t0.split()), set(t2.split())
        assert len(a & b) / len(a | b) > 0.8, f"group {g}: near-dup too far"
    # the boilerplate footer still exists on unclustered roles
    footer_doc = _page_row(7, 97 * 4)[3]  # 388 % 8 == 4 → unrelated role
    assert "copyright footer nav" in footer_doc
