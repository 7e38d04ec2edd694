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
