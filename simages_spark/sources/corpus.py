"""Synthetic pages corpus (BASELINE.json input_hint shape) + ingest.

Seeded, deterministic generator for the `pages(url, warc_ts, html, text,
lang)` table with planted duplicate structure and ground truth — the
analog of the reference's fixture corpora (`images/balloons/` exact-dup
pair; `duplicate_images/tests/images/deeply/` planted transforms). Used by
tests and the scaling benchmark; NO external data.

Generation is distributed: a seed range is parallelized and each partition
derives its rows from (seed, row index) alone, so output is identical at
any parallelism — and generating 10^8 rows is just a bigger range.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

VOCAB = [
    "data", "query", "table", "row", "column", "scan", "filter", "join",
    "group", "sort", "hash", "merge", "spark", "batch", "stream", "window",
    "agg", "key", "value", "part", "small", "big", "fast", "slow", "the",
    "a", "order", "line", "customer", "vector",
]
LANGS = ["en", "en", "en", "de", "fr", "es", "zh"]  # en-skewed like the web

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string, "
    "truth_cluster long"
)


def _rng_for(seed: int, idx: int) -> np.random.Generator:
    mixed = int.from_bytes(
        hashlib.blake2b(f"{seed}:{idx}".encode(), digest_size=8).digest(), "big"
    )
    return np.random.default_rng(mixed)


def _base_text(rng: np.random.Generator, n_tokens: int) -> list[str]:
    return [VOCAB[i] for i in rng.integers(0, len(VOCAB), n_tokens)]


def _page_row(seed: int, idx: int) -> tuple:
    """One deterministic page, a pure function of (seed, idx). Every 8th
    doc is a mutation of the previous base doc: idx%8==1 exact copy, ==2
    near-dup (few token edits), ==3 shared-long-substring page; a small
    hot-boilerplate block repeats verbatim across many docs at idx%97==0
    (bucket-skew exercise). The footer only lands on NON-clustered roles:
    within a group at most one member can hit idx%97==0, so a footer on a
    role-0/1/2 doc silently broke the planted truth it claims (an "exact
    duplicate" that isn't byte-identical, a near-dup pushed toward the
    LSH S-curve knee) — ground truth must stay exact."""
    rng = _rng_for(seed, idx)
    group = idx // 8
    role = idx % 8
    base_rng = _rng_for(seed, group * 8)
    base = _base_text(base_rng, 40 + int(base_rng.integers(0, 80)))
    truth_cluster = -1
    if role == 0:
        toks = base
        truth_cluster = group * 8
    elif role == 1:  # exact duplicate of role 0 (the HOT_AIRBALLOON pair)
        toks = base
        truth_cluster = group * 8
    elif role == 2:  # near-dup: edit ~1% of tokens (shingle-jaccard ≈ 0.9,
        # comfortably above the b=16/r=8 S-curve 50% point s≈0.707)
        toks = list(base)
        n_edit = max(1, len(toks) // 100)
        for pos in rng.integers(0, len(toks), n_edit):
            toks[int(pos)] = VOCAB[int(rng.integers(0, len(VOCAB)))]
        truth_cluster = group * 8
    elif role == 3:  # shared long substring, otherwise different
        prefix = _base_text(rng, 30)
        toks = prefix + base[: max(25, len(base) // 2)]
    else:  # unrelated page
        toks = _base_text(rng, 30 + int(rng.integers(0, 90)))
    if role >= 3 and idx % 97 == 0:  # hot boilerplate footer, ~0.6% of docs
        toks = toks + ["copyright", "footer", "nav", "menu", "cookie", "policy"] * 3
    text = " ".join(toks)
    url = f"https://example-{seed}.org/page/{idx}"
    ts = pd.Timestamp("2024-01-01", tz="UTC") + pd.Timedelta(seconds=int(idx))
    html = f"<html><body>{text}</body></html>".encode()
    lang = LANGS[idx % len(LANGS)]
    return (url, ts, html, text, lang, truth_cluster)


def generate_pages(
    spark: SparkSession, n_docs: int, seed: int = 42, partitions: int = 32
) -> DataFrame:
    """Distributed deterministic corpus: mapInPandas over an index range."""
    idx_df = spark.range(0, n_docs, 1, partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_page_row(seed, int(i)) for i in pdf["id"]]
            yield pd.DataFrame(
                rows,
                columns=["url", "warc_ts", "html", "text", "lang", "truth_cluster"],
            )

    return idx_df.mapInPandas(gen, schema=PAGES_SCHEMA)


def extract_text(pages: DataFrame) -> DataFrame:
    """Canonicalization M1: html → text. Must be byte-identical to the
    stored `text` column per url (input_hint invariant; the analog of the
    deterministic eval transform, reference: src/simages/extractor.py:105-112).
    Pure JVM regexp — strips tags, collapses entity-free body text."""
    return pages.withColumn(
        "extracted_text",
        F.regexp_replace(F.decode(F.col("html"), "UTF-8"), "<[^>]*>", ""),
    )


def mint_doc_ids(pages: DataFrame, key: str = "url") -> DataFrame:
    """Deterministic dense-ish doc_id: xxhash64(url). Stable across
    partitionings — NEVER monotonically_increasing_id (SURVEY.md §1.3)."""
    return pages.withColumn("doc_id", F.xxhash64(F.col(key)))


def ingest(
    pages_new: DataFrame, pages_known: DataFrame | None, key: str = "url"
) -> DataFrame:
    """Incremental ingest (reference `add`, src/simages/duplicate_finder.py:130-139):
    anti-join out already-known urls; idempotent by construction."""
    if pages_known is None:
        return pages_new
    return pages_new.join(pages_known.select(key).distinct(), key, "left_anti")
