"""Exact-duplicate detection by content hash (SURVEY.md §2.3 J7a).

The vendored finder's sha-256 grouping
(reference: src/simages/duplicate_images/tests/test.py:36 golden sha;
grouping reference: src/simages/duplicate_finder.py:255-283) — the
cheapest dedup layer, run before any similarity machinery. One shuffle on
a 256-bit key; map-side partial aggregation makes it scan-bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def with_content_hash(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.withColumn("text_sha", F.sha2(F.col(text_col), 256))


def exact_dup_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(text_sha, total) for hashes appearing more than once."""
    return (
        with_content_hash(docs, text_col)
        .groupBy("text_sha")
        .agg(F.count("*").alias("total"))
        .where(F.col("total") > 1)
    )


def source_dup_stats(
    docs: DataFrame, by: str = "source", text_col: str = "text"
) -> DataFrame:
    """Dedup attribution rollup: per `by` group (crawl source / domain /
    snapshot), how many docs are REDUNDANT under corpus-wide keep-first
    exact dedup (doc_id != min doc_id of its sha-256 group).

    The ops question this answers at web scale is "which source is
    feeding me duplicates" — the reference's per-folder duplicate counts
    (src/simages/duplicate_finder.py:255-283) generalized to a keyed
    rollup. Two shuffles, both inherent: one on the content hash (keeper
    election, map-side partial agg), one on `by` (final rollup, ~|sources|
    rows). No window over the corpus, no collect.

    Null/empty parity with the dedup policy: the hash is computed only
    for docs `exact_dup_edges` would consider (non-null, non-whitespace
    text — the keep-first policy never deletes empty docs, so counting
    them as redundant here would attribute deletions that never happen).
    Excluded docs get a NULL sha, join no keeper through the LEFT join,
    and count as NOT redundant — but they stay in n_docs (the
    denominator).
    """
    nonempty = F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != "")
    hashed = docs.select(
        "doc_id",
        by,
        F.when(nonempty, F.sha2(F.col(text_col), 256)).alias("text_sha"),
    )
    keepers = hashed.groupBy("text_sha").agg(F.min("doc_id").alias("_keeper"))
    redundant = F.when(F.col("doc_id") != F.col("_keeper"), 1).otherwise(0)
    return (
        hashed.join(keepers, "text_sha", "left")
        .groupBy(by)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(redundant).alias("n_dup_docs"),
            F.round(
                F.sum(redundant).cast("double") / F.count("*"), 6
            ).alias("dup_ratio"),
        )
    )


def exact_dup_edges(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Star edges (src<dst, jaccard=1.0) connecting exact-identical docs.

    Bucket members are *identical by construction*, so connectivity (star
    to the min doc_id) is all downstream CC needs — linear in group size,
    robust to pathological floods (a 10^6-copy spam page emits 10^6-1
    edges, not C(10^6, 2)). One shuffle on the content hash.
    """
    from simages_spark.operators.buckets import bucket_star_edges

    # null/whitespace-only docs have no shingle set: they are not
    # meaningful duplicates of each other and would reach the verify
    # join with 0/0 jaccard — exclude them here (tokenize-empty ⟺
    # trim-empty), mirroring the oracle's len(shingles) > 0 filter
    nonempty = docs.where(
        F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != "")
    )
    hashed = with_content_hash(nonempty, text_col).select("doc_id", "text_sha")
    # dedup=False: each doc has exactly one sha, so each (min, other)
    # edge is emitted by exactly one bucket — the cross-bucket dedup
    # exchange was provably a no-op (guide §2.4)
    stars = bucket_star_edges(hashed, ["text_sha"], "doc_id", dedup=False)
    return stars.select(
        F.col("a").alias("src"), F.col("b").alias("dst"), F.lit(1.0).alias("jaccard")
    )
