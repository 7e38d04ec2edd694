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


def exact_dup_edges(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Pair edges (src<dst, jaccard=1.0) between exact-identical docs.

    Within-group pairing via a compact self-join on the hash; groups are
    tiny by nature (true byte-duplicates), so no salting needed — AQE
    skew-split covers pathological cases (e.g. empty-string floods).
    """
    hashed = with_content_hash(docs, text_col).select("doc_id", "text_sha")
    left = hashed.select(F.col("text_sha"), F.col("doc_id").alias("src"))
    right = hashed.select(F.col("text_sha"), F.col("doc_id").alias("dst"))
    return (
        left.join(right, "text_sha")
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst", F.lit(1.0).alias("jaccard"))
    )
