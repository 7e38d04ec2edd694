"""Exact-Jaccard verification of candidate pairs (SURVEY.md §2.3 J2).

The reference's distances are exact by construction
(reference: src/simages/extractor.py:335-340); LSH candidates are not, so
every candidate edge is verified with exact Jaccard over the docs' hashed
shingle sets. Runs entirely JVM-side (`array_intersect`/`array_union` on
array<long>), no Python: the shingle sets were materialized once by the
signature UDF and ride along as `shingle_hashes`.

Scale notes: the two joins shuffle candidates on src then dst against the
signatures table; with signatures checkpointed (bucketed by doc_id at
cluster scale) these are plain hash joins, and AQE skew-split covers hot
docs that appear in many candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from simages_spark.config import DedupConfig


def verify_pairs(
    candidates: DataFrame,
    signatures: DataFrame,
    cfg: DedupConfig | None = None,
    keep_below_threshold: bool = False,
) -> DataFrame:
    """candidates(src,dst) × signatures → edges(src, dst, jaccard).

    Inner joins reproduce the reference's drop-if-missing enrichment
    semantics (reference: src/simages/duplicate_finder.py:162-164).
    """
    cfg = cfg or DedupConfig()
    sig = signatures.select("doc_id", "shingle_hashes")
    edges = (
        candidates.join(
            sig.select(
                F.col("doc_id").alias("src"),
                F.col("shingle_hashes").alias("h_src"),
            ),
            "src",
        )
        .join(
            sig.select(
                F.col("doc_id").alias("dst"),
                F.col("shingle_hashes").alias("h_dst"),
            ),
            "dst",
        )
        # guard the denominator: a pair of zero-shingle docs (null/
        # whitespace-only text reaching verify via the exact-hash layer)
        # would yield 0/0 = NaN, and Spark orders NaN ABOVE all doubles so
        # it would silently pass any >= threshold — drop such pairs, same
        # as the oracle's len(shingles) > 0 semantics
        .where(F.size("h_src") + F.size("h_dst") > 0)
        .withColumn("n_inter", F.size(F.array_intersect("h_src", "h_dst")))
        .withColumn(
            "jaccard",
            F.col("n_inter")
            / (F.size("h_src") + F.size("h_dst") - F.col("n_inter")).cast("double"),
        )
        .select("src", "dst", "jaccard")
    )
    if not keep_below_threshold:
        edges = edges.where(F.col("jaccard") >= cfg.jaccard_threshold)
    return edges


def top_k_pairs(edges: DataFrame, k: int) -> DataFrame:
    """Global top-k most-similar pairs, the reference's result contract
    (closest first, reference: README.md:9-10; n clamp src/simages/extractor.py:330-333).
    orderBy().limit() compiles to TakeOrderedAndProject — no full sort.
    """
    return edges.orderBy(F.col("jaccard").desc(), "src", "dst").limit(k)


def quantile_pairs(edges: DataFrame, q: float) -> DataFrame:
    """All pairs in the closest q-quantile (reference: src/simages/extractor.py:328,
    `quantile` param). Exact percentile; at extreme scale swap for
    approxQuantile — documented tradeoff, not silent."""
    thresh = edges.agg(
        F.expr(f"percentile(jaccard, {1.0 - q})").alias("t")
    ).collect()[0]["t"]
    return edges.where(F.col("jaccard") >= thresh)
