"""Brute-force exact all-pairs Jaccard — the reference semantics baseline.

This IS what the reference computes: an exhaustive O(N²) pairwise
similarity pass (`closely.solve` full cdist matrix,
reference: src/simages/extractor.py:321-342). Kept as (a) the recall
oracle for the LSH path and (b) the DuckDB-value-checked correctness
query — it shares byte-exact shingle semantics with the oracle SQL via
`shingles_col`, all JVM-side string-array ops, zero Python.

Scale posture: deliberately quadratic; correct only at oracle scale. The
production path is operators/lsh.py + verify.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from simages_spark.config import DedupConfig
from simages_spark.functions.shingles import shingles_col


def shingle_sets(docs: DataFrame, cfg: DedupConfig | None = None) -> DataFrame:
    cfg = cfg or DedupConfig()
    return docs.select(
        "doc_id", shingles_col(F.col("text"), cfg.shingle_size).alias("shingles")
    )


def bruteforce_jaccard_pairs(
    docs: DataFrame,
    cfg: DedupConfig | None = None,
    threshold: float | None = None,
) -> DataFrame:
    """All (src<dst) pairs with exact shingle-Jaccard ≥ threshold.

    Expressed as a relational set-similarity join — explode the shingle
    sets, equi-join on the shingle, count matches per pair — rather than a
    crossJoin + array_intersect: identical results for any threshold > 0
    (zero-intersection pairs have jaccard 0), one shuffle on the shingle
    key instead of an O(N²) nested-loop join that re-evaluates the shingle
    expressions per pair. Still inherently quadratic in the worst case
    (every doc sharing one shingle); the production path is LSH.
    """
    cfg = cfg or DedupConfig()
    tau = cfg.jaccard_threshold if threshold is None else threshold
    sets = shingle_sets(docs, cfg).where(F.size("shingles") > 0)
    sizes = sets.select("doc_id", F.size("shingles").alias("n"))
    tok = sets.select("doc_id", F.explode("shingles").alias("shingle"))
    inter = (
        tok.select(F.col("doc_id").alias("src"), "shingle")
        .join(tok.select(F.col("doc_id").alias("dst"), "shingle"), "shingle")
        .where(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes.select(F.col("doc_id").alias("src"), F.col("n").alias("na")), "src")
        .join(sizes.select(F.col("doc_id").alias("dst"), F.col("n").alias("nb")), "dst")
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter")).cast("double"),
        )
        .where(F.col("jaccard") >= tau)
        .select("src", "dst", "jaccard")
    )
