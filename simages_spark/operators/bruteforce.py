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
    """All (src<dst) pairs with exact shingle-Jaccard ≥ threshold."""
    cfg = cfg or DedupConfig()
    tau = cfg.jaccard_threshold if threshold is None else threshold
    sets = shingle_sets(docs, cfg).where(F.size("shingles") > 0)
    left = sets.select(F.col("doc_id").alias("src"), F.col("shingles").alias("s_src"))
    right = sets.select(F.col("doc_id").alias("dst"), F.col("shingles").alias("s_dst"))
    return (
        left.crossJoin(right)
        .where(F.col("src") < F.col("dst"))
        .withColumn("n_inter", F.size(F.array_intersect("s_src", "s_dst")))
        .withColumn(
            "jaccard",
            F.col("n_inter")
            / (F.size("s_src") + F.size("s_dst") - F.col("n_inter")).cast("double"),
        )
        .where(F.col("jaccard") >= tau)
        .select("src", "dst", "jaccard")
    )
