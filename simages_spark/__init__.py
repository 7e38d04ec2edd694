"""simages_spark — PySpark-native near-duplicate detection & clustering engine.

A from-scratch rebuild of the *capabilities* of JustinShenk/simages
(`/root/reference`) on Apache Spark: the reference's autoencoder-embedding
O(N^2) similarity search (reference: src/simages/extractor.py:321-342) is
re-expressed as a web-scale text dedup pipeline — 5-gram shingling,
128-perm MinHash + LSH banding (b=16, r=8), 60-bit SimHash with
Hamming-ball expansion, exact-Jaccard verification, and
large-star/small-star connected components — all declarative DataFrame
programs plus vectorized Arrow UDFs (no per-row Python).
"""

from simages_spark.config import DedupConfig
from simages_spark.operators.incremental import incremental_dedup_edges
from simages_spark.pipeline import (
    dedup_plan,
    find_duplicates,
    representative_docs,
    top_pairs,
)
from simages_spark.table import SnapshotTable

__all__ = [
    "DedupConfig",
    "SnapshotTable",
    "dedup_plan",
    "find_duplicates",
    "incremental_dedup_edges",
    "representative_docs",
    "top_pairs",
]
__version__ = "0.3.0"
