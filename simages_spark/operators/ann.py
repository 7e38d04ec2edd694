"""Similarity search over dense embedding vectors.

The reference's original vector form: top-k closest pairs over an N×z
embedding matrix (`closely.solve`, reference: src/simages/extractor.py:321-342,
cosine metric reference: src/simages/main.py:222). Two paths:

* brute-force exact cosine — JVM `zip_with`/`aggregate` dot products,
  sequential left-fold so the float math is bit-identical to the DuckDB
  oracle's list_sum. Quadratic: baseline + oracle only.
* random-hyperplane LSH — the scale path: 16-bit sign-sketch buckets,
  candidates within a bucket, exact re-rank. Hyperplanes are seeded and
  computed driver-side (z×bits floats — tiny), shipped as literals.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_sim_col(a, b):
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def bruteforce_cosine_pairs(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All (src<dst) pairs with cosine ≥ threshold — exact, O(N²)."""
    left = embeddings.select(
        F.col(id_col).alias("src"), F.col(vec_col).alias("v_src")
    )
    right = embeddings.select(
        F.col(id_col).alias("dst"), F.col(vec_col).alias("v_dst")
    )
    return (
        left.crossJoin(right)
        .where(F.col("src") < F.col("dst"))
        .withColumn("cosine", F.round(cosine_sim_col(F.col("v_src"), F.col("v_dst")), 6))
        .where(F.col("cosine") >= threshold)
        .select("src", "dst", "cosine")
    )


def cosine_topk(
    embeddings: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Global top-k closest pairs (TakeOrderedAndProject, no full sort)."""
    pairs = bruteforce_cosine_pairs(embeddings, -1.0, id_col, vec_col)
    return pairs.orderBy(F.col("cosine").desc(), "src", "dst").limit(k)


def hyperplane_sketches(
    embeddings: DataFrame,
    dim: int,
    bands: int = 16,
    bits_per_band: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, band, band_val) — OR-amplified random-hyperplane LSH.

    Each band is the sign pattern of `bits_per_band` seeded hyperplanes
    (sketch-agreement prob per bit: 1-θ/π); a pair is a candidate if ANY
    band matches — the cosine analog of MinHash banding. The hyperplane
    matrix is a driver-side constant folded into the plan; per-row work is
    bands×bits JVM dot products (codegen), no Python.
    """
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((bands * bits_per_band, dim))
    band_structs = []
    for b in range(bands):
        val = F.lit(0).cast("long")
        for i in range(bits_per_band):
            plane = F.array(*[F.lit(float(x)) for x in planes[b * bits_per_band + i]])
            bit = (_dot(F.col(vec_col), plane) >= 0).cast("long")
            val = val + F.shiftleft(bit, i)
        band_structs.append(
            F.struct(F.lit(b).alias("band"), val.alias("band_val"))
        )
    return (
        embeddings.select(
            F.col(id_col).alias("vec_id"), F.explode(F.array(*band_structs)).alias("s")
        )
        .select("vec_id", "s.band", "s.band_val")
    )


def ann_cosine_pairs(
    embeddings: DataFrame,
    threshold: float,
    dim: int,
    bands: int = 16,
    bits: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate near-neighbor pairs: banded hyperplane-LSH candidates,
    exact cosine re-rank. The scale path for 10^9+ vectors — a bucket
    equi-join on (band, band_val) instead of a cross join; exact re-rank
    keeps precision 1.0, recall set by the band S-curve."""
    sk = hyperplane_sketches(embeddings, dim, bands, bits, seed, id_col, vec_col)
    cands = (
        sk.select("band", "band_val", F.col("vec_id").alias("src"))
        .join(sk.select("band", "band_val", F.col("vec_id").alias("dst")), ["band", "band_val"])
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .dropDuplicates(["src", "dst"])
    )
    base = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec"))
    return (
        cands.join(base.select(F.col("vec_id").alias("src"), F.col("vec").alias("v_src")), "src")
        .join(base.select(F.col("vec_id").alias("dst"), F.col("vec").alias("v_dst")), "dst")
        .withColumn("cosine", F.round(cosine_sim_col(F.col("v_src"), F.col("v_dst")), 6))
        .where(F.col("cosine") >= threshold)
        .select("src", "dst", "cosine")
    )
