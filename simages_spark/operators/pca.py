"""PCA 2-D projection of the embedding table (SURVEY.md §2.4 A7).

Parity with the reference's duplicate-visualization projection
(reference: src/simages/extractor.py:430-433 — sklearn PCA(n_components=2)
over the autoencoder embedding matrix before plotting).

Spark-first decomposition:
  * the DISTRIBUTED part — second-moment accumulation — is one
    mapInPandas pass emitting per-batch partials (n, Σx, ΣxᵀX flattened:
    ~33 KB each), combined with a tiny posexplode+sum; no shuffle of
    row-level data, no N×dim² blowup.
  * the O(dim³) eigendecomposition runs driver-side on the 64×64
    covariance — constant work at any corpus size (the same split
    pyspark.ml's PCA uses internally via computePrincipalComponents).
  * the projection back over the corpus is a JVM fold over the vector
    with the two eigenvectors folded in as literals — whole-stage
    codegen, no Python.

Eigenvector sign is normalized (largest-|component| entry positive) so
the projection is deterministic across LAPACK builds.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def _moment_partials(
    embeddings: DataFrame, dim: int, vec_col: str
) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            yield pd.DataFrame(
                {
                    "n": [len(x)],
                    "s": [x.sum(axis=0)],
                    "c": [(x.T @ x).ravel()],
                }
            )

    return embeddings.select(vec_col).mapInPandas(
        run, schema="n long, s array<double>, c array<double>"
    )


def covariance_matrix(
    embeddings: DataFrame, dim: int = 64, vec_col: str = "embedding"
) -> tuple[np.ndarray, int]:
    """Population covariance (dim×dim numpy) + row count. The only
    collect is of dim + dim² scalar aggregates — same footprint class as
    a quantile threshold, independent of corpus size."""
    parts = _moment_partials(embeddings, dim, vec_col)
    combined = (
        parts.select(
            "n", F.posexplode(F.concat("s", "c")).alias("pos", "v")
        )
        .groupBy("pos")
        .agg(F.sum("v").alias("v"), F.sum("n").alias("n_sum"))
        .collect()
    )
    total = np.zeros(dim + dim * dim)
    n = 0
    for r in combined:
        total[r["pos"]] = r["v"]
        n = max(n, r["n_sum"])
    # n_sum is the same total on every pos row (sum over all partials)
    s, c = total[:dim], total[dim:].reshape(dim, dim)
    cov = c / n - np.outer(s, s) / (n * n)
    return cov, n


def principal_components(cov: np.ndarray, k: int = 2) -> np.ndarray:
    """Top-k eigenvectors (rows), deterministic sign."""
    vals, vecs = np.linalg.eigh(cov)  # ascending
    comps = vecs[:, ::-1][:, :k].T  # (k, dim), descending eigenvalue
    out = comps.copy()
    for i in range(k):
        j = int(np.argmax(np.abs(out[i])))
        if out[i, j] < 0:
            out[i] = -out[i]
    return out


def pca_projection_2d(
    embeddings: DataFrame,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    center: bool = True,
) -> DataFrame:
    """(vec_id, pc1, pc2) — the corpus projected on its top-2 principal
    axes (mean-centered), rounded to 6 dp for cross-engine comparison."""
    cov, _ = covariance_matrix(embeddings, dim, vec_col)
    comps = principal_components(cov, 2)
    # mean for centering (cheap second aggregate, JVM)
    mean_row = embeddings.select(
        *[
            F.avg(F.col(vec_col)[i].cast("double")).alias(f"m{i}")
            for i in range(dim)
        ]
    ).collect()[0]
    mean = np.array([mean_row[f"m{i}"] for i in range(dim)])
    offs = comps @ mean if center else np.zeros(2)

    def proj(component: np.ndarray, off: float):
        arr = F.array(*[F.lit(float(x)) for x in component])
        dot = F.aggregate(
            F.zip_with(
                F.col(vec_col), arr, lambda x, y: x.cast("double") * y
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        return F.round(dot - F.lit(float(off)), 6)

    return embeddings.select(
        F.col(id_col).alias("vec_id"),
        proj(comps[0], offs[0]).alias("pc1"),
        proj(comps[1], offs[1]).alias("pc2"),
    )


def embedding_covariance(
    embeddings: DataFrame, dim: int = 64, vec_col: str = "embedding"
) -> DataFrame:
    """(i, j, cov) upper-triangle population covariance entries (1-based
    indices, 6-dp) — the SQL-checkable half of PCA (DuckDB covar_pop)."""
    cov, _ = covariance_matrix(embeddings, dim, vec_col)
    spark = embeddings.sparkSession
    rows = [
        (i + 1, j + 1, float(round(cov[i, j], 6)))
        for i in range(dim)
        for j in range(i, dim)
    ]
    return spark.createDataFrame(rows, "i int, j int, cov double")
