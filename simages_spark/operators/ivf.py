"""IVF (inverted-file) approximate nearest-neighbor search over embeddings.

The second scale path for vector similarity (alongside the hyperplane-LSH
buckets in operators/ann.py): partition the vector space into `n_cells`
cells, assign every vector to its `nprobe` best cells, and only compare
vectors sharing a cell — a bucket equi-join instead of the reference's
O(N²) distance matrix (reference: src/simages/extractor.py:321-342).

Determinism & portability (driver-oracle value-checkable):
* Cell centroids are the `n_cells` corpus vectors with the smallest ids —
  a deterministic, data-dependent codebook that DuckDB replays with
  `ORDER BY vec_id LIMIT k`. On a real cluster the codebook is pluggable
  (train k-means once, broadcast); the assignment/join machinery below is
  unchanged — only `centroids` differs.
* Assignment score is the INTEGER dot product of quantized vectors
  (floor(v·10⁶ + 0.5), as operators/ann.py) — exact math, no float
  argmax ties to diverge cross-engine. Ties break on the lower centroid
  id. With 64 dims and |v| ≤ ~1 the score is ≤ ~6.4e13 — safely in
  int64/BIGINT.
* The final exact-cosine re-rank keeps precision 1.0; recall is set by
  nprobe (the standard IVF trade, surfaced via `ivf_metrics`).

Per-batch assignment is one integer GEMM against the broadcast codebook
inside `mapInPandas` — never per-row Python.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from simages_spark.operators.ann import cosine_sim_col, quantize


def ivf_centroids(
    embeddings: DataFrame,
    n_cells: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """(n_cells, dim) int64 quantized codebook — the n_cells vectors with
    the smallest ids, in id order (deterministic, SQL-replayable)."""
    rows = (
        embeddings.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(n_cells)
        .collect()
    )
    return np.stack([quantize(np.asarray(r[vec_col])) for r in rows])


def ivf_assignments(
    embeddings: DataFrame,
    centroids: np.ndarray,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cell) — every vector keyed on its nprobe best cells by
    quantized inner product (ties → lower cell index)."""
    cb = centroids  # (k, dim) int64; tiny — rides into the UDF closure
    k = len(cb)
    nprobe = min(nprobe, k)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            q = np.stack([quantize(np.asarray(v)) for v in pdf[vec_col]])
            scores = q @ cb.T  # (n, k) exact integer GEMM
            # descending score, ascending cell id on ties: lexsort on
            # (-score, cell) via argsort of structured order
            order = np.lexsort(
                (np.broadcast_to(np.arange(k), scores.shape), -scores), axis=1
            )[:, :nprobe]
            ids = pdf[id_col].astype("int64").values
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(ids, nprobe),
                    "cell": order.ravel().astype(np.int64),
                }
            )

    return embeddings.select(id_col, vec_col).mapInPandas(
        run, schema="vec_id long, cell long"
    )


def ivf_cosine_pairs(
    embeddings: DataFrame,
    threshold: float,
    n_cells: int = 16,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(src, dst, cosine) for co-celled pairs with exact cosine ≥ threshold.

    One shuffle on the cell key (the IVF inverted list), exact re-rank on
    the joined pairs. At 10⁹ vectors: n_cells ~ √N keeps lists ~√N long;
    the codebook stays a broadcast-sized array.
    """
    centroids = ivf_centroids(embeddings, n_cells, id_col, vec_col)
    assign = ivf_assignments(embeddings, centroids, nprobe, id_col, vec_col)
    cands = (
        assign.select("cell", F.col("vec_id").alias("src"))
        .join(assign.select("cell", F.col("vec_id").alias("dst")), "cell")
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .dropDuplicates(["src", "dst"])
    )
    base = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")
    )
    return (
        cands.join(
            base.select(F.col("vec_id").alias("src"), F.col("vec").alias("v_src")),
            "src",
        )
        .join(
            base.select(F.col("vec_id").alias("dst"), F.col("vec").alias("v_dst")),
            "dst",
        )
        .withColumn(
            "cosine", F.round(cosine_sim_col(F.col("v_src"), F.col("v_dst")), 6)
        )
        .where(F.col("cosine") >= threshold)
        .select("src", "dst", "cosine")
    )


def ivf_metrics(
    embeddings: DataFrame,
    n_cells: int = 16,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Inverted-list health: cell-size distribution (skew → hot cells make
    the bucket join quadratic in the hot list — same failure mode as LSH
    hot buckets, surfaced the same way)."""
    centroids = ivf_centroids(embeddings, n_cells, id_col, vec_col)
    sizes = (
        ivf_assignments(embeddings, centroids, nprobe, id_col, vec_col)
        .groupBy("cell")
        .agg(F.count("*").alias("n"))
    )
    return sizes.agg(
        F.count("*").alias("n_nonempty_cells"),
        F.max("n").alias("max_cell_n"),
        F.min("n").alias("min_cell_n"),
        F.round(F.avg("n"), 2).alias("avg_cell_n"),
        F.sum((F.col("n") * (F.col("n") - 1) / 2).cast("long")).alias(
            "candidate_pairs_upper_bound"
        ),
    )
