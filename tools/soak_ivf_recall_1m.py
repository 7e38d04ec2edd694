"""IVF recall at 1M vectors: lowest-id vs Lloyd-trained k-means codebook.

Round-3 verdict item 4 asked for recall@k vs brute force **at 1M
vectors** at equal nprobe; `tools/bench_ivf_recall.py` measured the same
comparison at sf0.1 (2,000 vectors). This soak is the at-scale leg:

* corpus = 1M deterministic 64-d unit vectors with PLANTED cluster
  structure (n_true latent centers + per-id hash-derived Gaussian noise,
  normalized). Every vector is a pure function of its id — bit-identical
  at any partitioning, and the driver can regenerate any row locally.
  Planted clusters are the case IVF exists for (sf0.1's near-uniform
  embeddings are the degenerate worst case; both are now measured).
* ground truth = exact cosine top-k for n_queries sampled queries,
  computed as ONE float64 GEMM pass over the corpus (`mapInPandas`,
  per-batch partial top-(k+16), final per-query window) — the crossJoin
  form of `knn_bruteforce` would put 10^9 rows through interpreted
  `zip_with`/`aggregate` folds. Same metric definition (cosine rounded
  to 6, ties on lower vec_id, self excluded).
* recall@k for BOTH codebooks at nprobe ∈ {1,2,4,8}, n_cells=1024≈√N,
  plus cell-balance metrics and train cost.

Ties: per-batch candidates keep the top k+16 per query, so the final
window is exact unless >16 corpus vectors tie at round-6 cosine on the
k-th boundary *within one batch* — impossible here (all 1M noise draws
distinct). numpy round is half-even vs JVM HALF_UP: flips only on exact
.5e-7 decimal boundaries; set-recall is insensitive to these.

Usage: python tools/soak_ivf_recall_1m.py [n_vectors] [n_queries]
Writes BENCH/ivf_recall_1m.json.
"""

from __future__ import annotations

import json
import sys
import time
from typing import Iterator

import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession, Window, functions as F  # noqa: E402

from simages_spark.operators.ivf import (  # noqa: E402
    ivf_centroids,
    ivf_centroids_trained,
    ivf_knn,
    ivf_metrics,
)
from simages_spark.session import get_spark  # noqa: E402

DIM = 64
N_TRUE = 512  # planted latent clusters
# per-dim noise std: the 64-dim noise VECTOR norm is ~8·SIGMA against a
# unit-norm center, so SIGMA=0.1 → within-cluster cosine ~0.6, cross
# ~0.0 — real but non-trivial cluster structure. (SIGMA=0.45 makes noise
# norm 3.6 ≫ 1: effectively uniform vectors, the degenerate case already
# measured at sf0.1 in bench_ivf_recall.py.)
SIGMA = 0.1
SEED = 7


def _centers() -> np.ndarray:
    rng = np.random.default_rng(SEED)
    c = rng.normal(size=(N_TRUE, DIM))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def _hash_uniform(ids: np.ndarray, salt: int) -> np.ndarray:
    """(n, DIM) uniforms in (0,1), a pure function of (id, dim, salt) —
    splitmix64-style avalanche, vectorized, partition-invariant."""
    i = ids.astype(np.uint64).reshape(-1, 1)
    d = np.arange(DIM, dtype=np.uint64).reshape(1, -1)
    x = i * np.uint64(0x9E3779B97F4A7C15) + (
        d + np.uint64(salt) * np.uint64(0x100000001B3)
    ) * np.uint64(0xC2B2AE3D27D4EB4F)
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xFF51AFD7ED558CCD)
    x ^= x >> np.uint64(33)
    return ((x >> np.uint64(11)).astype(np.float64) + 1.0) / float(1 << 53)


def gen_vectors(ids: np.ndarray, centers: np.ndarray) -> np.ndarray:
    """Deterministic unit vectors: planted center + Box-Muller noise."""
    u1 = _hash_uniform(ids, 1)
    u2 = _hash_uniform(ids, 2)
    noise = np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)
    v = centers[ids % len(centers)] + SIGMA * noise
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def corpus_df(spark: SparkSession, n: int, centers: np.ndarray) -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["id"].values
            v = gen_vectors(ids, centers)
            yield pd.DataFrame({"vec_id": ids, "embedding": list(v)})

    return (
        spark.range(n)
        .repartition(64)
        .mapInPandas(gen, schema="vec_id long, embedding array<double>")
    )


def truth_topk(
    corpus: DataFrame, q_ids: np.ndarray, qmat: np.ndarray, k: int
) -> DataFrame:
    """Exact cosine top-k per query over the whole corpus: one GEMM pass,
    per-batch partial top-(k+16), exact final window."""
    keep = k + 16

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["vec_id"].values
            v = np.stack(pdf["embedding"].values)  # unit norm by construction
            s = np.round(v @ qmat.T, 6)  # (b, q)
            m = min(keep, len(ids))
            part = np.argpartition(-s, m - 1, axis=0)[:m]  # (m, q)
            nq = qmat.shape[0]
            yield pd.DataFrame(
                {
                    "q_id": np.tile(q_ids, m),
                    "vec_id": ids[part].ravel(),
                    "cosine": s[part, np.arange(nq)].ravel(),
                }
            )

    cand = corpus.mapInPandas(
        scan, schema="q_id long, vec_id long, cosine double"
    ).where(F.col("q_id") != F.col("vec_id"))
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "vec_id")
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000
    n_cells, k = 1024, 10
    centers = _centers()
    spark = get_spark("soak_ivf_recall_1m", cores=32)

    corpus = corpus_df(spark, n, centers).persist()
    t0 = time.time()
    assert corpus.count() == n
    t_gen = time.time() - t0

    # deterministic query sample: stride-spread ids, vectors regenerated
    # locally from the same pure function (no Spark fetch)
    q_ids = (np.arange(n_queries, dtype=np.int64) * (n // n_queries)) % n
    q_ids = np.unique(q_ids)
    qmat = gen_vectors(q_ids, centers)
    queries = spark.createDataFrame(
        pd.DataFrame({"vec_id": q_ids, "embedding": list(qmat)})
    )

    t0 = time.time()
    truth = truth_topk(corpus, q_ids, qmat, k).persist()
    n_truth = truth.count()
    t_truth = time.time() - t0

    t0 = time.time()
    cb_naive = ivf_centroids(corpus, n_cells)
    t_naive = time.time() - t0
    t0 = time.time()
    cb_kmeans = ivf_centroids_trained(corpus, n_cells, n_iters=8)
    t_kmeans = time.time() - t0

    out = {
        "n_vectors": n,
        "n_queries": int(len(q_ids)),
        "n_true_clusters": N_TRUE,
        "sigma": SIGMA,
        "n_cells": n_cells,
        "k": k,
        "gen_sec": round(t_gen, 1),
        "truth_sec": round(t_truth, 1),
        "truth_rows": n_truth,
        "train_sec_naive": round(t_naive, 1),
        "train_sec_kmeans": round(t_kmeans, 1),
        "recall": {},
        "balance": {},
        "knn_sec": {},
    }
    for name, cb in (("lowest_id", cb_naive), ("kmeans", cb_kmeans)):
        m = ivf_metrics(corpus, n_cells, nprobe=1, centroids=cb).collect()[0]
        out["balance"][name] = {
            "n_nonempty_cells": m["n_nonempty_cells"],
            "max_cell_n": m["max_cell_n"],
            "avg_cell_n": float(m["avg_cell_n"]),
        }
        for nprobe in (1, 2, 4, 8):
            t0 = time.time()
            approx = ivf_knn(
                queries, corpus, k=k, n_cells=n_cells, nprobe=nprobe, centroids=cb
            )
            hit = approx.select("q_id", "vec_id").intersect(truth).count()
            out["knn_sec"][f"{name}@nprobe={nprobe}"] = round(time.time() - t0, 1)
            out["recall"][f"{name}@nprobe={nprobe}"] = round(hit / n_truth, 4)
            print(
                f"{name} nprobe={nprobe}: recall@{k}="
                f"{out['recall'][f'{name}@nprobe={nprobe}']} "
                f"({out['knn_sec'][f'{name}@nprobe={nprobe}']}s)",
                flush=True,
            )
    print(json.dumps(out, indent=2))
    with open("/root/repo/BENCH/ivf_recall_1m.json", "w") as f:
        json.dump(out, f, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
