"""IVF recall-vs-nprobe: lowest-id codebook vs trained k-means codebook
(round-3 verdict "missing" item 1 — the claim "embedding-space dedup"
needs measured recall with a trained quantizer, not just a deterministic
one).

Ground truth is exact brute-force kNN (`knn_bruteforce`). recall@k =
|ivf_knn ∩ truth| / |truth| over all queries, for each (codebook,
nprobe). Runs on the driver-generated embeddings table (64-dim,
labeled clusters).

Usage: python tools/bench_ivf_recall.py [sf_dir] [n_cells] [k]
Writes BENCH/ivf_recall.json.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from simages_spark.operators.ivf import (  # noqa: E402
    ivf_centroids,
    ivf_centroids_trained,
    ivf_knn,
    ivf_metrics,
    knn_bruteforce,
)
from simages_spark.session import get_spark  # noqa: E402


def _recall(spark, approx, truth) -> float:
    hit = approx.select("q_id", "vec_id").intersect(
        truth.select("q_id", "vec_id")
    )
    return hit.count() / truth.count()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_cells = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark("bench_ivf_recall", cores=32)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").persist()
    n = emb.count()
    queries = emb  # all-vectors-as-queries: the dedup workload shape

    truth = knn_bruteforce(queries, emb, k=k).persist()
    truth.count()

    t0 = time.time()
    cb_naive = ivf_centroids(emb, n_cells)
    t_naive = time.time() - t0
    t0 = time.time()
    cb_kmeans = ivf_centroids_trained(emb, n_cells, n_iters=8)
    t_kmeans = time.time() - t0

    out = {
        "sf_dir": sf_dir,
        "n_vectors": n,
        "n_cells": n_cells,
        "k": k,
        "train_sec_naive": round(t_naive, 2),
        "train_sec_kmeans": round(t_kmeans, 2),
        "recall": {},
        "balance": {},
    }
    for name, cb in (("lowest_id", cb_naive), ("kmeans", cb_kmeans)):
        m = ivf_metrics(emb, n_cells, nprobe=1, centroids=cb).collect()[0]
        out["balance"][name] = {
            "max_cell_n": m["max_cell_n"],
            "avg_cell_n": float(m["avg_cell_n"]),
            "candidate_pairs_upper_bound": m["candidate_pairs_upper_bound"],
        }
        for nprobe in (1, 2, 4, 8):
            approx = ivf_knn(
                queries, emb, k=k, n_cells=n_cells, nprobe=nprobe, centroids=cb
            )
            out["recall"][f"{name}@nprobe={nprobe}"] = round(
                _recall(spark, approx, truth), 4
            )
    print(json.dumps(out, indent=2))
    with open("/root/repo/BENCH/ivf_recall.json", "w") as f:
        json.dump(out, f, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
