"""Scaling-efficiency evidence: same e2e dedup job at local[8] vs local[32].

Sandbox proxy for the north rule's N vs 4N executor criterion (no real
cluster available): one JVM per parallelism level (fresh subprocess), same
deterministic synthetic corpus, throughput reported at both levels plus
efficiency = tput@4N / (4 × tput@N). Results land in BENCH/BASELINE.md.

Usage:
  python bench_scaling.py                 # orchestrates both levels
  python bench_scaling.py --cores 8      # single measurement (internal)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_DOCS = int(os.environ.get("SCALING_N_DOCS", "300000"))


def measure(cores: int) -> dict:
    from simages_spark.config import DedupConfig
    from simages_spark.functions.signatures import compute_signatures
    from simages_spark.operators.connected_components import connected_components
    from simages_spark.pipeline import build_candidates
    from simages_spark.operators.verify import verify_pairs
    from simages_spark.session import get_spark
    from simages_spark.sources.corpus import generate_pages, mint_doc_ids

    spark = get_spark(f"scaling_{cores}", cores=cores, shuffle_partitions=cores)
    cfg = DedupConfig()
    docs = (
        mint_doc_ids(generate_pages(spark, N_DOCS, seed=42, partitions=cores * 4))
        .select("doc_id", "text")
        .persist()
    )
    n = docs.count()  # materialize input so we time the pipeline, not gen

    # Warm-up pass on a small slice: the first execution of each operator
    # JIT-compiles Spark's large generated methods (~40-150s per fresh JVM
    # in this sandbox, independent of data size). A real cluster amortizes
    # this over hours-long jobs; timing it here would measure the JIT, not
    # the pipeline.
    warm = docs.limit(5000).persist()
    warm.count()
    wsig = compute_signatures(warm, cfg).persist()
    wcand = build_candidates(warm, wsig, cfg).persist()
    wedges = verify_pairs(wcand, wsig, cfg).persist()
    connected_components(wedges, cfg).count()
    for df in (wedges, wcand, wsig, warm):
        df.unpersist()

    # 3 repetitions, best-of taken per run: the sandbox VM has 5-15% CPU
    # steal with large run-to-run variance; min is the standard
    # noise-robust estimator for "what the hardware can do".
    reps = []
    for _ in range(3):
        stages: dict[str, float] = {}
        t0 = time.time()

        t = time.time()
        sig = compute_signatures(docs, cfg).persist()
        sig.count()
        stages["signatures"] = round(time.time() - t, 2)

        t = time.time()
        cand = build_candidates(docs, sig, cfg).persist()
        n_cand = cand.count()
        stages["candidates"] = round(time.time() - t, 2)

        t = time.time()
        edges = verify_pairs(cand, sig, cfg).persist()
        n_edges = edges.count()
        stages["verify"] = round(time.time() - t, 2)

        t = time.time()
        clusters = connected_components(edges, cfg)
        n_cluster_rows = clusters.count()
        stages["cc"] = round(time.time() - t, 2)

        elapsed = time.time() - t0
        reps.append(
            {
                "stages": stages,
                "elapsed_sec": round(elapsed, 2),
                "counts": (n_cand, n_edges, n_cluster_rows),
            }
        )
        for df in (edges, cand, sig):
            df.unpersist()

    assert len({r["counts"] for r in reps}) == 1, "nondeterministic output!"
    best = min(reps, key=lambda r: r["elapsed_sec"])
    n_cand, n_edges, n_cluster_rows = best["counts"]
    out = {
        "cores": cores,
        "n_docs": n,
        "n_candidates": n_cand,
        "n_edges": n_edges,
        "n_cluster_rows": n_cluster_rows,
        "stages": best["stages"],
        "elapsed_sec": best["elapsed_sec"],
        "docs_per_sec": round(n / best["elapsed_sec"], 2),
        "all_reps_sec": [r["elapsed_sec"] for r in reps],
    }
    spark.stop()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()
    if args.cores:
        print("RESULT " + json.dumps(measure(args.cores)))
        return

    results = {}
    for cores in (8, 32):
        # taskset pins the whole JVM (GC, shuffle, python workers) to N
        # CPUs — otherwise local[8] borrows all 32 machine cores for its
        # auxiliary thread pools and the comparison under-reports scaling
        cmd = [sys.executable, __file__, "--cores", str(cores)]
        if os.path.exists("/usr/bin/taskset"):
            cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
        proc = subprocess.run(
            cmd,
            capture_output=True,
            text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT ")]
        if not line:
            print(proc.stdout[-3000:], proc.stderr[-3000:])
            raise SystemExit(f"measurement at cores={cores} failed")
        results[cores] = json.loads(line[-1][len("RESULT "):])
        print(f"local[{cores}]: {results[cores]}")

    t8, t32 = results[8]["docs_per_sec"], results[32]["docs_per_sec"]
    eff = t32 / (4 * t8)
    summary = {
        "n_docs": N_DOCS,
        "throughput_local8_docs_per_sec": t8,
        "throughput_local32_docs_per_sec": t32,
        "scaling_efficiency_8_to_32": round(eff, 3),
        "clusters_equal_across_levels": results[8]["n_cluster_rows"]
        == results[32]["n_cluster_rows"],
    }
    print(json.dumps(summary))
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/scaling.json", "w") as f:
        json.dump({"runs": results, "summary": summary}, f, indent=2)


if __name__ == "__main__":
    main()
