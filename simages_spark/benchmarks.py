"""In-package scaling measurement, importable from a --py-files zip.

The north rule's run mode is `spark-submit --py-files simages_spark.zip`
on a multi-executor cluster at N and 4N executors. This sandbox has no
cluster, so the proxy (see bench_scaling.py) runs one pinned local[N]
JVM per level — but the DEPLOYMENT path should still be the real one:
the measurement lives here, inside the package, so a thin driver script
(tools/submit_scaling_driver.py) with no sys.path setup of its own can
be launched via `spark-submit --py-files dist/simages_spark.zip` and
resolve every import from the shipped zip, exactly as executors on a
real cluster would. `import_provenance()` records where the package was
actually imported from so the evidence is checkable, not asserted.

Reference parity: the reference is invoked as a console script/module
(`simages` CLI, setup.py entry_points); spark-submit --py-files is the
Spark-native equivalent of "pip-install then run" for cluster drivers.
"""

from __future__ import annotations

import time


def import_provenance() -> dict:
    """Where did this process import simages_spark from? Under
    `spark-submit --py-files simages_spark.zip` with a clean PYTHONPATH
    and a cwd outside the repo, `path` must point INSIDE the zip —
    proving the job is runnable from the shipped artifact alone."""
    import simages_spark

    path = simages_spark.__file__ or ""
    return {"path": path, "from_zip": ".zip/" in path or path.endswith(".zip")}


def measure_scaling(cores: int, n_docs: int, reps: int = 3) -> dict:
    """One scaling-level measurement: full dedup pipeline (signatures →
    candidates → verify → CC) on a deterministic synthetic corpus at
    local[cores], best-of-`reps` after a JIT warm-up pass.

    Kept importable (no argparse, no sys.path mutation) so both the
    plain-python orchestrator and the spark-submit driver share it.
    """
    from simages_spark.session import get_spark

    spark = get_spark(f"scaling_{cores}", cores=cores, shuffle_partitions=cores)
    try:
        return _measure_scaling_body(spark, cores, n_docs, reps)
    finally:
        # ALWAYS stop: a leaked session makes the next level's
        # getOrCreate silently return this local[N] JVM — master and
        # parallelism ignored, the "scaling" measurement quietly wrong
        spark.stop()


def _measure_scaling_body(spark, cores: int, n_docs: int, reps: int) -> dict:
    from simages_spark.config import DedupConfig
    from simages_spark.functions.signatures import compute_signatures
    from simages_spark.operators.connected_components import connected_components
    from simages_spark.pipeline import (
        build_candidates,
        build_edges,
        representative_docs,
    )
    from simages_spark.sources.corpus import generate_pages, mint_doc_ids

    cfg = DedupConfig()
    docs = (
        mint_doc_ids(generate_pages(spark, n_docs, seed=42, partitions=cores * 4))
        .select("doc_id", "text")
        .persist()
    )
    n = docs.count()  # materialize input so we time the pipeline, not gen

    # Warm-up pass on a small slice: the first execution of each operator
    # JIT-compiles Spark's large generated methods (~40-150s per fresh JVM
    # in this sandbox, independent of data size). A real cluster amortizes
    # this over hours-long jobs; timing it would measure the JIT, not the
    # pipeline.
    warm = docs.limit(5000).persist()
    warm.count()
    # mirror the timed loop's cfg.exact_first branch so the warmed plans
    # are the ones measured
    wsig = compute_signatures(
        representative_docs(warm) if cfg.exact_first else warm, cfg
    ).persist()
    wcand = build_candidates(warm, wsig, cfg).persist()
    wedges = build_edges(wcand, wsig, warm, cfg).persist()
    connected_components(wedges, cfg).count()
    for df in (wedges, wcand, wsig, warm):
        df.unpersist()

    # best-of-N: the sandbox VM has 5-15% CPU steal with large run-to-run
    # variance; min is the noise-robust "what the hardware can do" estimator
    all_reps = []
    for _ in range(reps):
        stages: dict[str, float] = {}
        t0 = time.time()

        t = time.time()
        sig = compute_signatures(
            representative_docs(docs) if cfg.exact_first else docs, cfg
        ).persist()
        sig.count()
        stages["signatures"] = round(time.time() - t, 2)

        t = time.time()
        cand = build_candidates(docs, sig, cfg).persist()
        n_cand = cand.count()
        stages["candidates"] = round(time.time() - t, 2)

        t = time.time()
        edges = build_edges(cand, sig, docs, cfg).persist()
        n_edges = edges.count()
        stages["verify"] = round(time.time() - t, 2)

        t = time.time()
        clusters = connected_components(edges, cfg)
        n_cluster_rows = clusters.count()
        stages["cc"] = round(time.time() - t, 2)

        elapsed = time.time() - t0
        all_reps.append(
            {
                "stages": stages,
                "elapsed_sec": round(elapsed, 2),
                "counts": (n_cand, n_edges, n_cluster_rows),
            }
        )
        for df in (edges, cand, sig):
            df.unpersist()

    assert len({r["counts"] for r in all_reps}) == 1, "nondeterministic output!"
    best = min(all_reps, key=lambda r: r["elapsed_sec"])
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
        "all_reps_sec": [r["elapsed_sec"] for r in all_reps],
        "import_provenance": import_provenance(),
    }
    return out
