"""Bucketed-signatures verify experiment: can the corpus-sized side of
the verify join skip its shuffle entirely?

At 100 TB the verify join's dominant cost is shuffling the signatures
table (corpus-sized, carries shingle arrays) into the join partitioning
— TWICE (src side, dst side). If the signatures checkpoint is written
BUCKETED by doc_id, a bucketed scan already satisfies the join's
required distribution: only the (small) candidates side shuffles.

This script writes the same 1M-doc signature table plain and bucketed,
runs the identical verify join against both, and reports (a) the number
of Exchange operators in each physical plan and (b) wall-clock.

Usage: python tools/bench_bucketed_verify.py [n_docs] [cores]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from simages_spark.config import DedupConfig  # noqa: E402
from simages_spark.functions.signatures import compute_signatures  # noqa: E402
from simages_spark.operators.lsh import candidate_pairs  # noqa: E402
from simages_spark.operators.verify import verify_pairs  # noqa: E402
from simages_spark.pipeline import representative_docs  # noqa: E402
from simages_spark.session import get_spark  # noqa: E402
from simages_spark.sources.corpus import generate_pages, mint_doc_ids  # noqa: E402

N_BUCKETS = 64


def n_exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange ")


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark(
        "bucketed_verify", cores=cores, shuffle_partitions=N_BUCKETS
    )
    # bucketed-scan join reuse needs the bucket count to match the join's
    # expected partitioning; disable AQE partition coalescing so the
    # comparison is clean (at cluster scale you align these knobs anyway)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    cfg = DedupConfig()

    docs = (
        mint_doc_ids(generate_pages(spark, n_docs, seed=42, partitions=cores * 4))
        .select("doc_id", "text")
        .persist()
    )
    docs.count()
    sig = compute_signatures(representative_docs(docs), cfg)

    spark.sql("DROP TABLE IF EXISTS sig_bucketed")
    t0 = time.time()
    (
        sig.write.bucketBy(N_BUCKETS, "doc_id")
        .sortBy("doc_id")
        .mode("overwrite")
        .saveAsTable("sig_bucketed")
    )
    print(f"write bucketed: {time.time() - t0:.1f}s", flush=True)
    spark.sql("DROP TABLE IF EXISTS sig_plain")
    t0 = time.time()
    sig.write.mode("overwrite").saveAsTable("sig_plain")
    print(f"write plain:    {time.time() - t0:.1f}s", flush=True)

    cand = candidate_pairs(spark.table("sig_plain"), cfg).persist()
    n_cand = cand.count()
    print(f"candidates: {n_cand}", flush=True)

    results = {}
    for name in ("sig_plain", "sig_bucketed"):
        stored = spark.table(name)
        edges = verify_pairs(cand, stored, cfg)
        ex = n_exchanges(edges)
        reps = []
        for _ in range(3):
            t0 = time.time()
            n = verify_pairs(cand, stored, cfg).count()
            reps.append(round(time.time() - t0, 2))
        results[name] = (n, ex, min(reps), reps)
        print(
            f"{name:13s} edges={n} exchanges={ex} best={min(reps)}s reps={reps}",
            flush=True,
        )

    n_plain, ex_plain = results["sig_plain"][:2]
    n_bucket, ex_bucket = results["sig_bucketed"][:2]
    assert n_plain == n_bucket, "edge counts must match"
    print(
        f"SUMMARY: exchanges {ex_plain} -> {ex_bucket} "
        f"(signatures-side shuffles eliminated: {ex_plain - ex_bucket}); "
        f"verify best {results['sig_plain'][2]}s -> {results['sig_bucketed'][2]}s",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
