"""Profile the candidate stage at large N — evidence for VERDICT round-1
item #3 (candidates superlinearity at 1M docs).

Times each candidate source SEPARATELY (LSH banding / SimHash Hamming /
exact hash / union+dedup), plus verify and CC, and prints the LSH and
SimHash bucket-size histograms so a hot-key blowup is visible rather
than guessed.

Usage: python tools/profile_1m.py [n_docs] [cores]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from simages_spark.config import DedupConfig  # noqa: E402
from simages_spark.functions.signatures import (  # noqa: E402
    compute_signatures,
    signature_metrics,
)
from simages_spark.operators.connected_components import connected_components  # noqa: E402
from simages_spark.operators.exact import exact_dup_edges  # noqa: E402
from simages_spark.operators.lsh import band_keys, candidate_pairs  # noqa: E402
from simages_spark.operators.simhash_join import simhash_candidates, simhash_keys  # noqa: E402
from simages_spark.operators.verify import verify_pairs  # noqa: E402
from simages_spark.session import get_spark  # noqa: E402
from simages_spark.sources.corpus import generate_pages, mint_doc_ids  # noqa: E402


def hist(df, key_cols, label):
    sizes = df.groupBy(*key_cols).agg(F.count("*").alias("n"))
    rows = (
        sizes.select(
            F.when(F.col("n") == 1, "1")
            .when(F.col("n") <= 4, "2-4")
            .when(F.col("n") <= 16, "5-16")
            .when(F.col("n") <= 64, "17-64")
            .when(F.col("n") <= 256, "65-256")
            .otherwise(">256")
            .alias("bucket_size"),
        )
        .groupBy("bucket_size")
        .count()
        .collect()
    )
    top = sizes.orderBy(F.col("n").desc()).limit(5).collect()
    print(label, json.dumps({r["bucket_size"]: r["count"] for r in rows}),
          "top:", [r["n"] for r in top], flush=True)


def t(label, fn):
    t0 = time.time()
    out = fn()
    print(f"{label:28s} {time.time() - t0:8.1f}s  -> {out}", flush=True)
    return out


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark("profile_1m", cores=cores, shuffle_partitions=cores * 2)
    cfg = DedupConfig()

    from simages_spark.pipeline import representative_docs  # noqa: E402

    docs = (
        mint_doc_ids(generate_pages(spark, n_docs, seed=42, partitions=cores * 4))
        .select("doc_id", "text")
        .persist()
    )
    t("generate+persist", docs.count)

    # warm-up
    warm = docs.limit(5000)
    connected_components(
        verify_pairs(
            candidate_pairs(compute_signatures(warm, cfg), cfg),
            compute_signatures(warm, cfg),
            cfg,
        ),
        cfg,
    ).count()
    print("warmup done", flush=True)

    # production path (cfg.exact_first): signatures over representatives
    reps = representative_docs(docs).persist()
    t("representatives", reps.count)
    sig = compute_signatures(reps, cfg).persist()
    t("signatures", sig.count)
    print("sig_metrics:", signature_metrics(sig).collect()[0].asDict(), flush=True)

    hist(band_keys(sig, cfg), ["band", "band_key"], "lsh_bucket_hist:")
    hist(simhash_keys(sig, cfg).select("key"), ["key"], "simhash_bucket_hist:")

    lsh = candidate_pairs(sig, cfg).persist()
    t("lsh_candidates", lsh.count)
    sim = simhash_candidates(sig, cfg).select("src", "dst").persist()
    t("simhash_candidates", sim.count)
    ex = exact_dup_edges(docs).select("src", "dst").persist()
    t("exact_star_edges", ex.count)
    cand = lsh.unionByName(sim).dropDuplicates(["src", "dst"]).persist()
    t("union_dedup", cand.count)
    edges = (
        verify_pairs(cand, sig, cfg)
        .unionByName(ex.withColumn("jaccard", F.lit(1.0)))
        .persist()
    )
    t("verify+stars", edges.count)
    t("cc", lambda: connected_components(edges, cfg).count())

    # true end-to-end (fresh lazy chain, nothing reused but the docs cache)
    for df in (reps, sig, lsh, sim, ex, cand, edges):
        df.unpersist()
    from simages_spark.pipeline import find_duplicates

    t0 = time.time()
    r = find_duplicates(docs, cfg)
    n_cl = r.clusters.count()
    dt = time.time() - t0
    print(
        f"{'e2e find_duplicates':28s} {dt:8.1f}s  -> {n_cl} cluster rows, "
        f"{n_docs / dt:,.0f} docs/sec",
        flush=True,
    )

    spark.stop()


if __name__ == "__main__":
    main()
