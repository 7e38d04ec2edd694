"""Viral-bucket soak — evidence that LSH pair expansion is ABSOLUTELY
bounded under identical-content floods.

Scenario: a viral page (same text) is crawled from `n_viral` distinct
URLs — at web scale this happens to error pages, consent banners, and
syndicated articles at 10^5-10^6 copies. Every copy lands in the same
LSH bucket in all 16 bands; without a hard cap the bucket expands to
C(n, 2) pairs (5·10^9 at 10^5 copies) and the salt split alone only
divides that by nsalt.

With the per-salt-class truncation in `operators/buckets.py` the worst
bucket emits at most nsalt * C(cap, 2) pairs regardless of n. The flood
keeps FULL dedup connectivity through the exact-hash star layer (linear
edges), so final clusters are unaffected — asserted here.

Usage: python tools/soak_viral_bucket.py [n_viral] [n_background] [cores]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from simages_spark.config import DedupConfig  # noqa: E402
from simages_spark.functions.signatures import compute_signatures  # noqa: E402
from simages_spark.operators.connected_components import connected_components  # noqa: E402
from simages_spark.operators.exact import exact_dup_edges  # noqa: E402
from simages_spark.operators.lsh import candidate_pairs, lsh_metrics  # noqa: E402
from simages_spark.session import get_spark  # noqa: E402
from simages_spark.sources.corpus import generate_pages, mint_doc_ids  # noqa: E402


def main():
    n_viral = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_bg = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    spark = get_spark("soak_viral", cores=cores, shuffle_partitions=cores * 2)
    cfg = DedupConfig()

    bg = mint_doc_ids(
        generate_pages(spark, n_bg, seed=42, partitions=cores * 4)
    ).select("doc_id", "text")
    viral_text = (
        "this exact page went viral and was crawled from many urls "
        "cookie consent accept decline privacy policy terms of service"
    )
    viral = spark.range(n_viral).select(
        (F.col("id") + 10_000_000_000).alias("doc_id"), F.lit(viral_text).alias("text")
    )
    docs = bg.unionByName(viral).repartition(cores * 4).persist()
    n = docs.count()
    print(f"corpus: {n:,} docs ({n_viral:,} viral copies)", flush=True)

    sig = compute_signatures(docs, cfg).persist()
    t0 = time.time()
    sig.count()
    print(f"signatures: {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    n_pairs = candidate_pairs(sig, cfg).count()
    dt = time.time() - t0
    bound = 16 * cfg.bucket_salt * cfg.max_bucket_size * (cfg.max_bucket_size - 1) // 2
    quad = n_viral * (n_viral - 1) // 2
    print(
        f"lsh_candidates: {dt:.1f}s, {n_pairs:,} pairs "
        f"(unbounded flood would add ~{quad:,}; 16-band worst-case bound "
        f"for the flood is {bound:,})",
        flush=True,
    )
    m = lsh_metrics(sig, cfg).collect()[0].asDict()
    print("lsh_metrics:", m, flush=True)
    assert m["n_truncated_buckets"] > 0, "flood should trip the truncation metric"

    # connectivity is owned by the exact-hash star layer: the flood must
    # still collapse to ONE cluster of size n_viral.
    edges = candidate_pairs(sig, cfg).unionByName(
        exact_dup_edges(docs).select("src", "dst")
    ).dropDuplicates(["src", "dst"])
    t0 = time.time()
    clusters = connected_components(edges.withColumn("jaccard", F.lit(1.0)), cfg)
    viral_cluster_sizes = (
        clusters.where(
            (F.col("doc_id") >= 10_000_000_000)
            & (F.col("doc_id") < 10_000_000_000 + n_viral)
        )
        .groupBy("cluster_id")
        .count()
        .collect()
    )
    print(f"cc: {time.time() - t0:.1f}s", flush=True)
    assert len(viral_cluster_sizes) == 1 and viral_cluster_sizes[0]["count"] == n_viral, (
        f"viral flood must stay one cluster: {viral_cluster_sizes[:5]}"
    )
    print(
        f"OK: flood of {n_viral:,} -> 1 cluster of {n_viral:,}; "
        f"candidate stage bounded at {n_pairs:,} pairs in {dt:.1f}s",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
