"""Scale soak for the composed curation assembly line: production-shaped
inputs (pipeline clusters from find_duplicates, a benchmark suite built
from a held-out slice), 1M docs end-to-end.

What the numbers must show: the composition costs ~the sum of its parts
(each stage is an already-soaked operator; the glue is key-only
semi/anti joins), and the stage drops are individually attributable.

Usage: python tools/soak_curate.py [n_docs] [cores]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from simages_spark.config import DedupConfig  # noqa: E402
from simages_spark.operators.curation import curation_stages  # noqa: E402
from simages_spark.pipeline import find_duplicates  # noqa: E402
from simages_spark.session import get_spark  # noqa: E402
from simages_spark.sources.corpus import generate_pages, mint_doc_ids  # noqa: E402


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark("soak_curate", cores=cores, shuffle_partitions=cores * 2)
    cfg = DedupConfig()

    pages = mint_doc_ids(
        generate_pages(spark, n_docs, seed=42, partitions=cores * 4)
    ).select("doc_id", "text", "lang").persist()
    pages.count()
    # benchmark: a deterministic held-out slice (every 997th doc's text,
    # re-keyed) — the corpus is everything else, so planted contamination
    # is REAL shared text, not synthetic overlap
    corpus = pages.where(F.col("doc_id") % 997 != 0).persist()
    benchmark = (
        pages.where(F.col("doc_id") % 997 == 0)
        .select((F.col("doc_id") + 1).alias("doc_id"), "text")
        .persist()
    )
    n_corpus, n_bench = corpus.count(), benchmark.count()

    t0 = time.time()
    clusters = find_duplicates(corpus, cfg).clusters.persist()
    n_cluster_rows = clusters.count()
    t_dedup = time.time() - t0

    t0 = time.time()
    stages = curation_stages(
        corpus,
        benchmark,
        clusters,
        k=cfg.shingle_size,
        max_shingles=cfg.max_shingles_per_doc,
    )
    counts = {
        "dedup_losers": stages["dedup_losers"].count(),
        "quality_kept": stages["quality_kept"].count(),
        "contaminated": stages["contaminated"].count(),
    }
    summary = stages["curated"].agg(
        F.count("*").alias("docs"),
        F.sum("n_chars_curated").alias("chars"),
    ).collect()[0]
    t_curate = time.time() - t0

    print(json.dumps({
        "n_docs": n_docs,
        "n_corpus": n_corpus,
        "n_benchmark": n_bench,
        "cluster_rows": n_cluster_rows,
        "find_duplicates_sec": round(t_dedup, 1),
        "curate_sec": round(t_curate, 1),
        "curate_docs_per_sec": round(n_corpus / t_curate, 1),
        **counts,
        "curated_docs": summary["docs"],
        "curated_chars": int(summary["chars"] or 0),
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
