"""Scale soak for strip_duplicate_spans (substring dedup as text
surgery): the rewrite path must stay linear in corpus size — interval
merge + splice are per-doc expression folds, and the span set grows
with the planted duplicate groups, not quadratically.

Runs the full spans→strip pipeline at two corpus sizes on the same
generator and reports docs/sec at both plus the wall ratio vs the size
ratio (≈1 ⇒ linear). Usage: python tools/soak_strip.py [n_small]
[n_large] [cores]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from simages_spark.operators.suffix import strip_duplicate_spans  # noqa: E402
from simages_spark.session import get_spark  # noqa: E402
from simages_spark.sources.corpus import generate_pages, mint_doc_ids  # noqa: E402


def run_at(spark, n_docs: int, cores: int) -> dict:
    docs = (
        mint_doc_ids(generate_pages(spark, n_docs, seed=42, partitions=cores * 4))
        .select("doc_id", "text", "warc_ts")
        .persist()
    )
    docs.count()
    t0 = time.time()
    out = strip_duplicate_spans(docs, min_len=64)
    summary = out.agg(
        F.count("*").alias("docs"),
        F.sum("n_spans_removed").alias("spans"),
        F.sum("n_chars_removed").alias("chars"),
        F.sum(F.length("text")).alias("chars_kept"),
    ).collect()[0]
    dt = time.time() - t0
    docs.unpersist()
    return {
        "n_docs": n_docs,
        "sec": round(dt, 1),
        "docs_per_sec": round(n_docs / dt, 1),
        "spans_removed": int(summary["spans"]),
        "chars_removed": int(summary["chars"]),
        "chars_kept": int(summary["chars_kept"]),
    }


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    n_large = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    spark = get_spark("soak_strip", cores=cores, shuffle_partitions=cores * 2)

    # JIT/codegen warmup on a slice
    warm = mint_doc_ids(
        generate_pages(spark, 5000, seed=42, partitions=cores)
    ).select("doc_id", "text", "warc_ts")
    strip_duplicate_spans(warm, min_len=64).count()
    print("warm", flush=True)

    small = run_at(spark, n_small, cores)
    print(json.dumps(small), flush=True)
    large = run_at(spark, n_large, cores)
    print(json.dumps(large), flush=True)

    size_ratio = n_large / n_small
    wall_ratio = large["sec"] / small["sec"]
    print(json.dumps({
        "size_ratio": size_ratio,
        "wall_ratio": round(wall_ratio, 2),
        "linearity": round(wall_ratio / size_ratio, 2),
        "small": small,
        "large": large,
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
