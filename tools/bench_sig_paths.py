"""Micro-benchmark: shingle-hash + signature stage, JVM-expression path
vs all-Python (hashlib) path — identical output required.

The JVM path (shingle_hash_col) uses higher-order array functions
(transform/slice/concat_ws/conv) that Spark interprets per element —
no whole-stage codegen — so "JVM-side" is not automatically fast here.

Usage: python tools/bench_sig_paths.py [n_docs] [cores]
"""

from __future__ import annotations

import sys
import time
from typing import Iterator

sys.path.insert(0, "/root/repo")

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from simages_spark.config import DedupConfig  # noqa: E402
from simages_spark.functions.shingles import shingle_hash_col  # noqa: E402
from simages_spark.functions.signatures import (  # noqa: E402
    SIGNATURE_SCHEMA,
    compute_signatures,
    perm_params,
    signatures_pdf,
)
from simages_spark.session import get_spark  # noqa: E402
from simages_spark.sources.corpus import generate_pages, mint_doc_ids  # noqa: E402


def compute_signatures_jvm(df, cfg: DedupConfig):
    """The rejected design: shingle+md5 hashing as JVM column expressions
    (higher-order functions — interpreted per element, no codegen), with
    the UDF doing only the MinHash/SimHash math."""
    a, b = perm_params(cfg.num_perm, cfg.seed)

    hashed = (
        df.select(
            "doc_id", shingle_hash_col(F.col("text"), cfg.shingle_size).alias("sh")
        )
        .withColumn("num_shingles_raw", F.size("sh"))
        .withColumn("shingle_hashes", F.slice("sh", 1, cfg.max_shingles_per_doc))
        .select("doc_id", "num_shingles_raw", "shingle_hashes")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield signatures_pdf(pdf, cfg, a, b)

    return hashed.mapInPandas(run, schema=SIGNATURE_SCHEMA)


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark("bench_sig", cores=cores, shuffle_partitions=cores)
    cfg = DedupConfig()
    docs = (
        mint_doc_ids(generate_pages(spark, n_docs, seed=42, partitions=cores * 4))
        .select("doc_id", "text")
        .persist()
    )
    docs.count()

    # warmup both paths
    compute_signatures_jvm(docs.limit(2000), cfg).count()
    compute_signatures(docs.limit(2000), cfg).count()

    for label, fn in [
        ("jvm_md5", compute_signatures_jvm),
        ("python_hashlib", compute_signatures),
        ("jvm_md5_2", compute_signatures_jvm),
        ("python_hashlib_2", compute_signatures),
    ]:
        t0 = time.time()
        n = fn(docs, cfg).count()
        print(f"{label:18s} {time.time() - t0:7.1f}s  rows={n}", flush=True)

    # equality check on a sample
    a = compute_signatures_jvm(docs.limit(3000), cfg).orderBy("doc_id").toPandas()
    b = compute_signatures(docs.limit(3000), cfg).orderBy("doc_id").toPandas()
    same = (
        a["simhash"].equals(b["simhash"])
        and a["num_shingles"].equals(b["num_shingles"])
        and a["num_shingles_raw"].equals(b["num_shingles_raw"])
        and all(list(x) == list(y) for x, y in zip(a["minhash"], b["minhash"]))
        and all(list(x) == list(y) for x, y in zip(a["shingle_hashes"], b["shingle_hashes"]))
    )
    print("identical_outputs:", same, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
