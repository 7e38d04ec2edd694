"""Probe-listing soak: evidence that compaction bounds the per-probe
cost of a long-running crawl (round-3 verdict "missing" item 2).

Builds a store by running MANY small streaming micro-batches (the
pathological long-crawl layout: one batch_id partition each), then
times the same probe batch against (a) the raw many-partition store and
(b) the compacted store — interleaved best-of-R, because this sandbox
has multi-second CPU-steal bursts (BENCH/BASELINE.md).

Usage: python tools/soak_compaction.py [n_batches] [docs_per_batch] [rounds]
"""

from __future__ import annotations

import json
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from simages_spark.config import DedupConfig  # noqa: E402
from simages_spark.maintenance import (  # noqa: E402
    compact_probe_index,
    compact_signature_store,
    list_batch_partitions,
)
from simages_spark.operators.incremental import incremental_dedup_edges  # noqa: E402
from simages_spark.session import get_spark  # noqa: E402
from simages_spark.sources.corpus import generate_pages, mint_doc_ids  # noqa: E402
from simages_spark.streaming import process_near_dedup_batch  # noqa: E402

ROOT = "/tmp/soak_compaction"


def _probe_once(spark, cfg, batch, sig_dir, idx_dir) -> tuple[float, int]:
    t0 = time.time()
    edges = incremental_dedup_edges(
        batch,
        spark.read.parquet(sig_dir),
        cfg,
        existing_index=spark.read.parquet(idx_dir),
    )
    n = edges.count()
    return time.time() - t0, n


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    per = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark("soak_compaction", cores=32)
    cfg = DedupConfig()
    shutil.rmtree(ROOT, ignore_errors=True)
    raw, cpt = f"{ROOT}/raw", f"{ROOT}/cpt"

    total = n_batches * per
    docs = mint_doc_ids(generate_pages(spark, total, seed=7)).select(
        "doc_id", "text"
    )
    t0 = time.time()
    for b in range(n_batches):
        batch = docs.where((F.col("doc_id") % n_batches + n_batches) % n_batches == b)
        process_near_dedup_batch(
            batch, b, f"{raw}/sig", f"{raw}/idx", f"{raw}/edges", cfg
        )
    print(json.dumps({"build_batches": n_batches, "docs": total,
                      "build_sec": round(time.time() - t0, 1)}), flush=True)

    shutil.copytree(raw, cpt)
    t0 = time.time()
    ci = compact_probe_index(spark, f"{cpt}/idx")
    cs = compact_signature_store(spark, f"{cpt}/sig")
    print(json.dumps({"compaction_sec": round(time.time() - t0, 1),
                      "idx": ci, "sig": cs}), flush=True)

    # half re-crawled store docs (must match), half fresh (must not)
    fresh = mint_doc_ids(generate_pages(spark, per // 2, seed=99)).select(
        "doc_id", "text"
    )
    recrawl = docs.orderBy("doc_id").limit(per // 2)
    probe = (
        fresh.unionByName(recrawl)
        .withColumn("doc_id", F.col("doc_id") + 10_000_000)
    )
    probe = spark.createDataFrame(probe.collect(), probe.schema)  # freeze

    raw_ts, cpt_ts, edge_counts = [], [], set()
    for _ in range(rounds):  # interleaved best-of-R (steal variance)
        t, n = _probe_once(spark, cfg, probe, f"{raw}/sig", f"{raw}/idx")
        raw_ts.append(t)
        edge_counts.add(n)
        t, n = _probe_once(spark, cfg, probe, f"{cpt}/sig", f"{cpt}/idx")
        cpt_ts.append(t)
        edge_counts.add(n)
    assert len(edge_counts) == 1, f"probe results diverged: {edge_counts}"

    print(json.dumps({
        "store_docs": total,
        "raw_partitions": len(list_batch_partitions(spark, f"{raw}/idx")),
        "cpt_partitions": len(list_batch_partitions(spark, f"{cpt}/idx")),
        "probe_edges": edge_counts.pop(),
        "probe_raw_best_sec": round(min(raw_ts), 2),
        "probe_compacted_best_sec": round(min(cpt_ts), 2),
        "speedup": round(min(raw_ts) / min(cpt_ts), 2),
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
