"""A/B the table-backed crawl loop against the dir-backed one: same
deterministic corpus, same batch split, both maintained incrementally —
edge sets must be IDENTICAL (the table layer changes the commit
protocol, not the math), and the per-batch cost of committing three
atomic table versions must stay in the same band as the dir path's
partition-overwrite writes (the manifest work is O(groups), not O(rows)).

Mid-loop, the table path runs SnapshotTable.compact() on all three
stores (the availableNow maintenance slot) — later batches must probe
identically off the folded groups, and the batch_id stats prune
degrades conservatively (folded group spans batches, kept not wrongly
pruned).

Interleaved A/B per batch index (dir b, table b, dir b+1, ...) so the
sandbox's CPU-steal bursts hit both paths alike (BENCH/BASELINE.md
round-2 methodology).

Usage: python tools/soak_crawl_tables.py [total_docs] [n_batches]
"""

from __future__ import annotations

import json
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from simages_spark.config import DedupConfig  # noqa: E402
from simages_spark.session import get_spark  # noqa: E402
from simages_spark.sources.corpus import generate_pages, mint_doc_ids  # noqa: E402
from simages_spark.streaming import (  # noqa: E402
    process_near_dedup_batch,
    process_near_dedup_batch_tables,
)
from simages_spark.table import SnapshotTable  # noqa: E402

ROOT = "/tmp/soak_crawl_tables"


def main() -> None:
    total = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark("soak_crawl_tables", cores=32)
    cfg = DedupConfig()
    shutil.rmtree(ROOT, ignore_errors=True)
    dir_root = f"{ROOT}/dirs"
    tbl_root = f"{ROOT}/tables"

    docs = mint_doc_ids(generate_pages(spark, total, seed=42)).select(
        "doc_id", "text"
    )
    per_batch_dir, per_batch_tbl = [], []
    t_compact = None
    for b in range(k):
        batch = docs.where((F.col("doc_id") % k + k) % k == b)

        t0 = time.time()
        process_near_dedup_batch(
            batch,
            b,
            f"{dir_root}/sig",
            f"{dir_root}/idx",
            f"{dir_root}/edges",
            cfg,
            include_within_batch=True,
        )
        per_batch_dir.append(round(time.time() - t0, 2))

        t0 = time.time()
        process_near_dedup_batch_tables(
            batch, b, tbl_root, cfg, include_within_batch=True
        )
        per_batch_tbl.append(round(time.time() - t0, 2))
        print(
            json.dumps(
                {"batch": b, "dir_sec": per_batch_dir[-1], "tbl_sec": per_batch_tbl[-1]}
            ),
            flush=True,
        )

        if b == k // 2:
            t0 = time.time()
            folded = {
                n: SnapshotTable(spark, f"{tbl_root}/{n}").compact(
                    target_rows=50_000_000
                )
                for n in ("sig_table", "idx_table", "edges_table")
            }
            t_compact = round(time.time() - t0, 1)
            print(
                json.dumps({"table_compaction_sec": t_compact, "folded": folded}),
                flush=True,
            )

    dir_edges = spark.read.parquet(f"{dir_root}/edges").select("src", "dst")
    tbl_edges = (
        SnapshotTable(spark, f"{tbl_root}/edges_table").read().select("src", "dst")
    )
    n_dir = dir_edges.count()
    n_tbl = tbl_edges.count()
    n_diff = dir_edges.exceptAll(tbl_edges).count() + tbl_edges.exceptAll(
        dir_edges
    ).count()
    sig_t = SnapshotTable(spark, f"{tbl_root}/sig_table")
    print(
        json.dumps(
            {
                "n_docs": total,
                "n_batches": k,
                "edges_dir": n_dir,
                "edges_table": n_tbl,
                "edge_set_diff": n_diff,
                "loop_sec_dir": round(sum(per_batch_dir), 1),
                "loop_sec_table": round(sum(per_batch_tbl), 1),
                "table_compaction_sec": t_compact,
                "per_batch_dir": per_batch_dir,
                "per_batch_table": per_batch_tbl,
                "sig_table_versions": len(sig_t.versions()),
                "sig_table_groups": len(
                    sig_t.manifest(sig_t.current_version())["data_groups"]
                ),
            }
        ),
        flush=True,
    )
    assert n_diff == 0, "edge sets diverged"
    spark.stop()


if __name__ == "__main__":
    main()
