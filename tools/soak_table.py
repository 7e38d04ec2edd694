"""SnapshotTable scale check: 1M rows across 10 append snapshots, then a
targeted delete (keys confined to one data group), an upsert, time
travel, and vacuum — asserting the rewrite-only-affected-groups behavior
that makes row-level deletes cheap at corpus scale (plus wall times).

Usage: python tools/soak_table.py [rows_per_group] [n_groups]
"""

from __future__ import annotations

import json
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from simages_spark.session import get_spark  # noqa: E402
from simages_spark.table import SnapshotTable  # noqa: E402

ROOT = "/tmp/soak_table"


def main() -> None:
    per = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("soak_table", cores=32)
    shutil.rmtree(ROOT, ignore_errors=True)
    t = SnapshotTable(spark, ROOT)

    t0 = time.time()
    for g in range(k):
        t.append(
            spark.range(g * per, (g + 1) * per).select(
                F.col("id").alias("doc_id"),
                F.sha2(F.col("id").cast("string"), 256).alias("text"),
            )
        )
    t_append = time.time() - t0
    total = per * k
    assert t.read().count() == total

    # delete 5k keys, all inside group 3's range
    keys = spark.range(3 * per, 3 * per + 5000).select(
        F.col("id").alias("doc_id")
    )
    groups_before = t.manifest(t.current_version())["data_groups"]
    t0 = time.time()
    t.delete_matching(keys, "doc_id")
    t_delete = time.time() - t0
    groups_after = t.manifest(t.current_version())["data_groups"]
    carried = len(set(groups_before) & set(groups_after))
    n_after = t.read().count()

    t0 = time.time()
    t.upsert(
        spark.range(0, 1000).select(
            F.col("id").alias("doc_id"), F.lit("patched").alias("text")
        ),
        key="doc_id",
    )
    t_upsert = time.time() - t0

    t0 = time.time()
    n_v0 = t.read(version=0).count()
    t_travel = time.time() - t0
    n_orphans = t.vacuum()

    print(json.dumps({
        "rows": total,
        "n_groups": k,
        "append_total_sec": round(t_append, 1),
        "delete_5k_sec": round(t_delete, 1),
        "groups_carried_by_reference": carried,
        "rows_after_delete": n_after,
        "upsert_1k_sec": round(t_upsert, 1),
        "time_travel_v0_rows": n_v0,
        "time_travel_sec": round(t_travel, 1),
        "vacuum_orphans": n_orphans,
        "versions": t.current_version() + 1,
        "delete_correct": n_after == total - 5000,
        "carried_correct": carried == k - 1,
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
