"""Merge-on-read delete soak (round-4 verdict item 5 done-criterion):
small policy deletes on a big table must cost ~O(deleted keys), not
O(affected data). Builds the same table twice, takes K successive small
deletes through the copy-on-write path on one and the merge-on-read path
on the other, and reports per-delete wall for both plus read-path
equivalence and the fold/vacuum lifecycle.

Usage: python tools/soak_mor_delete.py [rows_per_group] [n_groups] [n_deletes]
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

ROOT = "/tmp/soak_mor"


def build(spark, root: str, rows: int, groups: int) -> SnapshotTable:
    shutil.rmtree(root, ignore_errors=True)
    t = SnapshotTable(spark, root)
    for g in range(groups):
        df = spark.range(g * rows, (g + 1) * rows).select(
            F.col("id").alias("doc_id"),
            F.sha2(F.col("id").cast("string"), 256).alias("text"),
        )
        t.append(df)
    return t


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    groups = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_del = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    spark = get_spark("soak_mor_delete", cores=32)

    t_cow = build(spark, f"{ROOT}/cow", rows, groups)
    t_mor = build(spark, f"{ROOT}/mor", rows, groups)
    total = rows * groups

    deleted: list[int] = []
    for i in range(n_del):
        # 100 keys spread across ALL groups — the worst case for
        # copy-on-write (every group affected), the normal case for a
        # policy delete
        keys = [i * 1000 + j * rows for j in range(groups)] + [
            i * 1000 + 7 + j * rows for j in range(groups)
        ]
        deleted.extend(keys)
        kdf = spark.createDataFrame([(k,) for k in keys], "doc_id long")
        t0 = time.time()
        t_cow.delete_matching(kdf, "doc_id")
        cow_s = time.time() - t0
        t0 = time.time()
        t_mor.delete_matching(kdf, "doc_id", merge_on_read=True)
        mor_s = time.time() - t0
        print(json.dumps({
            "delete": i, "keys": len(keys),
            "cow_sec": round(cow_s, 2), "mor_sec": round(mor_s, 2),
        }), flush=True)

    n_cow = t_cow.read().count()
    n_mor = t_mor.read().count()
    diff = (
        t_cow.read().exceptAll(t_mor.read()).count()
        + t_mor.read().exceptAll(t_cow.read()).count()
    )
    t0 = time.time()
    fold = t_mor.apply_deletes()
    fold_s = time.time() - t0
    n_after_fold = t_mor.read().count()
    t_mor.expire_snapshots(keep_last=1)
    reclaimed = t_mor.vacuum(min_age_s=0)
    print(json.dumps({
        "total_rows": total,
        "deleted_keys": len(deleted),
        "rows_cow": n_cow,
        "rows_mor": n_mor,
        "row_diff_cow_vs_mor": diff,
        "fold": fold,
        "fold_sec": round(fold_s, 2),
        "rows_after_fold": n_after_fold,
        "vacuum_reclaimed_groups": reclaimed,
        "equivalent": diff == 0 and n_cow == n_mor == n_after_fold
        == total - len(deleted),
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
