"""Sort-order rewrite at scale: 100 arrival-order appends interleave the
keyspace, so a point `scan` must open every group despite the stats; one
`compact(sort_by=["doc_id"])` re-clusters the table into disjoint-range
packs and the same scan opens one group. Reports scan wall + files
opened before/after, the rewrite's cost, and row equality.

Usage: python tools/soak_sorted_scan.py [total_rows] [n_appends]
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

ROOT = "/tmp/soak_sorted_scan"


def timed_scan(t: SnapshotTable, lo: int, hi: int) -> tuple[float, int, int]:
    t0 = time.time()
    df = t.scan([("doc_id", lo, hi)])
    n = df.count()
    dt = time.time() - t0
    return round(dt, 2), n, len(df.inputFiles())


def main() -> None:
    total = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    spark = get_spark("soak_sorted_scan", cores=32)
    shutil.rmtree(ROOT, ignore_errors=True)
    t = SnapshotTable(spark, ROOT)

    # append b takes keys ≡ b (mod k): every group spans the whole range
    t0 = time.time()
    for b in range(k):
        t.append(
            spark.range(b, total, k).select(
                F.col("id").alias("doc_id"),
                F.sha2(F.col("id").cast("string"), 256).alias("text"),
            )
        )
    t_build = round(time.time() - t0, 1)
    before_rows = t.read().count()

    lo = total // 2
    scan_pre = timed_scan(t, lo, lo + 999)

    t0 = time.time()
    out = t.compact(target_rows=total // 10, sort_by=["doc_id"])
    t_rewrite = round(time.time() - t0, 1)

    scan_post = timed_scan(t, lo, lo + 999)
    after_rows = t.read().count()

    print(json.dumps({
        "total_rows": total,
        "n_appends": k,
        "build_sec": t_build,
        "scan_pre": {"sec": scan_pre[0], "rows": scan_pre[1], "files": scan_pre[2]},
        "rewrite": out,
        "rewrite_sec": t_rewrite,
        "scan_post": {"sec": scan_post[0], "rows": scan_post[1], "files": scan_post[2]},
        "rows_equal": before_rows == after_rows == total,
    }), flush=True)
    assert before_rows == after_rows == total
    assert scan_pre[1] == scan_post[1] == 1000
    spark.stop()


if __name__ == "__main__":
    main()
