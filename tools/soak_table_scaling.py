"""Round-3 verdict item 1 done-criterion: DELETE cost must be
~independent of the TABLE's total group count — manifest [min,max] stats
prune unaffected groups with zero jobs and the survivors of all affected
groups rewrite in ONE job, so a targeted delete on a 200-group table
costs what it costs on a 20-group table (the pre-fix design paid
≥2 sequential driver jobs PER GROUP: a 10⁵-group table = ~10⁵ jobs).

Builds tables at two group counts (same rows-per-group), deletes keys
confined to one group in each, and reports wall time + the number of
Spark jobs the delete actually ran (statusTracker job-group count).

Usage: python tools/soak_table_scaling.py [rows_per_group] [groups_lo] [groups_hi]
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

ROOT = "/tmp/soak_table_scaling"


def build_and_delete(spark, root: str, per: int, k: int) -> dict:
    shutil.rmtree(root, ignore_errors=True)
    t = SnapshotTable(spark, root)
    t0 = time.time()
    for g in range(k):
        t.append(
            spark.range(g * per, (g + 1) * per).select(
                F.col("id").alias("doc_id"),
                F.sha2(F.col("id").cast("string"), 256).alias("text"),
            )
        )
    t_build = time.time() - t0

    # 1k keys, all inside group k//2's range
    lo = (k // 2) * per
    keys = spark.range(lo, lo + 1000).select(F.col("id").alias("doc_id"))
    keys.count()  # materialize the plan outside the timed/counted window

    # read-side stats pruning: scan() must open ONE group's files at any
    # table size, while the naive read().where() lists+opens all k groups
    t0 = time.time()
    scan_df = t.scan([("doc_id", lo, lo + 999)])
    n_scan = scan_df.count()
    t_scan = time.time() - t0
    scan_groups = {f.split("/data/")[1].split("/")[0] for f in scan_df.inputFiles()}
    t0 = time.time()
    n_full = (
        t.read()
        .where((F.col("doc_id") >= lo) & (F.col("doc_id") <= lo + 999))
        .count()
    )
    t_full = time.time() - t0
    assert n_scan == n_full == 1000, (n_scan, n_full)
    assert len(scan_groups) == 1, scan_groups

    sc = spark.sparkContext
    group = f"delete-{k}"
    sc.setJobGroup(group, "timed delete")
    t0 = time.time()
    t.delete_matching(keys, "doc_id")
    t_delete = time.time() - t0
    sc.setJobGroup(None, None)
    jobs = len(sc.statusTracker().getJobIdsForGroup(group))

    man = t.manifest(t.current_version())
    carried = len(
        set(man["data_groups"])
        & set(t.manifest(t.current_version() - 1)["data_groups"])
    )
    n = t.read().count()
    assert n == per * k - 1000, f"delete wrong: {n}"
    assert carried == k - 1, f"carried {carried}, want {k - 1}"
    return {
        "n_groups": k,
        "rows": per * k,
        "build_sec": round(t_build, 1),
        "delete_sec": round(t_delete, 2),
        "delete_jobs": jobs,
        "groups_carried_by_reference": carried,
        "scan_sec": round(t_scan, 2),
        "scan_groups_opened": len(scan_groups),
        "full_read_filter_sec": round(t_full, 2),
    }


def main() -> None:
    per = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 200
    spark = get_spark("soak_table_scaling", cores=32)

    # warm-up: JIT the append/delete code paths once so the lo-vs-hi
    # comparison isn't dominated by first-execution compilation
    build_and_delete(spark, f"{ROOT}/warm", per, 4)

    res_lo = build_and_delete(spark, f"{ROOT}/lo", per, lo)
    print(json.dumps(res_lo), flush=True)
    res_hi = build_and_delete(spark, f"{ROOT}/hi", per, hi)
    print(json.dumps(res_hi), flush=True)

    print(json.dumps({
        "rows_per_group": per,
        "delete_sec_at_groups": {
            str(lo): res_lo["delete_sec"],
            str(hi): res_hi["delete_sec"],
        },
        "delete_jobs_at_groups": {
            str(lo): res_lo["delete_jobs"],
            str(hi): res_hi["delete_jobs"],
        },
        "wall_ratio_hi_over_lo": round(
            res_hi["delete_sec"] / res_lo["delete_sec"], 2
        ),
        "jobs_equal": res_lo["delete_jobs"] == res_hi["delete_jobs"],
        "scan_sec_at_groups": {
            str(lo): res_lo["scan_sec"],
            str(hi): res_hi["scan_sec"],
        },
        "full_read_filter_sec_at_groups": {
            str(lo): res_lo["full_read_filter_sec"],
            str(hi): res_hi["full_read_filter_sec"],
        },
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
