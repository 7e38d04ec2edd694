"""Measure the stats-pruned merge-on-read FOLD (round-5 review item:
apply_deletes used to rewrite every gated group — O(table) — even when
the delete vector's keys lived in a handful of groups).

Builds a table of `n_groups` disjoint-key groups, MoR-deletes a few keys
confined to ONE group, folds, and reports how many groups the fold
rewrote plus its wall — the number that must track the KEY-HOLDING
groups, not the table.

Usage: python tools/soak_mor_fold_prune.py [rows_per_group] [n_groups]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from simages_spark.session import get_spark  # noqa: E402
from simages_spark.table import SnapshotTable  # noqa: E402


def main():
    per = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    spark = get_spark(cores=int(sys.argv[3]) if len(sys.argv) > 3 else 16)
    import tempfile

    root = tempfile.mkdtemp(prefix="morfold_")
    t = SnapshotTable(spark, root)
    t0 = time.time()
    for g in range(k):
        base = g * per
        df = spark.range(base, base + per).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("text-"), F.col("id")).alias("text"),
        )
        t.append(df)
    build = time.time() - t0
    before = list(t.manifest(t.current_version())["data_groups"])

    # 20 keys all inside group 42
    lo = 42 * per
    keys = spark.createDataFrame(
        [(lo + i * 7,) for i in range(20)], "doc_id long"
    )
    t.delete_matching(keys, "doc_id", merge_on_read=True)

    t1 = time.time()
    r = t.apply_deletes()
    fold = time.time() - t1
    after = set(t.manifest(t.current_version())["data_groups"])
    carried = len(set(before) & after)
    out = {
        "rows": per * k,
        "n_groups": k,
        "build_sec": round(build, 2),
        "fold_sec": round(fold, 2),
        "fold_applied": r["applied"],
        "remaining_dvs": r["remaining_dvs"],
        "groups_carried_by_reference": carried,
        "groups_rewritten": k - carried,
        "rows_after": t.read().count(),
        "expected_rows_after": per * k - 20,
    }
    out["correct"] = out["rows_after"] == out["expected_rows_after"]
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
