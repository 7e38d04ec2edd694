"""Schema evolution at scale: a 1M-row, 100-group SnapshotTable gains a
column with ZERO data rewrite, reads stay correct, stats pruning on the
original key survives, and compaction folds mixed-schema groups without
losing the evolved column.

What 100-TB posture this evidences: Iceberg-style add-column is a
METADATA operation — the evolve commit must not touch any existing data
group (asserted on the manifest group set), and every read path
afterwards must resolve old files (which lack the column) as nulls via
the manifest schema, including the compaction rewrite that unions old
and new groups in one job.

Usage: python tools/soak_schema_evolution.py [n_rows] [n_groups]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from simages_spark.session import get_spark  # noqa: E402
from simages_spark.table import SnapshotTable  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_groups = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    per = n // n_groups
    spark = get_spark("soak_schema_evolution", cores=32)
    root = "/tmp/soak_schema_evolution_table"
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    t = SnapshotTable(spark, root)

    t0 = time.time()
    for i in range(n_groups):
        t.append(
            spark.range(i * per, (i + 1) * per).select(
                F.col("id").alias("doc_id"),
                F.concat(F.lit("text-"), F.col("id")).alias("text"),
            )
        )
    t_build = time.time() - t0
    man_before = t.manifest(t.current_version())
    print(f"build: {n_groups} appends, {n} rows in {t_build:.1f}s", flush=True)

    # ---- evolve: one append with a new column ----
    t0 = time.time()
    t.append(
        spark.range(n, n + per).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("text-"), F.col("id")).alias("text"),
            F.lit("en").alias("lang"),
        ),
        merge_schema=True,
    )
    t_evolve = time.time() - t0
    man_after = t.manifest(t.current_version())
    carried = set(man_before["data_groups"]) <= set(man_after["data_groups"])
    added = len(man_after["data_groups"]) - len(man_before["data_groups"])
    assert carried and added == 1, "evolution must be metadata-only"
    print(
        f"evolve: +1 column via 1 append in {t_evolve:.1f}s — "
        f"all {len(man_before['data_groups'])} prior groups carried by "
        f"reference (zero rewrite)",
        flush=True,
    )

    # ---- reads: nulls for old rows, values for new ----
    t0 = time.time()
    n_null = t.read().where(F.col("lang").isNull()).count()
    n_en = t.read().where(F.col("lang") == "en").count()
    t_read = time.time() - t0
    assert (n_null, n_en) == (n, per), (n_null, n_en)
    print(f"read: {n_null} null / {n_en} evolved rows in {t_read:.1f}s", flush=True)

    # ---- stats pruning on the original key survives evolution ----
    t0 = time.time()
    hit = t.scan([("doc_id", 5, 10)])
    files = {f.rsplit("/", 2)[1] for f in hit.inputFiles()}
    rows = hit.count()
    t_scan = time.time() - t0
    assert rows == 6 and len(files) == 1, (rows, len(files))
    print(
        f"scan: point read opened {len(files)}/{len(man_after['data_groups'])} "
        f"groups, {rows} rows in {t_scan:.1f}s",
        flush=True,
    )

    # ---- compaction folds mixed-schema groups, column survives ----
    t0 = time.time()
    res = t.compact(target_rows=n + per)
    t_compact = time.time() - t0
    assert res["compacted"]
    after = t.read()
    assert after.schema.names == ["doc_id", "text", "lang"]
    assert after.count() == n + per
    assert after.where(F.col("lang") == "en").count() == per
    print(
        f"compact: {res['folded_groups']} mixed-schema groups → "
        f"{res['new_groups']} in {t_compact:.1f}s; evolved column intact",
        flush=True,
    )
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
