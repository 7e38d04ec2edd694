"""Compaction of the streaming batch_id-partitioned stores: probe
results invariant, crash leftovers harmless, generations converge."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from simages_spark.config import DedupConfig
from simages_spark.maintenance import (
    compact_probe_index,
    compact_signature_store,
    list_batch_partitions,
)
from simages_spark.streaming import process_near_dedup_batch

CFG = DedupConfig()

BASE = " ".join(f"word{i}" for i in range(40))
NEAR = " ".join(("CHANGED" if i == 20 else f"word{i}") for i in range(40))


def _batch(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _run_batches(spark, root, batches, start=0):
    for i, rows in enumerate(batches, start=start):
        process_near_dedup_batch(
            _batch(spark, rows), i, f"{root}/sig", f"{root}/idx",
            f"{root}/edges", CFG, include_within_batch=True,
        )


def _edges_of_batch(spark, root, b):
    df = spark.read.parquet(f"{root}/edges").where(F.col("batch_id") == b)
    return {(r["src"], r["dst"]): round(r["jaccard"], 6) for r in df.collect()}


BATCHES = [
    [(1, BASE), (2, "first unrelated page text")],
    [(3, NEAR), (4, "second unrelated page entirely")],
    [(5, BASE), (6, "third page of fresh content")],
    [(7, " ".join(f"other{i}" for i in range(40)))],
]
PROBE = [(100, BASE), (101, NEAR), (102, "never seen before words")]


def test_compaction_preserves_probe_results(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    _run_batches(spark, a, BATCHES)
    shutil.copytree(a, b)

    ci = compact_probe_index(spark, f"{b}/idx")
    cs = compact_signature_store(spark, f"{b}/sig")
    assert ci["compacted"] and cs["compacted"]
    # the newest live batch (3) is NEVER folded — it may be a crashed
    # partial write whose retry needs dynamic-overwrite semantics
    assert ci["folded_partitions"] == 3
    assert list_batch_partitions(spark, f"{b}/idx") == [-1, 3]
    assert list_batch_partitions(spark, f"{b}/sig") == [-1, 3]

    # the next batch probes identically against compacted vs raw stores
    for root in (a, b):
        process_near_dedup_batch(
            _batch(spark, PROBE), 4, f"{root}/sig", f"{root}/idx",
            f"{root}/edges", CFG, include_within_batch=True,
        )
    got_a, got_b = _edges_of_batch(spark, a, 4), _edges_of_batch(spark, b, 4)
    assert got_a == got_b and got_a  # non-trivial: BASE/NEAR matches exist
    # listing cost: compacted store holds [gen, kept tail, new batch]
    assert list_batch_partitions(spark, f"{b}/idx") == [-1, 3, 4]
    assert list_batch_partitions(spark, f"{a}/idx") == [0, 1, 2, 3, 4]


def test_compaction_crash_leftovers_are_harmless(spark, tmp_path):
    """Originals surviving a crash mid-delete only duplicate rows the
    generation already holds — probe results must not change, and the
    next compaction folds + removes them (convergence)."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    _run_batches(spark, a, BATCHES)
    shutil.copytree(a, b)
    compact_probe_index(spark, f"{b}/idx")
    # simulate a crash that finished the generation write but missed one
    # original partition delete
    shutil.copytree(f"{a}/idx/batch_id=0", f"{b}/idx/batch_id=0")

    for root in (a, b):
        process_near_dedup_batch(
            _batch(spark, PROBE), 4, f"{root}/sig", f"{root}/idx",
            f"{root}/edges", CFG, include_within_batch=True,
        )
    assert _edges_of_batch(spark, a, 4) == _edges_of_batch(spark, b, 4)

    # re-running compaction converges: leftover + prior gen + all but
    # the newest batch fold into generation 2 with no duplicate rows
    c2 = compact_probe_index(spark, f"{b}/idx")
    assert c2["generation"] == 2
    assert list_batch_partitions(spark, f"{b}/idx") == [-2, 4]
    idx = spark.read.parquet(f"{b}/idx")
    assert idx.count() == idx.dropDuplicates(
        ["kind", "pkey", "doc_id", "simhash"]
    ).count()


def test_compaction_noop_on_single_partition(spark, tmp_path):
    root = str(tmp_path / "c")
    _run_batches(spark, root, BATCHES[:1])
    out = compact_probe_index(spark, f"{root}/idx")
    assert out == {"compacted": False, "folded_partitions": 0, "partitions": 1}
    assert list_batch_partitions(spark, f"{root}/idx") == [0]


def test_compact_eligible_restricts_fold(spark, tmp_path):
    """`eligible` bounds the fold to the given batch_ids — the hook
    compact_edges_store uses to never fold edge batches the cluster
    labeling has not consumed yet."""
    from simages_spark.maintenance import compact_batch_partitions

    path = str(tmp_path / "store")
    for b in range(4):
        spark.createDataFrame(
            [(b * 10 + i, f"v{b}") for i in range(3)], "k long, v string"
        ).withColumn("batch_id", F.lit(b)).write.mode("append").partitionBy(
            "batch_id"
        ).parquet(path)

    # only batch 0 eligible → nothing to fold (a 1-partition fold is a
    # no-op), all partitions intact
    r = compact_batch_partitions(spark, path, eligible={0})
    assert not r["compacted"]
    assert list_batch_partitions(spark, path) == [0, 1, 2, 3]

    # 0 and 1 eligible → exactly those fold; 2 stays (plus 3, keep-out)
    r = compact_batch_partitions(spark, path, eligible={0, 1})
    assert r["compacted"] and r["folded_partitions"] == 2
    assert list_batch_partitions(spark, path) == [-1, 2, 3]
    assert spark.read.parquet(path).count() == 12  # nothing lost


def test_signature_compaction_keeps_first_version(spark, tmp_path):
    """When the same doc_id appears in several batches with DIFFERENT
    payloads (changed-text redelivery), the fold must keep the EARLIEST
    batch's row — deterministic keep-first, matching the probe's payload
    rule (round-5 review: dropDuplicates picked a shuffle winner)."""
    path = str(tmp_path / "sig_store")
    rows = spark.createDataFrame(
        [(5, [1, 2, 3]), (7, [9, 9, 9])],
        "doc_id long, shingle_hashes array<bigint>",
    )
    rows.withColumn("batch_id", F.lit(0)).write.mode("append").partitionBy(
        "batch_id"
    ).parquet(path)
    changed = spark.createDataFrame(
        [(5, [4, 5, 6])], "doc_id long, shingle_hashes array<bigint>"
    )
    changed.withColumn("batch_id", F.lit(1)).write.mode("append").partitionBy(
        "batch_id"
    ).parquet(path)
    spark.createDataFrame(
        [(8, [7, 7, 7])], "doc_id long, shingle_hashes array<bigint>"
    ).withColumn("batch_id", F.lit(2)).write.mode("append").partitionBy(
        "batch_id"
    ).parquet(path)

    r = compact_signature_store(spark, path)
    assert r["compacted"]
    got = {
        row["doc_id"]: list(row["shingle_hashes"])
        for row in spark.read.parquet(path)
        .where(F.col("batch_id") < 0)
        .collect()
    }
    assert got[5] == [1, 2, 3]  # batch-0 version survived the fold
    assert got[7] == [9, 9, 9]
