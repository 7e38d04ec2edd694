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
