"""Connected components on hand-built edge lists (FIXTURES.md golden cases)."""

from __future__ import annotations

import pytest

from simages_spark.config import DedupConfig
from simages_spark.operators.connected_components import connected_components

CFG = DedupConfig(cc_max_rounds=20)


def _run(spark, edges):
    df = spark.createDataFrame(edges, ["src", "dst"])
    return {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(df, CFG).collect()
    }


def test_single_pair(spark):
    assert _run(spark, [(2, 1)]) == {1: 1, 2: 1}


def test_chain(spark):
    got = _run(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {i: 1 for i in range(1, 6)}


def test_long_chain(spark):
    n = 64
    got = _run(spark, [(i, i + 1) for i in range(1, n)])
    assert got == {i: 1 for i in range(1, n + 1)}


def test_star(spark):
    got = _run(spark, [(10, i) for i in range(1, 6)])
    assert got == {i: 1 for i in [1, 2, 3, 4, 5, 10]}


def test_two_components(spark):
    got = _run(spark, [(1, 2), (2, 3), (10, 11), (11, 12)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_self_loop_and_dup_edges(spark):
    got = _run(spark, [(5, 5), (1, 2), (2, 1), (1, 2)])
    assert got == {1: 1, 2: 1}  # self-loop contributes nothing


def test_dense_clique(spark):
    nodes = list(range(1, 9))
    edges = [(a, b) for a in nodes for b in nodes if a < b]
    got = _run(spark, edges)
    assert got == {i: 1 for i in nodes}


def test_convergence_guard(spark):
    with pytest.raises(RuntimeError):
        cfg = DedupConfig(cc_max_rounds=0)
        df = spark.createDataFrame([(1, 2)], ["src", "dst"])
        connected_components(df, cfg).collect()
