"""Connected components on hand-built edge lists (FIXTURES.md golden
cases) — every golden case runs through BOTH physical paths: the
distributed large-star/small-star rounds and the size-gated driver
union-find fast path (identical labels is the contract)."""

from __future__ import annotations

import pytest

from simages_spark.config import DedupConfig
from simages_spark.operators.connected_components import connected_components

CFGS = {
    "distributed": DedupConfig(cc_max_rounds=20, cc_driver_threshold=0),
    "driver": DedupConfig(cc_max_rounds=20),  # default threshold covers all
}


@pytest.fixture(params=sorted(CFGS))
def cc_cfg(request):
    return CFGS[request.param]


def _run(spark, edges, cfg):
    df = spark.createDataFrame(edges, ["src", "dst"])
    return {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(df, cfg).collect()
    }


def test_single_pair(spark, cc_cfg):
    assert _run(spark, [(2, 1)], cc_cfg) == {1: 1, 2: 1}


def test_chain(spark, cc_cfg):
    got = _run(spark, [(1, 2), (2, 3), (3, 4), (4, 5)], cc_cfg)
    assert got == {i: 1 for i in range(1, 6)}


def test_long_chain(spark, cc_cfg):
    n = 64
    got = _run(spark, [(i, i + 1) for i in range(1, n)], cc_cfg)
    assert got == {i: 1 for i in range(1, n + 1)}


def test_star(spark, cc_cfg):
    got = _run(spark, [(10, i) for i in range(1, 6)], cc_cfg)
    assert got == {i: 1 for i in [1, 2, 3, 4, 5, 10]}


def test_two_components(spark, cc_cfg):
    got = _run(spark, [(1, 2), (2, 3), (10, 11), (11, 12)], cc_cfg)
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_self_loop_and_dup_edges(spark, cc_cfg):
    got = _run(spark, [(5, 5), (1, 2), (2, 1), (1, 2)], cc_cfg)
    assert got == {1: 1, 2: 1}  # self-loop contributes nothing


def test_dense_clique(spark, cc_cfg):
    nodes = list(range(1, 9))
    edges = [(a, b) for a in nodes for b in nodes if a < b]
    got = _run(spark, edges, cc_cfg)
    assert got == {i: 1 for i in nodes}


def test_convergence_guard(spark):
    with pytest.raises(RuntimeError):
        cfg = DedupConfig(cc_max_rounds=0, cc_driver_threshold=0)
        df = spark.createDataFrame([(1, 2)], ["src", "dst"])
        connected_components(df, cfg).collect()


def test_fast_path_equals_distributed_random_graph(spark):
    """Both physical paths produce byte-identical labels on a messy
    random graph; the fast path reports itself via round_metrics (0, n)."""
    import random

    rng = random.Random(13)
    edges = [
        (rng.randrange(500), rng.randrange(500)) for _ in range(800)
    ]
    df = spark.createDataFrame(edges, ["src", "dst"])
    rm_fast: list = []
    fast = {
        (r["doc_id"], r["cluster_id"])
        for r in connected_components(
            df, CFGS["driver"], round_metrics=rm_fast
        ).collect()
    }
    dist = {
        (r["doc_id"], r["cluster_id"])
        for r in connected_components(df, CFGS["distributed"]).collect()
    }
    assert fast == dist
    assert len(rm_fast) == 1 and rm_fast[0][0] == 0
