"""Large-star / small-star connected components over an edge DataFrame.

Replaces the reference's hierarchical-clustering view of the pair graph
(linkage dendrogram, reference: src/simages/embeddings.py:20-29) with true
transitive duplicate clusters, per SURVEY.md §2.4 A4 / §4.2.2. Algorithm:
alternating large-star / small-star (Kiveris et al., "Connected Components
in MapReduce and Beyond", public paper) — converges in O(log²) rounds,
each round two shuffles (groupBy min + join).

Driver-side loop with `localCheckpoint` every `cc_checkpoint_every` rounds
to cut lineage (else the plan grows unbounded); convergence detected by an
order-insensitive edge-set fingerprint (count + sum of per-edge hashes),
so no expensive exceptAll. Labels are the component-minimum doc_id —
deterministic regardless of partitioning or parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from simages_spark.config import DedupConfig


def _normalize(edges: DataFrame) -> DataFrame:
    """Orient src > dst, drop self-loops, dedup."""
    return (
        edges.select(
            F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
        )
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )


def _large_star(edges: DataFrame) -> DataFrame:
    sym = edges.select(F.col("src").alias("u"), F.col("dst").alias("v")).unionAll(
        edges.select(F.col("dst").alias("u"), F.col("src").alias("v"))
    )
    mins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select("u", F.least("mn", "u").alias("m"))
    )
    return _normalize(
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("src"), F.col("m").alias("dst"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    oriented = _normalize(edges)  # src > dst
    mins = oriented.groupBy("src").agg(F.min("dst").alias("m"))
    rewired = (
        oriented.join(mins, "src")
        .where(F.col("dst") != F.col("m"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )
    center = mins.select(F.col("src"), F.col("m").alias("dst"))
    return _normalize(rewired.unionAll(center))


def _fingerprint(edges: DataFrame) -> tuple[int, int]:
    # bit_xor over the (deduped) edge set: order-insensitive, overflow-free
    # under ANSI mode (sum of hashes would throw ARITHMETIC_OVERFLOW)
    row = edges.agg(
        F.count("*").alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("src", "dst")), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(
    edges: DataFrame,
    cfg: DedupConfig | None = None,
    round_metrics: list | None = None,
) -> DataFrame:
    """edges(src, dst, ...) → clusters(doc_id, cluster_id).

    cluster_id = min doc_id in the component. Every endpoint of every edge
    receives a label (callers union in singletons if they want all docs).
    Pass a list as `round_metrics` to receive one (round_no, n_edges)
    entry per iteration — the north-rule metrics surface for the only
    iterative stage (rounds ≈ O(log² diameter); see tools/soak_cc.py
    for the measured diameter dependence).
    """
    cfg = cfg or DedupConfig()
    spark = edges.sparkSession
    # LAZY localCheckpoint: the fingerprint aggregate that follows is the
    # materializing action, so lineage-cut + convergence-check share ONE
    # job per round (eager=True would run an extra count() job each round
    # — the rounds are latency-bound, not compute-bound).
    cur = _normalize(edges.select("src", "dst")).localCheckpoint(eager=False)
    prev_fp = _fingerprint(cur)
    for round_no in range(1, cfg.cc_max_rounds + 1):
        nxt = _small_star(_large_star(cur))
        # checkpoint every cc_checkpoint_every rounds (default 1): one
        # LS+SS round is already several shuffles deep and Catalyst
        # re-analysis of an uncut lineage gets superlinear fast; raising
        # the cadence trades re-analysis depth for fewer materializations.
        if round_no % cfg.cc_checkpoint_every == 0:
            nxt = nxt.localCheckpoint(eager=False)
        fp = _fingerprint(nxt)
        cur = nxt
        if round_metrics is not None:
            round_metrics.append((round_no, fp[0]))
        if fp == prev_fp:
            break
        prev_fp = fp
    else:
        raise RuntimeError(f"CC did not converge in {cfg.cc_max_rounds} rounds")
    # converged: `cur` is a star forest (child src → root dst)
    clusters = cur.select(
        F.col("src").alias("doc_id"), F.col("dst").alias("cluster_id")
    ).unionAll(
        cur.select(F.col("dst").alias("doc_id"), F.col("dst").alias("cluster_id"))
    )
    return clusters.dropDuplicates(["doc_id"])
