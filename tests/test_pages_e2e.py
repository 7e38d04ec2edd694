"""End-to-end over the input_hint `pages` schema (url, warc_ts, html,
text, lang): mint doc_ids, dedup, keeper policy by warc_ts, groups."""

from __future__ import annotations

from pyspark.sql import functions as F

from simages_spark.config import DedupConfig
from simages_spark.operators.groups import (
    duplicate_groups,
    keep_first_policy,
    same_time_filter,
)
from simages_spark.pipeline import find_duplicates
from simages_spark.sources.corpus import generate_pages, mint_doc_ids

CFG = DedupConfig()


def test_pages_end_to_end(spark):
    pages = mint_doc_ids(generate_pages(spark, 160, seed=7, partitions=4)).cache()
    docs = pages.select("doc_id", "text")
    result = find_duplicates(docs, CFG)

    # planted truth: roles 0,1 of each group are exact copies → must pair
    truth = pages.where(F.col("truth_cluster") >= 0)
    exact_pairs = (
        truth.groupBy("truth_cluster")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") >= 2)
        .count()
    )
    assert exact_pairs > 0

    clusters = result.clusters
    meta = pages.select("doc_id", "url", "warc_ts", "truth_cluster")

    # every planted truth-cluster with ≥2 members lands in one CC cluster
    joined = clusters.join(meta, "doc_id")
    split_groups = (
        joined.where(F.col("truth_cluster") >= 0)
        .groupBy("truth_cluster")
        .agg(F.count_distinct("cluster_id").alias("n_cl"))
        .where(F.col("n_cl") > 1)
        .count()
    )
    assert split_groups == 0, "a planted duplicate group was split"

    # keeper policy: exactly one keeper per cluster, and it's the earliest
    # warc_ts (tie-break min doc_id)
    policy = keep_first_policy(clusters, pages.select("doc_id", "warc_ts"), CFG)
    keepers = policy.where("is_keeper").join(meta, "doc_id")
    first_ts = (
        clusters.join(meta, "doc_id")
        .groupBy("cluster_id")
        .agg(F.min("warc_ts").alias("min_ts"))
    )
    bad = (
        keepers.join(first_ts, "cluster_id")
        .where(F.col("warc_ts") != F.col("min_ts"))
        .count()
    )
    assert bad == 0

    # groups: items[0] is the keeper (reference keep-first contract)
    groups = duplicate_groups(
        clusters, pages.select("doc_id", "url", "warc_ts", "n_chars" if "n_chars" in pages.columns else "lang")
    )
    g = groups.select(
        "cluster_id", F.col("items")[0]["doc_id"].alias("first_doc")
    )
    keeper_ids = {r["cluster_id"]: r["doc_id"] for r in policy.where("is_keeper").collect()}
    for r in g.collect():
        assert keeper_ids[r["cluster_id"]] == r["first_doc"]

    # same-time filter keeps only groups whose members share warc_ts —
    # planted pages all have distinct timestamps, so everything filters out
    assert same_time_filter(groups).count() == 0
