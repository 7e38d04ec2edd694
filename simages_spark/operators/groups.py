"""Duplicate groups + dedup policy (SURVEY.md §2.4 A1/A2/A5).

Re-expresses the reference's Mongo aggregation pipeline
(`$group(_id=pair_hash, total, items=$push)` → `$match(total>1)` →
`$sort`, reference: src/simages/duplicate_finder.py:255-283) and the
keep-first delete policy (reference: src/simages/duplicate_finder.py:403-409)
as declarative groupBy/window plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from simages_spark.config import DedupConfig


def duplicate_groups(clusters: DataFrame, docs: DataFrame) -> DataFrame:
    """clusters(doc_id, cluster_id) × docs metadata → groups.

    groups(cluster_id, total, items array<struct>) — items sorted by the
    deterministic keeper rank so items[0] is the keeper, mirroring the
    Mongo `$push` order contract (reference: src/simages/duplicate_finder.py:264-272).
    """
    # keeper-rank columns lead the struct so sort_array orders members by
    # (warc_ts, doc_id) — no duplicate fields (ambiguous-reference error)
    lead = ["warc_ts"] if "warc_ts" in docs.columns else []
    member_cols = [c for c in docs.columns if c != "doc_id" and c not in lead]
    joined = clusters.join(docs, "doc_id")
    item = F.struct(
        *[F.col(c) for c in lead], F.col("doc_id"), *[F.col(c) for c in member_cols]
    )
    return (
        joined.groupBy("cluster_id")
        .agg(
            F.count("*").alias("total"),
            F.sort_array(F.collect_list(item)).alias("items"),
        )
        .where(F.col("total") > 1)
    )


def same_time_filter(groups: DataFrame, ts_field: str = "warc_ts") -> DataFrame:
    """A2: keep a group only if all members share the timestamp, with the
    unknown sentinel passing (reference: src/simages/duplicate_finder.py:243-252
    — `"Time unknown"` ⇒ keep). Null warc_ts plays the sentinel role."""
    ts_vals = F.expr(f"array_distinct(transform(items, x -> x.{ts_field}))")
    return groups.where(
        (F.size(F.filter(ts_vals, lambda t: t.isNotNull())) <= 1)
    )


def pairwise_groups(edges: DataFrame) -> DataFrame:
    """A3 debug view: one group per pair, distance attached to both members
    (the reference's pre-clustering group construction,
    reference: src/simages/duplicate_finder.py:158-186). Superseded by true
    transitive clusters (A4); kept for parity/debugging."""
    pair_id = F.xxhash64("src", "dst")
    return edges.select(
        pair_id.alias("group_id"),
        F.array(
            F.struct(F.col("src").alias("doc_id"), F.col("jaccard")),
            F.struct(F.col("dst").alias("doc_id"), F.col("jaccard")),
        ).alias("items"),
    )


def fetch_docs(clusters_or_ids: DataFrame, docs: DataFrame) -> DataFrame:
    """M6 analog: map ids back to content (the reference decodes embeddings
    back to images, reference: src/simages/extractor.py:546-587; for hash
    signatures the inverse is a join back to the corpus)."""
    return clusters_or_ids.join(docs, "doc_id")


def keep_first_policy(
    clusters: DataFrame, docs: DataFrame, cfg: DedupConfig | None = None
) -> DataFrame:
    """A5: per cluster keep one deterministic keeper, mark the rest for
    deletion. Returns (doc_id, cluster_id, is_keeper). The `to_delete`
    view is `where(~is_keeper)` — the analog of moving files to Trash
    (reference: src/simages/duplicate_finder.py:286-301) becomes an ACID
    `DELETE FROM` on the corpus table.
    """
    order = []
    if "warc_ts" in docs.columns:
        order.append(F.col("warc_ts").asc_nulls_last())
    order.append(F.col("doc_id").asc())
    w = Window.partitionBy("cluster_id").orderBy(*order)
    joined = clusters.join(docs, "doc_id")
    return joined.select(
        "doc_id",
        "cluster_id",
        (F.row_number().over(w) == 1).alias("is_keeper"),
    )
