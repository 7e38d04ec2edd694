"""Key-lookup joins from the reference's DB layer (SURVEY.md §2.3 J4-J6).

Each per-file point-lookup loop in the reference becomes one distributed
join — the plan Catalyst already optimizes (broadcast for small sides,
sort-merge otherwise, AQE re-plan at runtime).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def anti_join_new(incoming: DataFrame, known: DataFrame, key: str) -> DataFrame:
    """J4 — incremental-add filter: rows not yet ingested.

    Replaces the reference's per-file point-read loop
    (`new_image_files`/`_in_database`, reference: src/simages/duplicate_finder.py:118-127)
    with a single left_anti join.
    """
    return incoming.join(known.select(key).distinct(), key, "left_anti")


def semi_join_lookup(docs: DataFrame, keys: DataFrame, key: str) -> DataFrame:
    """J5 — `$in` semi-join (reference: src/simages/duplicate_finder.py:388-390)."""
    return docs.join(keys.select(key).distinct(), key, "left_semi")


def enrich_pairs(edges: DataFrame, docs: DataFrame, cols: list[str]) -> DataFrame:
    """J6 — attach per-member metadata to each pair; inner joins drop pairs
    with missing docs, matching the reference
    (reference: src/simages/duplicate_finder.py:142-186, drop at :162-164).
    """
    src_side = docs.select(
        F.col("doc_id").alias("src"), *[F.col(c).alias(f"src_{c}") for c in cols]
    )
    dst_side = docs.select(
        F.col("doc_id").alias("dst"), *[F.col(c).alias(f"dst_{c}") for c in cols]
    )
    return edges.join(src_side, "src").join(dst_side, "dst")
