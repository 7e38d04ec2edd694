"""Incremental near-dup detection: new batch vs existing corpus.

The reference's incremental path (`simages add`,
reference: src/simages/duplicate_finder.py:118-139) only skips files
whose *path* is already known — it never checks whether a NEW item
near-duplicates an EXISTING one. At web scale that check is the common
case (continuous crawling: most incoming pages duplicate something
already crawled), and re-running all-corpus dedup per batch is the
anti-pattern.

This operator probes the maintained signatures checkpoint with ONE
band-key equi-join:

    new docs → signatures (Arrow UDF over the batch only)
    → band keys ⋈ existing band keys   (equi-join on (band, band_key);
      AQE broadcasts the batch side when it is small — the usual case)
    → exact-Jaccard verify against the union signature set

Cost scales with |batch| + matched buckets, never with |corpus|: the
existing side ships only its 16 band keys per doc (the signatures
checkpoint is scanned column-pruned — no minhash/shingle payload until
verify, which touches candidate docs only). Within-batch duplicates are
deliberately out of scope here — run `find_duplicates` on the batch for
those; this operator answers "which new docs duplicate the corpus".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from simages_spark.config import DedupConfig
from simages_spark.functions.signatures import compute_signatures
from simages_spark.operators.lsh import band_keys
from simages_spark.operators.verify import verify_pairs


def incremental_dedup_edges(
    new_docs: DataFrame,
    existing_signatures: DataFrame,
    cfg: DedupConfig | None = None,
    new_signatures: DataFrame | None = None,
) -> DataFrame:
    """edges(src=new doc_id, dst=existing doc_id, jaccard ≥ τ).

    `existing_signatures` is the checkpointed signatures table (schema of
    `compute_signatures`; under cfg.exact_first it covers representatives,
    which is exactly what the probe needs — each distinct existing text
    once). Exact copies of existing docs need no separate exact-hash
    layer: identical texts agree on all 16 bands, so the band join always
    surfaces them and verify scores them 1.0. Pass `new_signatures` when
    the batch's signatures were already computed (the streaming caller
    appends them to the store anyway — no double UDF pass).
    """
    cfg = cfg or DedupConfig()
    new_sig = (
        new_signatures
        if new_signatures is not None
        else compute_signatures(new_docs, cfg)
    )
    nb = band_keys(new_sig, cfg)
    eb = band_keys(existing_signatures, cfg)
    candidates = (
        nb.select("band", "band_key", F.col("doc_id").alias("src"))
        .join(
            eb.select("band", "band_key", F.col("doc_id").alias("dst")),
            ["band", "band_key"],
        )
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .dropDuplicates(["src", "dst"])
    )
    sets = new_sig.select("doc_id", "shingle_hashes").unionByName(
        existing_signatures.select("doc_id", "shingle_hashes")
    ).dropDuplicates(["doc_id"])
    return verify_pairs(candidates, sets, cfg)
