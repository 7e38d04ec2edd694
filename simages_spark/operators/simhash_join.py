"""SimHash Hamming-ball candidate expansion (SURVEY.md §2.3 J1b, §4.2.3).

Pigeonhole block join: split the 64-bit simhash into 4 blocks of 16 bits;
two hashes within Hamming distance d ≤ 3 must agree on at least one block,
so an equi-join on (block_id, block_value) finds all of them. The exact
Hamming filter afterwards is `bit_count(xor)` — pure JVM.

This is the cheap complement to MinHash-LSH: it catches high-overlap docs
whose shingle *multiset* barely changed (bit flips in the majority vote),
at the cost of one narrow shuffle on 16-bit block keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from simages_spark.config import DedupConfig


def simhash_blocks(signatures: DataFrame, cfg: DedupConfig | None = None) -> DataFrame:
    cfg = cfg or DedupConfig()
    width = cfg.simhash_bits // cfg.simhash_blocks
    mask = (1 << width) - 1
    blocks = F.array(
        *[
            F.struct(
                F.lit(j).alias("block"),
                (
                    F.shiftrightunsigned(F.col("simhash"), j * width)
                    .bitwiseAND(F.lit(mask))
                ).alias("block_val"),
            )
            for j in range(cfg.simhash_blocks)
        ]
    )
    return (
        signatures.where(F.col("num_shingles") > 0)
        .select("doc_id", "simhash", F.explode(blocks).alias("b"))
        .select("doc_id", "simhash", "b.block", "b.block_val")
    )


def simhash_candidates(
    signatures: DataFrame, cfg: DedupConfig | None = None
) -> DataFrame:
    """Pairs (src < dst) with Hamming(simhash) ≤ cfg.simhash_max_hamming.

    Single-shuffle bucket expansion (operators/buckets.py) carrying
    struct(doc_id, simhash) as the bucket member, so the exact Hamming
    filter runs right on the expanded pair — no join back to signatures.
    """
    cfg = cfg or DedupConfig()
    from simages_spark.operators.buckets import bucket_pairs

    blk = simhash_blocks(signatures, cfg).select(
        "block",
        "block_val",
        F.struct(F.col("doc_id"), F.col("simhash")).alias("m"),
    )
    pairs = bucket_pairs(blk, ["block", "block_val"], "m", cap=cfg.max_bucket_size, nsalt=cfg.bucket_salt)
    return (
        pairs.withColumn(
            "hamming",
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))),
        )
        .where(F.col("hamming") <= cfg.simhash_max_hamming)
        .select(
            F.col("a.doc_id").alias("src"),
            F.col("b.doc_id").alias("dst"),
            "hamming",
        )
    )
