"""LSH banding + within-bucket candidate-pair expansion.

Decomposes the reference's O(N²) all-pairs similarity join
(reference: src/simages/extractor.py:321-342 `duplicates` / closely.solve)
into the scalable LSH plan from SURVEY.md §2.3 J1:

    minhash[128] → 16 band keys (xxhash64 over 8-slot slices, JVM-side)
    → explode → shuffle on (band, band_key) → within-bucket src<dst pairs

Skew handling (north_rule): bucket sizes are counted first; buckets above
`cfg.max_bucket_size` (boilerplate-heavy pages) would expand quadratically,
so oversized buckets are deterministically thinned — each doc is salted
into `cfg.bucket_salt` sub-buckets by xxhash64(doc_id) and pairs only form
within a sub-bucket. Bounded recall loss, *never silent*: `lsh_metrics`
reports how many buckets were split and the largest bucket seen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from simages_spark.config import DedupConfig


def band_keys(signatures: DataFrame, cfg: DedupConfig | None = None) -> DataFrame:
    """signatures → exploded (doc_id, band, band_key).

    Band keys are computed entirely JVM-side: xxhash64 over the band id and
    the 8-slot minhash slice (xxhash64 natively hashes array columns), so
    the only Python in the whole candidate path is the signature UDF.
    Empty docs (num_shingles = 0) produce no bands — they can't be
    near-duplicates of anything.
    """
    cfg = cfg or DedupConfig()
    bands = F.array(
        *[
            F.struct(
                F.lit(j).alias("band"),
                F.xxhash64(
                    F.lit(j), F.slice("minhash", j * cfg.lsh_rows + 1, cfg.lsh_rows)
                ).alias("band_key"),
            )
            for j in range(cfg.lsh_bands)
        ]
    )
    return (
        signatures.where(F.col("num_shingles") > 0)
        .select("doc_id", F.explode(bands).alias("bk"))
        .select("doc_id", F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"))
    )


def candidate_pairs(
    signatures: DataFrame, cfg: DedupConfig | None = None
) -> DataFrame:
    """LSH candidate edges (src < dst), deduplicated across bands.

    The self-join shuffles both sides on the bucket key; AQE's skew-join
    splitting plus the explicit salt cap keep any single bucket from
    dominating a task. At cluster scale the bucket-count aggregation is a
    cheap map-side-combine pass over the exploded bands.
    """
    cfg = cfg or DedupConfig()
    bk = band_keys(signatures, cfg)

    counts = bk.groupBy("band", "band_key").agg(F.count("*").alias("bucket_n"))
    # bucket_n == 1 → no pairs; drop before the join (the vast majority of
    # buckets). AQE turns this into a broadcast join at runtime when the
    # multi-doc bucket list is small; at 10^12-doc scale the shuffle join
    # on the bucket key is the correct plan, so we stay declarative.
    bk = bk.join(counts.where(F.col("bucket_n") > 1), ["band", "band_key"])
    salted = bk.withColumn(
        "salt",
        F.when(
            F.col("bucket_n") > cfg.max_bucket_size,
            F.pmod(F.xxhash64("doc_id"), F.lit(cfg.bucket_salt)),
        ).otherwise(F.lit(0)),
    )
    left = salted.select(
        "band", "band_key", "salt", F.col("doc_id").alias("src")
    )
    right = salted.select(
        "band", "band_key", "salt", F.col("doc_id").alias("dst")
    )
    pairs = left.join(right, ["band", "band_key", "salt"]).where(
        F.col("src") < F.col("dst")
    )
    return pairs.select("src", "dst").dropDuplicates(["src", "dst"])


def lsh_metrics(signatures: DataFrame, cfg: DedupConfig | None = None) -> DataFrame:
    """Bucket-size histogram + split counts (north_rule: per-stage metrics)."""
    cfg = cfg or DedupConfig()
    counts = band_keys(signatures, cfg).groupBy("band", "band_key").agg(
        F.count("*").alias("bucket_n")
    )
    return counts.agg(
        F.count("*").alias("n_buckets"),
        F.sum(F.when(F.col("bucket_n") > 1, 1).otherwise(0)).alias("n_pair_buckets"),
        F.sum(
            F.when(F.col("bucket_n") > cfg.max_bucket_size, 1).otherwise(0)
        ).alias("n_salted_buckets"),
        F.max("bucket_n").alias("max_bucket_n"),
        F.sum(
            (F.col("bucket_n") * (F.col("bucket_n") - 1) / 2).cast("long")
        ).alias("candidate_pairs_upper_bound"),
    )
