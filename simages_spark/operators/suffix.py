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

Per-partition work is fully vectorized numpy (mapInPandas): window hashes
come from two independent 64-bit polynomial rolling hashes (128 bits
total — collisions negligible), computed from prefix sums with uint64
wraparound arithmetic — no per-window Python, no cryptographic hashing.
The cross-doc step is one groupBy/self-join on (h1, h2); keys are
uniform, so no skew beyond genuinely viral substrings (capped + surfaced
in metrics).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

ANCHOR_SCHEMA = "doc_id long, pos int, h1 long, h2 long"

_K = 16  # rolling k-gram size for anchor selection
_B1 = np.uint64(1099511628211)  # FNV prime (odd → invertible mod 2^64)
_B2 = np.uint64(6364136223846793005)  # PCG multiplier (odd)


def _pow_mod64(base: int, n: int) -> np.ndarray:
    """[base^0, base^1, ..., base^(n-1)] mod 2^64, vectorized."""
    out = np.empty(n, dtype=np.uint64)
    out[0] = 1
    np.multiply.accumulate(
        np.full(n - 1, base, dtype=np.uint64), out=out[1:]
    ) if n > 1 else None
    return out


def _inv_mod64(a: int) -> int:
    """Inverse of odd a mod 2^64 (Newton iteration)."""
    x = a
    for _ in range(5):
        x = (x * (2 - a * x)) % (1 << 64)
    return x


def _substring_hashes(arr: np.ndarray, starts: np.ndarray, w: int, base: np.uint64):
    """Polynomial hash of arr[s:s+w] for each s, via prefix sums mod 2^64.

    Q[k] = sum_{t<k} arr[t] * Binv^t ; hash(s) = (Q[s+w] - Q[s]) * B^s
    — a function of the substring bytes only.
    """
    n = len(arr)
    binv = np.uint64(_inv_mod64(int(base)))
    binv_pows = _pow_mod64(int(binv), n + 1)
    b_pows = _pow_mod64(int(base), n + 1)
    q = np.zeros(n + 1, dtype=np.uint64)
    np.cumsum(arr * binv_pows[:n], out=q[1:], dtype=np.uint64)
    return (q[starts + w] - q[starts]) * b_pows[starts]


def _anchors_and_hashes(
    data: bytes, window: int, stride: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(positions, h1, h2) for content-defined anchored windows."""
    n = len(data)
    if n < window:
        empty = np.empty(0, dtype=np.int64)
        return empty, empty, empty
    arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    # k-gram anchor hash: polynomial over the k bytes at each position
    powers = np.array(
        [pow(int(_B1), _K - 1 - j, 2**64) for j in range(_K)], dtype=np.uint64
    )
    m = n - _K + 1
    h = np.zeros(m, dtype=np.uint64)
    for j in range(_K):
        h += arr[j : j + m] * powers[j]
    starts = np.nonzero(h % np.uint64(stride) == 0)[0]
    starts = starts[starts <= n - window]
    h1 = _substring_hashes(arr, starts, window, _B1)
    h2 = _substring_hashes(arr, starts, window, _B2)
    return starts.astype(np.int64), h1.view(np.int64), h2.view(np.int64)


def anchored_windows(
    docs: DataFrame, window: int = 64, stride: int = 4
) -> DataFrame:
    """(doc_id, pos, h1, h2) at content-defined anchors."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"].fillna("")):
                pos, h1, h2 = _anchors_and_hashes(
                    text.encode("utf-8"), window, stride
                )
                if len(pos):
                    frames.append(
                        pd.DataFrame(
                            {
                                "doc_id": np.int64(doc_id),
                                "pos": pos.astype(np.int32),
                                "h1": h1,
                                "h2": h2,
                            }
                        )
                    )
            yield (
                pd.concat(frames, ignore_index=True)
                if frames
                else pd.DataFrame(
                    {
                        "doc_id": pd.Series(dtype="int64"),
                        "pos": pd.Series(dtype="int32"),
                        "h1": pd.Series(dtype="int64"),
                        "h2": pd.Series(dtype="int64"),
                    }
                )
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
    exact-hash layer. Not silent: `suffix_metrics` surfaces them.
    """
    anchors = anchored_windows(docs, min_len, stride)
    counts = anchors.groupBy("h1", "h2").agg(
        F.count_distinct("doc_id").alias("n_docs")
    )
    eligible = (
        anchors.join(
            counts.where(
                (F.col("n_docs") > 1) & (F.col("n_docs") <= max_docs_per_window)
            ),
            ["h1", "h2"],
        )
        .select("h1", "h2", "doc_id")
        .dropDuplicates()
    )
    left = eligible.select("h1", "h2", F.col("doc_id").alias("src"))
    right = eligible.select("h1", "h2", F.col("doc_id").alias("dst"))
    return (
        left.join(right, ["h1", "h2"])
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .dropDuplicates()
        .withColumn("method", F.lit("suffix"))
    )


def suffix_metrics(docs: DataFrame, min_len: int = 64, stride: int = 4) -> DataFrame:
    counts = anchored_windows(docs, min_len, stride).groupBy("h1", "h2").agg(
        F.count_distinct("doc_id").alias("n_docs")
    )
    return counts.agg(
        F.count("*").alias("n_windows"),
        F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0)).alias("n_shared_windows"),
        F.max("n_docs").alias("max_docs_per_window"),
    )
