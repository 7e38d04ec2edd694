"""MinHash / SimHash signature computation (vectorized Arrow UDFs).

Replaces the reference's autoencoder embedding stage
(reference: src/simages/extractor.py:277-319 `eval`, producing the N×z
float matrix) with deterministic 128-perm MinHash + 64-bit SimHash
signatures per BASELINE.json. Runs as `mapInPandas` over Arrow batches —
the Spark analog of the reference's batched tensor path
(reference: src/simages/extractor.py:285-298, batch_size=32) — never
per-row Python UDFs.

MinHash family: multiply-shift permutations over the 64-bit shingle
hashes: h_i(x) = (a_i * x + b_i) mod 2^64, a_i odd, seeded. Signature
slot i = min over the doc's shingle hashes. Empty docs get the max
sentinel (2^63-1 per slot) and num_shingles = 0.

SimHash: per bit b, sign of sum over shingles of (+1 if bit set else -1);
64-bit output packed into a signed int64.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from simages_spark.config import DedupConfig
from simages_spark.functions.shingles import hash_shingles, shingle_strings

SIGNATURE_SCHEMA = (
    "doc_id long, minhash array<long>, simhash long, "
    "num_shingles int, shingle_hashes array<long>"
)

_EMPTY_SENTINEL = np.int64(2**63 - 1)


def _perm_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 2**63, size=num_perm, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.integers(0, 2**63, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_of_hashes(h: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """128-slot MinHash of a uint64 hash set; vectorized (P, m) outer product."""
    if h.size == 0:
        return np.full(a.shape[0], _EMPTY_SENTINEL, dtype=np.int64)
    # uint64 arithmetic wraps mod 2^64 (numpy unsigned overflow semantics)
    hv = a[:, None] * h[None, :] + b[:, None]
    return hv.min(axis=1).view(np.int64)


def simhash_of_hashes(h: np.ndarray, bits: int = 64) -> int:
    """SimHash: majority vote per bit over the shingle-hash set."""
    if h.size == 0:
        return 0
    bit_matrix = (h[:, None] >> np.arange(bits, dtype=np.uint64)[None, :]) & np.uint64(1)
    votes = bit_matrix.sum(axis=0, dtype=np.int64) * 2 - np.int64(h.size)
    packed = np.uint64(0)
    for bit in np.nonzero(votes >= 0)[0]:
        packed |= np.uint64(1) << np.uint64(bit)
    return int(packed.astype(np.uint64).view(np.int64))


def compute_signatures_pdf(
    pdf: pd.DataFrame, cfg: DedupConfig, a: np.ndarray, b: np.ndarray
) -> pd.DataFrame:
    """One Arrow batch: text → (minhash, simhash, num_shingles, shingle_hashes)."""
    minhashes: list[np.ndarray] = []
    simhashes: list[int] = []
    nshingles: list[int] = []
    hash_sets: list[np.ndarray] = []
    # null text → empty doc (malformed-row tolerance, SURVEY.md §2.1 S3:
    # drop-don't-fail); .astype(str) would stringify None to "None"
    for text in pdf["text"].fillna(""):
        h = hash_shingles(shingle_strings(text, cfg.shingle_size))
        if h.size > cfg.max_shingles_per_doc:
            # bound per-doc payload; deterministic (smallest hashes kept).
            # Documented cap — metrics surface how often it fires.
            h = np.sort(h)[: cfg.max_shingles_per_doc]
        minhashes.append(minhash_of_hashes(h, a, b))
        simhashes.append(simhash_of_hashes(h, cfg.simhash_bits))
        nshingles.append(int(h.size))
        hash_sets.append(h.view(np.int64))
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"].astype("int64"),
            "minhash": minhashes,
            "simhash": pd.Series(simhashes, dtype="int64"),
            "num_shingles": pd.Series(nshingles, dtype="int32"),
            "shingle_hashes": hash_sets,
        }
    )


def compute_signatures(df, cfg: DedupConfig | None = None):
    """documents(doc_id, text, ...) → signatures DataFrame.

    Analog of `EmbeddingExtractor.eval` (reference: src/simages/extractor.py:277-319):
    the full-corpus signature pass. `shingle_hashes` carries the distinct
    hashed shingle set for the exact-Jaccard verify join so verification
    never re-reads `text`.
    """
    cfg = cfg or DedupConfig()
    a, b = _perm_params(cfg.num_perm, cfg.seed)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield compute_signatures_pdf(pdf, cfg, a, b)

    return df.select("doc_id", "text").mapInPandas(run, schema=SIGNATURE_SCHEMA)
