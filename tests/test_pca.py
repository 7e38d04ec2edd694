"""PCA (A7) — distributed covariance + projection vs a numpy oracle."""

from __future__ import annotations

import numpy as np

from simages_spark.operators.pca import (
    covariance_matrix,
    embedding_covariance,
    pca_projection_2d,
    principal_components,
)

SF_DIR = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _matrix(spark):
    rows = _emb(spark).select("vec_id", "embedding").collect()
    ids = [r["vec_id"] for r in rows]
    x = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    return ids, x


def test_covariance_matches_numpy(spark):
    ids, x = _matrix(spark)
    cov, n = covariance_matrix(_emb(spark), dim=64)
    assert n == len(ids)
    expected = np.cov(x, rowvar=False, ddof=0)
    assert np.allclose(cov, expected, atol=1e-9)


def test_embedding_covariance_df(spark):
    got = {(r["i"], r["j"]): r["cov"] for r in embedding_covariance(
        _emb(spark), dim=64).collect()}
    _, x = _matrix(spark)
    expected = np.cov(x, rowvar=False, ddof=0)
    assert len(got) == 64 * 65 // 2
    for (i, j), v in list(got.items())[:200]:
        assert abs(v - round(float(expected[i - 1, j - 1]), 6)) <= 1e-6


def test_pca_projection_matches_numpy(spark):
    ids, x = _matrix(spark)
    proj = {r["vec_id"]: (r["pc1"], r["pc2"]) for r in pca_projection_2d(
        _emb(spark), dim=64).collect()}
    cov = np.cov(x, rowvar=False, ddof=0)
    comps = principal_components(cov, 2)
    centered = x - x.mean(axis=0)
    expected = centered @ comps.T
    for vid, row in zip(ids, expected):
        got = proj[vid]
        assert abs(got[0] - row[0]) < 1e-4 and abs(got[1] - row[1]) < 1e-4

    # the two axes really are the top principal directions: projected
    # variance per axis == top-2 eigenvalues
    vals = np.sort(np.linalg.eigvalsh(cov))[::-1][:2]
    proj_var = expected.var(axis=0, ddof=0)
    assert np.allclose(proj_var, vals, rtol=1e-6)


def test_sign_normalization_deterministic():
    rng = np.random.default_rng(7)
    x = rng.standard_normal((200, 8))
    cov = np.cov(x, rowvar=False, ddof=0)
    c1 = principal_components(cov, 2)
    c2 = principal_components(cov.copy(), 2)
    assert np.array_equal(c1, c2)
    for row in c1:
        assert row[np.argmax(np.abs(row))] > 0
