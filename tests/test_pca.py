"""Distributed PCA numerics pinned against a single-node numpy
reference: the partial-Gram decomposition must agree with numpy's
covariance + eigh to float precision, modulo the genuinely arbitrary
sign/order of eigenvectors — so the checks are on explained variance
and subspace projection distances, which are sign-invariant."""

from __future__ import annotations

import numpy as np

from bigdatafinalproject_spark.catalog import load_table
from bigdatafinalproject_spark.operators.pca import gram_and_mean, pca_project
from tests.conftest import SF_DIR

DIM, K = 64, 8


def _reference(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    ids = [r.vec_id for r in rows]
    X = np.asarray([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    return ids, X


def test_gram_matches_numpy(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    g, mean, n = gram_and_mean(emb, "embedding", DIM)
    _, X = _reference(spark)
    assert n == len(X)
    np.testing.assert_allclose(mean, X.mean(axis=0), rtol=1e-12)
    np.testing.assert_allclose(g, X.T @ X, rtol=1e-10)


def test_projection_matches_numpy_subspace(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    got = {
        r.vec_id: np.asarray([r[f"pc{j}"] for j in range(K)])
        for r in pca_project(emb, "embedding", "vec_id", DIM, K).collect()
    }
    ids, X = _reference(spark)
    Xc = X - X.mean(axis=0)
    cov = (Xc.T @ Xc) / (len(X) - 1)
    vals, vecs = np.linalg.eigh(cov)
    ref_comps = vecs[:, ::-1][:, :K]
    ref_proj = Xc @ ref_comps

    # per-vector distances within the PCA subspace are rotation/sign
    # invariant: compare pairwise norms of the first few projections
    sample = ids[:20]
    got_m = np.asarray([got[i] for i in sample])
    ref_m = np.asarray([ref_proj[ids.index(i)] for i in sample])
    d_got = np.linalg.norm(got_m[:, None] - got_m[None, :], axis=2)
    d_ref = np.linalg.norm(ref_m[:, None] - ref_m[None, :], axis=2)
    np.testing.assert_allclose(d_got, d_ref, rtol=1e-6, atol=1e-8)

    # explained variance per component matches the eigenvalues
    all_proj = np.asarray([got[i] for i in ids])
    np.testing.assert_allclose(
        all_proj.var(axis=0, ddof=1), vals[::-1][:K], rtol=1e-6
    )
