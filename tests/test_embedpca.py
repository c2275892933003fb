"""Properties of the distributed PCA operator (operators/embedpca.py):
partial-Gram correctness, eigenpair parity against a full numpy eigh,
orthonormality, variance ordering, and partition invariance."""

from __future__ import annotations

import numpy as np
import pytest

from mcm_problem_f_data_wrangling_spark.operators.embedpca import (
    fit_pca,
    project_pca,
)

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")


@pytest.fixture(scope="module")
def X(emb):
    rows = emb.orderBy("vec_id").collect()
    return np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])


def test_fit_pca_matches_numpy_eigh(emb, X):
    vals, vecs, mu, total_var = fit_pca(emb, k=2)
    C = np.cov(X, rowvar=False, bias=True)
    ref_vals, ref_vecs = np.linalg.eigh(C)
    ref_top = ref_vals[::-1][:2]
    assert np.allclose(vals, ref_top, rtol=1e-6)
    assert np.allclose(mu, X.mean(axis=0), rtol=1e-9, atol=1e-12)
    assert np.isclose(total_var, np.trace(C), rtol=1e-9)
    # components match up to sign
    for i in range(2):
        ref_v = ref_vecs[:, -1 - i]
        assert min(
            np.linalg.norm(vecs[i] - ref_v), np.linalg.norm(vecs[i] + ref_v)
        ) < 1e-5


def test_components_orthonormal_and_variance_ordered(emb):
    vals, vecs, _, total_var = fit_pca(emb, k=3)
    G = vecs @ vecs.T
    assert np.allclose(G, np.eye(3), atol=1e-6)
    assert vals[0] >= vals[1] >= vals[2] > 0
    assert vals.sum() <= total_var + 1e-9


def test_projection_variance_matches_eigenvalues(emb, X):
    vals, vecs, mu, _ = fit_pca(emb, k=2)
    out = project_pca(emb, vecs, mu).orderBy("vec_id").collect()
    P = np.array([[r["pc1"], r["pc2"]] for r in out])
    # var of the projected coordinate IS the eigenvalue
    assert np.allclose(P.var(axis=0), vals, rtol=1e-6)
    # and equals the direct numpy projection
    ref = (X - X.mean(axis=0)) @ vecs.T
    assert np.allclose(np.sort(P[:, 0]), np.sort(ref[:, 0]), atol=1e-9)


def test_fit_pca_partition_invariant(emb):
    v1, c1, m1, t1 = fit_pca(emb.repartition(2), k=2)
    v2, c2, m2, t2 = fit_pca(emb.repartition(13), k=2)
    assert np.allclose(v1, v2, rtol=1e-9)
    assert np.allclose(m1, m2, rtol=1e-9)
    for i in range(2):
        assert min(np.linalg.norm(c1[i] - c2[i]), np.linalg.norm(c1[i] + c2[i])) < 1e-7
