"""PCA / TruncatedSVD vs numpy eigendecomposition oracles (D up to sign —
the reference itself sign-flips, pca.h:134)."""

from __future__ import annotations

import numpy as np
import pytest

from cuml_spark.decomposition import PCA, TruncatedSVD

COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


@pytest.fixture(scope="module")
def X(lineitem):
    return lineitem.select(COLS).toPandas().to_numpy()


def test_pca_matches_numpy(lineitem, X):
    pca = PCA(n_components=3).fit(lineitem, COLS)
    cov = np.cov(X, rowvar=False)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1]
    evals, evecs = evals[order], evecs[:, order]
    np.testing.assert_allclose(pca.explained_variance_, evals[:3], rtol=1e-8)
    np.testing.assert_allclose(pca.mean_, X.mean(axis=0), rtol=1e-9)
    for i in range(3):  # compare up to sign
        dot = abs(pca.components_[i] @ evecs[:, i])
        assert dot == pytest.approx(1.0, abs=1e-8)
    np.testing.assert_allclose(
        pca.singular_values_, np.sqrt(evals[:3] * (len(X) - 1)), rtol=1e-8
    )
    assert pca.noise_variance_ == pytest.approx(evals[3:].mean(), rel=1e-8)


def test_pca_transform_inverse_roundtrip(lineitem, X):
    pca = PCA(n_components=4).fit(lineitem, COLS)  # full rank → lossless
    projected = pca.transform(lineitem.limit(50))
    restored = pca.inverse_transform(projected).select(COLS).toPandas().to_numpy()
    original = lineitem.limit(50).select(COLS).toPandas().to_numpy()
    np.testing.assert_allclose(restored, original, rtol=1e-6, atol=1e-6)


def test_pca_whiten(lineitem, X):
    pca = PCA(n_components=2, whiten=True).fit(lineitem, COLS)
    out = pca.transform(lineitem).select("pc0", "pc1").toPandas().to_numpy()
    np.testing.assert_allclose(out.var(axis=0, ddof=1), [1.0, 1.0], rtol=1e-6)


def test_tsvd_matches_numpy(lineitem, X):
    tsvd = TruncatedSVD(n_components=2).fit(lineitem, COLS)
    _, s, vt = np.linalg.svd(X, full_matrices=False)
    np.testing.assert_allclose(tsvd.singular_values_, s[:2], rtol=1e-8)
    for i in range(2):
        assert abs(tsvd.components_[i] @ vt[i]) == pytest.approx(1.0, abs=1e-8)


def test_tsvd_transform(lineitem, X):
    tsvd = TruncatedSVD(n_components=2).fit(lineitem, COLS)
    out = tsvd.transform(lineitem.limit(20)).select("sv0", "sv1").toPandas().to_numpy()
    expected = X[:0]  # recompute from the same 20 rows
    first20 = lineitem.limit(20).select(COLS).toPandas().to_numpy()
    np.testing.assert_allclose(out, first20 @ tsvd.components_.T, rtol=1e-9)
