"""Tests: ops.linalg (gram/norms/QR/SVD/rSVD) vs numpy oracles."""

from __future__ import annotations

import numpy as np
import pytest

from cuml_spark.ops.linalg import (
    col_norms,
    gram_matrix,
    gram_vector,
    randomized_svd,
    row_norms,
    svd_tall,
    tall_skinny_qr,
)

COLS = ["a", "b", "c"]


@pytest.fixture(scope="module")
def mat(spark):
    rng = np.random.default_rng(42)
    x = rng.normal(size=(500, 3)) @ np.diag([3.0, 1.0, 0.3])
    df = spark.createDataFrame(
        [tuple(float(v) for v in row) for row in x], "a double, b double, c double"
    )
    return df, x


def test_gram_matrix(mat):
    df, x = mat
    got = gram_matrix(df, COLS)
    np.testing.assert_allclose(got, x.T @ x, rtol=1e-9)


def test_gram_vector(mat):
    df, x = mat
    got = gram_vector(df, ["a", "b"], "c")
    np.testing.assert_allclose(got, x[:, :2].T @ x[:, 2], rtol=1e-9)


def test_row_norms(mat):
    df, x = mat
    got = np.array([r.row_norm for r in row_norms(df, COLS).collect()])
    want = np.linalg.norm(x, axis=1)
    np.testing.assert_allclose(sorted(got), sorted(want), rtol=1e-9)


def test_col_norms(mat):
    df, x = mat
    got = {r.col: r.norm for r in col_norms(df, COLS).collect()}
    for i, c in enumerate(COLS):
        assert got[c] == pytest.approx(np.linalg.norm(x[:, i]), rel=1e-9)


def test_tall_skinny_qr(mat):
    df, x = mat
    qdf, r = tall_skinny_qr(df, COLS)
    assert r.shape == (3, 3)
    assert np.allclose(r, np.triu(r))  # upper triangular
    q = np.array([[row[f"q_{j}"] for j in range(3)] for row in qdf.collect()])
    # QᵀQ = I and QR reproduces X up to row order (collect order is stable
    # within one partition set, so compare via the Gram instead)
    np.testing.assert_allclose(q.T @ q, np.eye(3), atol=1e-8)
    np.testing.assert_allclose(r.T @ r, x.T @ x, rtol=1e-9)


def test_svd_tall_matches_numpy(mat):
    df, x = mat
    _, sv, vt = svd_tall(df, COLS, k=3)
    want = np.linalg.svd(x, compute_uv=False)
    np.testing.assert_allclose(sv, want, rtol=1e-7)
    # Vᵀ rows span the same subspace (sign-free check)
    _, _, vt_np = np.linalg.svd(x, full_matrices=False)
    for i in range(3):
        assert abs(abs(vt[i] @ vt_np[i]) - 1.0) < 1e-6


def test_randomized_svd_top_k(mat):
    df, x = mat
    sv, vt = randomized_svd(df, COLS, k=2, seed=1)
    want = np.linalg.svd(x, compute_uv=False)[:2]
    np.testing.assert_allclose(sv, want, rtol=1e-6)
    assert vt.shape == (2, 3)
