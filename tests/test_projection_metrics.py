"""Random projections + silhouette + trustworthiness vs numpy oracles."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cuml_spark.datasets import make_blobs
from cuml_spark.decomposition import (
    GaussianRandomProjection,
    SparseRandomProjection,
    johnson_lindenstrauss_min_dim,
)
from cuml_spark.metrics import silhouette_samples, silhouette_score, trustworthiness


def test_jl_min_dim_formula():
    # same closed form as the reference helper (random_projection.pyx:72)
    n, eps = 10000, 0.1
    expect = int(4 * np.log(n) / (eps**2 / 2 - eps**3 / 3))
    assert johnson_lindenstrauss_min_dim(n, eps) == expect


def test_gaussian_projection_matches_numpy(embeddings):
    rp = GaussianRandomProjection(n_components=8, random_state=3).fit(
        embeddings, vec_col="embedding"
    )
    out = (
        rp.transform(
            embeddings.withColumn("embedding", F.col("embedding").cast("array<double>"))
        )
        .select("vec_id", "projection")
        .toPandas()
        .sort_values("vec_id")
    )
    pdf = embeddings.toPandas().sort_values("vec_id")
    X = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
    expect = X @ rp.components_
    got = np.vstack(out["projection"].to_numpy())
    np.testing.assert_allclose(got, expect, rtol=1e-9)


def test_sparse_projection_density_and_determinism(embeddings):
    rp = SparseRandomProjection(n_components=8, random_state=7).fit(
        embeddings, vec_col="embedding"
    )
    M = rp.components_
    density = 1.0 / np.sqrt(M.shape[0])
    frac_nonzero = (M != 0).mean()
    assert frac_nonzero == pytest.approx(density, rel=0.5)
    rp2 = SparseRandomProjection(n_components=8, random_state=7).fit(
        embeddings, vec_col="embedding"
    )
    np.testing.assert_array_equal(M, rp2.components_)


def test_gaussian_projection_preserves_distances(embeddings):
    """JL property: pairwise sq-distances preserved within ~eps on average."""
    k = 32
    rp = GaussianRandomProjection(n_components=k, random_state=1).fit(
        embeddings, vec_col="embedding"
    )
    pdf = embeddings.limit(50).toPandas()
    X = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
    Y = X @ rp.components_
    dx = ((X[:, None] - X[None]) ** 2).sum(-1)
    dy = ((Y[:, None] - Y[None]) ** 2).sum(-1)
    mask = dx > 0
    ratio = dy[mask] / dx[mask]
    assert 0.8 < ratio.mean() < 1.2


def _np_silhouette(X, labels):
    n = len(X)
    d = np.sqrt(((X[:, None] - X[None]) ** 2).sum(-1))
    s = np.zeros(n)
    for i in range(n):
        same = (labels == labels[i]) & (np.arange(n) != i)
        if same.sum() == 0:
            s[i] = 0.0
            continue
        a = d[i, same].mean()
        b = min(
            d[i, labels == l].mean() for l in set(labels) if l != labels[i]
        )
        s[i] = (b - a) / max(a, b)
    return s


def test_silhouette_matches_numpy(spark):
    df = make_blobs(spark, n_samples=150, n_features=2, centers=3,
                    cluster_std=1.0, random_state=4).cache()
    pdf = df.toPandas().sort_values("id")
    X = pdf[["f0", "f1"]].to_numpy()
    labels = pdf["label"].to_numpy()
    got = (
        silhouette_samples(df, ["f0", "f1"], "label", "id")
        .toPandas().sort_values("id")["silhouette"].to_numpy()
    )
    np.testing.assert_allclose(got, _np_silhouette(X, labels), rtol=1e-9)
    score = silhouette_score(df, ["f0", "f1"], "label", "id")
    assert score == pytest.approx(_np_silhouette(X, labels).mean(), rel=1e-9)


def _np_trustworthiness(X, Y, k):
    n = len(X)
    dx = ((X[:, None] - X[None]) ** 2).sum(-1)
    dy = ((Y[:, None] - Y[None]) ** 2).sum(-1)
    np.fill_diagonal(dx, np.inf)
    np.fill_diagonal(dy, np.inf)
    # ranks with id tiebreak: argsort of (dist, id)
    pen = 0.0
    for i in range(n):
        ox = np.lexsort((np.arange(n), dx[i]))
        oy = np.lexsort((np.arange(n), dy[i]))
        r_orig = np.empty(n); r_orig[ox] = np.arange(1, n + 1)
        knn_emb = oy[:k]
        for j in knn_emb:
            if r_orig[j] > k:
                pen += r_orig[j] - k
    return 1.0 - 2.0 / (n * k * (2 * n - 3 * k - 1)) * pen


def test_trustworthiness_perfect_for_identity(spark):
    df = make_blobs(spark, n_samples=80, n_features=3, centers=3, random_state=2)
    pts = df.select("id", F.array("f0", "f1", "f2").alias("x"))
    assert trustworthiness(pts, pts, n_neighbors=5, id_col="id") == pytest.approx(1.0)


def test_trustworthiness_matches_numpy(spark):
    df = make_blobs(spark, n_samples=100, n_features=4, centers=3, random_state=6).cache()
    pdf = df.toPandas().sort_values("id")
    X = pdf[["f0", "f1", "f2", "f3"]].to_numpy()
    Y = X[:, :2]  # crude embedding: first two coords
    orig = df.select("id", F.array("f0", "f1", "f2", "f3").alias("x"))
    emb = df.select("id", F.array("f0", "f1").alias("x"))
    got = trustworthiness(orig, emb, n_neighbors=5, id_col="id")
    assert got == pytest.approx(_np_trustworthiness(X, Y, 5), rel=1e-9)
