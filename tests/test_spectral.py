"""Spectral clustering/embedding (spectral.hpp:40-114 parity).

Oracle strategy (scipy-free): three well-separated Gaussian blobs — spectral
clustering must recover the generating partition exactly (ARI == 1); the
eigensolver is checked against numpy's dense eigh on the same graph.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cuml_spark.cluster import SpectralClustering, spectral_embedding
from cuml_spark.cluster.spectral import _topk_eig_coo
from cuml_spark.metrics import adjusted_rand_score


def _blob_df(spark, n_per=60, seed=3):
    rng = np.random.RandomState(seed)
    centers = np.array([[0.0, 0.0], [12.0, 0.0], [0.0, 12.0]])
    rows = []
    for g, c in enumerate(centers):
        pts = rng.normal(scale=0.6, size=(n_per, 2)) + c
        rows += [(g * n_per + i, float(p[0]), float(p[1]), g)
                 for i, p in enumerate(pts)]
    return spark.createDataFrame(rows, "pid long, x double, y double, grp int")


def test_topk_eig_matches_dense():
    rng = np.random.RandomState(0)
    n = 40
    A = np.zeros((n, n))
    for _ in range(160):
        i, j = rng.randint(0, n, 2)
        if i != j:
            A[i, j] = A[j, i] = rng.uniform(0.1, 1.0)
    rows, cols = np.nonzero(A)
    vals = A[rows, cols]
    deg = A.sum(1)
    deg[deg == 0] = 1.0
    dm = 1.0 / np.sqrt(deg)
    S = np.eye(n) + (dm[:, None] * A) * dm[None, :]
    w_ref, _ = np.linalg.eigh(S)
    Y, w = _topk_eig_coo(n, rows, cols, vals, 4, n_iter=300, seed=1)
    assert np.allclose(sorted(w, reverse=True), w_ref[::-1][:4], atol=1e-6)
    # Y columns are eigenvectors: S @ y ≈ w * y
    for j in range(4):
        assert np.allclose(S @ Y[:, j], w[j] * Y[:, j], atol=1e-5)


def test_spectral_clustering_recovers_blobs(spark):
    df = _blob_df(spark)
    sc = SpectralClustering(n_clusters=3, n_neighbors=8, random_state=5)
    out = sc.fit_predict(df, ["x", "y"], "pid")
    joined = df.join(out, "pid")
    ari = adjusted_rand_score(joined, "grp", "label")
    assert ari == pytest.approx(1.0)


def test_spectral_embedding_separates(spark):
    df = _blob_df(spark)
    emb = spectral_embedding(df, ["x", "y"], "pid", n_components=2,
                             n_neighbors=8, seed=5)
    assert emb.count() == df.count()
    assert set(emb.columns) == {"pid", "se0", "se1"}
    # within-blob embedding spread must be tiny vs between-blob distance
    j = df.join(emb, "pid")
    stats = j.groupBy("grp").agg(
        F.avg("se0").alias("m0"), F.avg("se1").alias("m1"),
        F.stddev("se0").alias("s0"), F.stddev("se1").alias("s1"),
    ).collect()
    ms = np.array([[r["m0"], r["m1"]] for r in stats])
    spread = max(max(r["s0"] or 0, r["s1"] or 0) for r in stats)
    dmin = min(np.linalg.norm(ms[a] - ms[b])
               for a in range(3) for b in range(a + 1, 3))
    assert dmin > 5 * spread


def test_landmark_mode_matches_partition(spark):
    df = _blob_df(spark, n_per=80)
    sc = SpectralClustering(
        n_clusters=3, mode="landmark", n_landmarks=60, random_state=5
    )
    out = sc.fit_predict(df, ["x", "y"], "pid")
    joined = df.join(out, "pid")
    ari = adjusted_rand_score(joined, "grp", "label")
    assert ari == pytest.approx(1.0)


def test_umap_spectral_init_large_n_no_fallback(spark):
    # >2000 points: spectral init must now run (used to silently fall back)
    from cuml_spark.manifold.umap import UMAP

    rng = np.random.RandomState(0)
    n = 2200
    X = rng.normal(size=(n, 8))
    X[n // 2:, :] += 6.0
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(n)],
        "pid long, x array<double>",
    )
    um = UMAP(n_neighbors=8, n_epochs=5, init="spectral", random_state=1)
    out = um.fit_transform(df, vec_col="x", id_col="pid")
    assert out.count() == n
