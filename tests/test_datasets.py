"""Dataset generators: determinism and statistical shape."""

from __future__ import annotations

import numpy as np
import pytest

from cuml_spark.datasets import make_blobs, make_regression


def test_blobs_deterministic_across_partitioning(spark):
    a = make_blobs(spark, n_samples=500, n_features=3, centers=4, random_state=9,
                   partitions=2).orderBy("id").collect()
    b = make_blobs(spark, n_samples=500, n_features=3, centers=4, random_state=9,
                   partitions=16).orderBy("id").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_blobs_shape_and_labels(spark):
    df = make_blobs(spark, n_samples=1000, n_features=2, centers=3, random_state=1)
    assert df.count() == 1000
    labels = {r["label"] for r in df.select("label").distinct().collect()}
    assert labels == {0, 1, 2}


def test_blobs_cluster_structure(spark):
    df = make_blobs(spark, n_samples=3000, n_features=2, centers=2,
                    cluster_std=0.5, random_state=3)
    pdf = df.toPandas()
    c0 = pdf[pdf.label == 0][["f0", "f1"]].mean().to_numpy()
    c1 = pdf[pdf.label == 1][["f0", "f1"]].mean().to_numpy()
    # centers drawn in (-10,10); stds 0.5 → empirical centers far apart
    assert np.linalg.norm(c0 - c1) > 2.0


def test_regression_recoverable_coefficients(spark):
    df, w = make_regression(spark, n_samples=5000, n_features=3, noise=0.1,
                            bias=2.0, random_state=11, coef=True)
    from cuml_spark.linear_model import LinearRegression

    model = LinearRegression().fit(df, ["f0", "f1", "f2"], "y")
    np.testing.assert_allclose(model.coef_, w, rtol=1e-2)
    assert model.intercept_ == pytest.approx(2.0, abs=0.05)


def test_regression_noiseless_exact(spark):
    df, w = make_regression(spark, n_samples=1000, n_features=2, noise=0.0,
                            random_state=4, coef=True)
    pdf = df.toPandas()
    np.testing.assert_allclose(
        pdf[["f0", "f1"]].to_numpy() @ w, pdf["y"].to_numpy(), rtol=1e-12
    )


def test_mvg_moments_and_determinism(spark):
    from cuml_spark.datasets import make_mvg

    mu = np.array([1.0, -2.0])
    sigma = np.array([[2.0, 0.8], [0.8, 1.0]])
    df = make_mvg(spark, n_samples=20000, mu=mu, sigma=sigma, random_state=5)
    pdf = df.toPandas()
    emp_mu = pdf[["f0", "f1"]].mean().to_numpy()
    emp_cov = np.cov(pdf[["f0", "f1"]].to_numpy().T)
    np.testing.assert_allclose(emp_mu, mu, atol=0.05)
    np.testing.assert_allclose(emp_cov, sigma, atol=0.08)
    # blockwise-deterministic: same seed reproduces row 0 exactly,
    # regardless of partitioning
    r1 = df.filter(df.id == 0).first()
    r2 = make_mvg(spark, n_samples=20000, mu=mu, sigma=sigma,
                  random_state=5, partitions=7).filter("id = 0").first()
    assert r1["f0"] == r2["f0"] and r1["f1"] == r2["f1"]


def test_mvg_bad_sigma_raises(spark):
    from cuml_spark.datasets import make_mvg

    with pytest.raises(ValueError):
        make_mvg(spark, 10, np.zeros(2), np.eye(3))
