"""SVC — KKT-condition and separation oracles (no sklearn in the env)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cuml_spark.datasets import make_blobs
from cuml_spark.svm import SVC
from cuml_spark.svm.svc import _kernel


@pytest.fixture(scope="module")
def sep_df(spark):
    centers = np.array([[-2.5, -2.5], [2.5, 2.5]])
    return make_blobs(spark, n_samples=300, n_features=2, centers=centers,
                      cluster_std=0.7, random_state=10).cache()


@pytest.fixture(scope="module")
def xor_df(spark):
    """XOR layout — linearly inseparable, rbf-separable."""
    centers = np.array([[-2, -2], [2, 2], [-2, 2], [2, -2]])
    df = make_blobs(spark, n_samples=400, n_features=2, centers=centers,
                    cluster_std=0.5, random_state=11)
    return df.withColumn("y", (F.col("label") < 2).cast("double")).cache()


def test_linear_svc_separates(sep_df):
    svc = SVC(kernel="linear", C=1.0).fit(sep_df, ["f0", "f1"], "label")
    assert svc.score(sep_df, ["f0", "f1"], "label") > 0.98
    assert 0 < svc.n_support_ < 300  # sparse solution


def test_rbf_svc_solves_xor(xor_df):
    svc = SVC(kernel="rbf", C=10.0, gamma=0.5).fit(xor_df, ["f0", "f1"], "y")
    assert svc.score(xor_df, ["f0", "f1"], "y") > 0.97


def test_linear_svc_fails_xor_rbf_needed(xor_df):
    lin = SVC(kernel="linear", C=1.0).fit(xor_df, ["f0", "f1"], "y")
    assert lin.score(xor_df, ["f0", "f1"], "y") < 0.8


def test_kkt_conditions(sep_df):
    """Dual solution satisfies the KKT system within tolerance."""
    svc = SVC(kernel="rbf", C=1.0, gamma=0.5, max_iter=500).fit(
        sep_df, ["f0", "f1"], "label"
    )
    pdf = sep_df.toPandas()
    X = pdf[["f0", "f1"]].to_numpy()
    y = 2.0 * pdf["label"].to_numpy() - 1.0
    K = _kernel(X, svc.support_vectors_, "rbf", 0.5, 3, 0.0)
    f = K @ svc.dual_coef_[0] + svc.intercept_
    margins = y * f
    # all alphas within box [0, C]
    alpha = np.abs(svc.dual_coef_[0])
    assert (alpha >= -1e-9).all() and (alpha <= svc.C + 1e-9).all()
    # non-SV points (alpha=0) must have margin >= 1 - tol (up to a few strays)
    sv_set = set(svc.support_.tolist())
    non_sv = np.array([i for i in range(len(y)) if i not in sv_set])
    viol = (margins[non_sv] < 1.0 - 0.05).mean()
    assert viol < 0.05


def test_rff_mode_approximates_rbf(xor_df):
    svc = SVC(kernel="rbf", C=10.0, gamma=0.5, mode="rff", n_rff=200).fit(
        xor_df, ["f0", "f1"], "y"
    )
    assert svc.score(xor_df, ["f0", "f1"], "y") > 0.9


def test_poly_and_sigmoid_run(sep_df):
    for kern in ("poly", "sigmoid"):
        svc = SVC(kernel=kern, C=1.0, gamma=0.5).fit(sep_df, ["f0", "f1"], "label")
        assert svc.score(sep_df, ["f0", "f1"], "label") > 0.9


def test_exact_mode_row_cap(spark):
    import numpy as np
    import pytest as _pt

    from cuml_spark.svm import SVC

    rng = np.random.RandomState(0)
    rows = [(float(rng.normal()), float(rng.normal()), float(i % 2))
            for i in range(200)]
    df = spark.createDataFrame(rows, "x1 double, x2 double, y double")
    with _pt.raises(ValueError, match="rff"):
        SVC(kernel="linear", max_exact_rows=100).fit(df, ["x1", "x2"], "y")
