"""SGD / CD / QN solvers + MBSGD facades — objective-level oracles."""

from __future__ import annotations

import numpy as np
import pytest

from cuml_spark.datasets import make_blobs, make_regression
from cuml_spark.linear_model import Lasso, LinearRegression, MBSGDClassifier, MBSGDRegressor
from cuml_spark.solvers import CD, QN, SGD


@pytest.fixture(scope="module")
def reg_df(spark):
    return make_regression(spark, n_samples=2000, n_features=3, noise=0.1,
                           random_state=4).cache()


@pytest.fixture(scope="module")
def cls_df(spark):
    # two separated blobs -> linearly separable binary problem
    centers = np.array([[-3.0, -3.0], [3.0, 3.0]])
    return make_blobs(spark, n_samples=1500, n_features=2, centers=centers,
                      cluster_std=0.8, random_state=8).cache()


def test_sgd_squared_converges_to_ols(reg_df):
    cols = ["f0", "f1", "f2"]
    ols = LinearRegression().fit(reg_df, cols, "y")
    sgd = SGD(loss="squared_loss", epochs=400, eta0=0.1, tol=1e-8).fit(reg_df, cols, "y")
    np.testing.assert_allclose(sgd.coef_, ols.coef_, atol=0.05)
    assert sgd.intercept_ == pytest.approx(ols.intercept_, abs=0.05)


def test_sgd_log_separates_blobs(cls_df):
    sgd = SGD(loss="log", epochs=200, eta0=0.5).fit(cls_df, ["f0", "f1"], "label")
    pred = sgd.predictClass(cls_df).selectExpr(
        "avg(cast(prediction = label as double)) as acc"
    ).first()["acc"]
    assert pred > 0.97


def test_sgd_hinge_separates_blobs(cls_df):
    sgd = SGD(loss="hinge", epochs=200, eta0=0.5).fit(cls_df, ["f0", "f1"], "label")
    pred = sgd.predictClass(cls_df).selectExpr(
        "avg(cast(prediction = label as double)) as acc"
    ).first()["acc"]
    assert pred > 0.97


def test_cd_matches_lasso(reg_df):
    cols = ["f0", "f1", "f2"]
    cd = CD(alpha=0.1, l1_ratio=1.0).fit(reg_df, cols, "y")
    lasso = Lasso(alpha=0.1).fit(reg_df, cols, "y")
    np.testing.assert_allclose(cd.coef_, lasso.coef_, rtol=1e-8)
    assert cd.intercept_ == pytest.approx(lasso.intercept_, rel=1e-8)


def test_qn_normal_matches_ols(reg_df):
    cols = ["f0", "f1", "f2"]
    qn = QN(loss="normal").fit(reg_df, cols, "y")
    ols = LinearRegression().fit(reg_df, cols, "y")
    np.testing.assert_allclose(qn.coef_, ols.coef_, rtol=1e-8)


def test_qn_sigmoid_classifies(cls_df):
    qn = QN(loss="sigmoid", l2_strength=1e-4).fit(cls_df, ["f0", "f1"], "label")
    pred = qn.predict(cls_df, out_col="p")
    acc = pred.selectExpr("avg(cast(p = label as double)) as acc").first()["acc"]
    assert acc > 0.97


def test_mbsgd_regressor_minibatch(reg_df):
    cols = ["f0", "f1", "f2"]
    m = MBSGDRegressor(epochs=300, eta0=0.05, batch_fraction=0.3, penalty="none", tol=1e-8).fit(
        reg_df, cols, "y"
    )
    ols = LinearRegression().fit(reg_df, cols, "y")
    np.testing.assert_allclose(m.coef_, ols.coef_, atol=1.0)


def test_mbsgd_classifier_minibatch(cls_df):
    m = MBSGDClassifier(loss="hinge", epochs=150, eta0=0.5, batch_fraction=0.5).fit(
        cls_df, ["f0", "f1"], "label"
    )
    acc = m.predict(cls_df).selectExpr(
        "avg(cast(prediction = label as double)) as acc"
    ).first()["acc"]
    assert acc > 0.95
