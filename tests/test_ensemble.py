"""Random forest wrappers — S-class quality floors (reference pattern:
accuracy/R² thresholds, test_randomforest.py)."""

from __future__ import annotations

import pytest

from cuml_spark.datasets import make_blobs, make_regression
from cuml_spark.ensemble import RandomForestClassifier, RandomForestRegressor


def test_rf_classifier_separable(spark):
    df = make_blobs(spark, n_samples=2000, n_features=4, centers=2,
                    cluster_std=1.0, random_state=8)
    df = df.withColumn("label_d", df["label"].cast("double"))
    rf = RandomForestClassifier(n_estimators=10, max_depth=8, n_bins=16, random_state=1)
    rf.fit(df, ["f0", "f1", "f2", "f3"], "label_d")
    assert rf.score(df, ["f0", "f1", "f2", "f3"], "label_d") > 0.95
    assert rf.feature_importances_.shape == (4,)


def test_rf_regressor_fits_linear(spark):
    df = make_regression(spark, n_samples=3000, n_features=3, noise=1.0, random_state=6)
    rf = RandomForestRegressor(n_estimators=15, max_depth=10, n_bins=32, random_state=2)
    rf.fit(df, ["f0", "f1", "f2"], "y")
    assert rf.score(df, ["f0", "f1", "f2"], "y") > 0.8


def test_rf_mae_criterion_raises(spark):
    df = make_regression(spark, n_samples=100, n_features=2, random_state=1)
    rf = RandomForestRegressor(split_criterion=3)
    with pytest.raises(NotImplementedError):
        rf.fit(df, ["f0", "f1"], "y")
