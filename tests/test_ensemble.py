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


def test_rf_mae_criterion_fits(spark):
    """split_criterion=3 (randomforestregressor.pyx:291 MAE) routes to the
    distributed histogram-MAE forest and learns a step function — the case
    where an MAE objective shines (median-robust to the noise tail)."""
    import numpy as np

    rng = np.random.RandomState(4)
    n = 3000
    X = rng.uniform(-2, 2, size=(n, 2))
    y = np.where(X[:, 0] > 0.5, 4.0, -1.0) + rng.standard_normal(n) * 0.2
    # heavy outlier tail: MAE splits shrug this off, MSE chases it
    y[: n // 50] += 50.0
    df = spark.createDataFrame(
        [(float(a), float(b), float(t)) for (a, b), t in zip(X, y)],
        "f0 double, f1 double, y double",
    )
    rf = RandomForestRegressor(split_criterion=3, n_estimators=5,
                               max_depth=4, n_bins=16, random_state=3)
    rf.fit(df, ["f0", "f1"], "y")
    pred = rf.predict(df, ["f0", "f1"]).toPandas()
    # median-based leaves: prediction for the clean bulk stays near ±{4,-1}
    clean = pred.iloc[n // 50:]
    lo = clean[clean["f0"] <= 0.4]["prediction"]
    hi = clean[clean["f0"] > 0.6]["prediction"]
    assert abs(float(lo.median()) - (-1.0)) < 0.5
    assert abs(float(hi.median()) - 4.0) < 0.5


def test_mae_forest_distributed_argmax_matches_driver(spark):
    """max_driver_hist_rows=0 forces the applyInPandas argmax path; it must
    produce bit-identical trees to the driver-side selection (same reducer,
    same tiebreaks)."""
    import numpy as np

    from cuml_spark.ensemble.mae_forest import MAERandomForestRegressor

    rng = np.random.RandomState(7)
    n = 1500
    X = rng.uniform(-1, 1, size=(n, 3))
    y = 2.0 * X[:, 0] - X[:, 2] + rng.standard_normal(n) * 0.1
    df = spark.createDataFrame(
        [(float(a), float(b), float(c), float(t)) for (a, b, c), t in zip(X, y)],
        "f0 double, f1 double, f2 double, y double",
    )
    kw = dict(n_estimators=3, max_depth=3, n_bins=8, n_y_bins=16,
              random_state=5)
    m_drv = MAERandomForestRegressor(max_driver_hist_rows=10**9, **kw)
    m_drv.fit(df, ["f0", "f1", "f2"], "y")
    m_dst = MAERandomForestRegressor(max_driver_hist_rows=0, **kw)
    m_dst.fit(df, ["f0", "f1", "f2"], "y")
    assert m_drv.trees_ == m_dst.trees_


def test_mae_forest_picks_exact_best_split(spark):
    """Depth-1 single tree with injected bin edges must choose the same
    (feature, bin) as an exact numpy replay of the binned-MAE objective."""
    import numpy as np

    from cuml_spark.ensemble.mae_forest import MAERandomForestRegressor, _hist_mae

    rng = np.random.RandomState(11)
    n = 800
    X = rng.uniform(0, 1, size=(n, 2))
    y = np.where(X[:, 1] > 0.37, 2.0, 0.0) + rng.standard_normal(n) * 0.05
    df = spark.createDataFrame(
        [(float(a), float(b), float(t)) for (a, b), t in zip(X, y)],
        "f0 double, f1 double, y double",
    )
    fe = [[-np.inf, *np.linspace(0.1, 0.9, 9), np.inf]] * 2
    ye = [-np.inf, *np.quantile(y, np.linspace(1 / 16, 15 / 16, 15)), np.inf]
    m = MAERandomForestRegressor(n_estimators=1, max_depth=1, n_bins=10,
                                 n_y_bins=16, min_samples_leaf=5, random_state=0)
    m.fit(df, ["f0", "f1"], "y", feature_edges=fe, y_edges=ye)
    (tree,) = m.trees_
    got_feat, got_bin = tree[0]

    # exact numpy replay of the same objective on the same bins
    inner = [np.asarray(e[1:-1]) for e in fe]
    B = np.column_stack([
        np.searchsorted(inner[j], X[:, j], side="right") for j in range(2)
    ])
    yb = np.searchsorted(np.asarray(ye[1:-1]), y, side="right")
    yvals = np.array([y[yb == i].mean() if (yb == i).any() else 0.0
                      for i in range(16)])
    best = (np.inf, None, None)
    for ft in range(2):
        for b in range(11):
            lmask = B[:, ft] <= b
            hl = np.bincount(yb[lmask], minlength=16).astype(float)
            hr = np.bincount(yb[~lmask], minlength=16).astype(float)
            mae_l, n_l = _hist_mae(hl, yvals)
            mae_r, n_r = _hist_mae(hr, yvals)
            if n_l < 5 or n_r < 5:
                continue
            s = (n_l * mae_l + n_r * mae_r) / n
            if s < best[0] - 1e-12:
                best = (s, ft, b)
    assert (got_feat, got_bin) == (best[1], best[2])


def test_mae_forest_max_features_per_split(spark):
    """max_features subsamples features per (tree, node) deterministically
    (reference randomforestregressor.pyx:291): every internal node's chosen
    feature must come from that node's seeded subset, and the fit must be
    replayable (two fits produce identical trees)."""
    import numpy as np

    from cuml_spark.ensemble.mae_forest import (
        MAERandomForestRegressor, _node_feature_subset, _resolve_m_features,
    )

    assert _resolve_m_features(0.5, 3) == 2
    assert _resolve_m_features("sqrt", 9) == 3
    assert _resolve_m_features(2, 3) == 2
    assert _resolve_m_features("auto", 5) == 5

    rng = np.random.RandomState(3)
    n = 1200
    X = rng.uniform(-1, 1, size=(n, 3))
    y = 2.0 * X[:, 0] - X[:, 1] + 0.5 * X[:, 2]
    df = spark.createDataFrame(
        [(float(a), float(b), float(c), float(t)) for (a, b, c), t in zip(X, y)],
        "f0 double, f1 double, f2 double, y double",
    )
    kw = dict(n_estimators=3, max_depth=3, n_bins=8, n_y_bins=16,
              random_state=9, max_features=1)  # m=1: subset is fully forced
    m1 = MAERandomForestRegressor(**kw).fit(df, ["f0", "f1", "f2"], "y")
    m2 = MAERandomForestRegressor(**kw).fit(df, ["f0", "f1", "f2"], "y")
    assert m1.trees_ == m2.trees_
    n_internal = 0
    for t, tree in enumerate(m1.trees_):
        for nd, entry in tree.items():
            if isinstance(entry, tuple):
                n_internal += 1
                (allowed,) = _node_feature_subset(t, nd, 3, 1, 9)
                assert entry[0] == allowed  # split used the one allowed feature
    assert n_internal > 0
    # and all-features fit differs (with m=1 some nodes are denied f0)
    m_all = MAERandomForestRegressor(**{**kw, "max_features": 1.0}).fit(
        df, ["f0", "f1", "f2"], "y")
    assert m_all.trees_ != m1.trees_
