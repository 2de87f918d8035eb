"""Hyperparameter-vocabulary parity: every estimator ctor must accept the
REFERENCE's full parameter list (defaults as shipped, handle included), so
reference-calling code ports without touching call sites.

Parameter lists transcribed from the reference .pyx ctors (file:line noted
per entry).  GPU-execution knobs with no Spark analog (n_streams,
max_mbytes_per_batch, split_algo, …) are accepted and stored inert by
``Base`` — the same accept-and-ignore contract the reference applies to its
sklearn-compat args (randomforestclassifier.pyx warns-and-drops n_jobs etc.).
"""

from __future__ import annotations

import pytest

import cuml_spark as cs

# (class name, reference file:line, ctor kwargs at reference defaults)
CASES = [
    ("KMeans", "cluster/kmeans.pyx:297", dict(
        handle=None, n_clusters=8, max_iter=300, tol=1e-4, verbose=0,
        random_state=1, init="scalable-k-means++", oversampling_factor=2.0,
        max_samples_per_batch=1 << 15)),
    ("DBSCAN", "cluster/dbscan.pyx:124", dict(
        eps=0.5, handle=None, min_samples=5, verbose=False,
        max_mbytes_per_batch=None)),
    ("PCA", "decomposition/pca.pyx:281", dict(
        copy=True, handle=None, iterated_power=15, n_components=1,
        random_state=None, svd_solver="auto", tol=1e-7, verbose=False,
        whiten=False)),
    ("TruncatedSVD", "decomposition/tsvd.pyx:160", dict(
        algorithm="full", handle=None, n_components=1, n_iter=15,
        random_state=None, tol=1e-7, verbose=False)),
    ("LinearRegression", "linear_model/linear_regression.pyx:124", dict(
        algorithm="eig", fit_intercept=True, normalize=False, handle=None)),
    ("Ridge", "linear_model/ridge.pyx:128", dict(
        alpha=1.0, solver="eig", fit_intercept=True, normalize=False,
        handle=None)),
    ("Lasso", "linear_model/lasso.pyx:92", dict(
        alpha=1.0, fit_intercept=True, normalize=False, max_iter=1000,
        tol=1e-3, selection="cyclic")),
    ("ElasticNet", "linear_model/elastic_net.pyx:96", dict(
        alpha=1.0, l1_ratio=0.5, fit_intercept=True, normalize=False,
        max_iter=1000, tol=1e-3, selection="cyclic")),
    ("LogisticRegression", "linear_model/logistic_regression.pyx:135", dict(
        penalty="l2", tol=1e-4, C=1.0, fit_intercept=True, class_weight=None,
        max_iter=1000, verbose=0, l1_ratio=None, solver="qn", handle=None)),
    ("MBSGDClassifier", "linear_model/mbsgd_classifier.pyx:82", dict(
        loss="hinge", penalty="l2", alpha=0.0001, l1_ratio=0.15,
        fit_intercept=True, epochs=1000, tol=1e-3, shuffle=True,
        learning_rate="constant", eta0=0.001, power_t=0.5, batch_size=32,
        n_iter_no_change=5, handle=None)),
    ("MBSGDRegressor", "linear_model/mbsgd_regressor.pyx:80", dict(
        loss="squared_loss", penalty="l2", alpha=0.0001, l1_ratio=0.15,
        fit_intercept=True, epochs=1000, tol=1e-3, shuffle=True,
        learning_rate="constant", eta0=0.001, power_t=0.5, batch_size=32,
        n_iter_no_change=5, handle=None)),
    ("SGD", "solvers/sgd.pyx:93", dict(
        loss="squared_loss", penalty="none", alpha=0.0001, l1_ratio=0.15,
        fit_intercept=True, epochs=1000, tol=1e-3, shuffle=True,
        learning_rate="constant", eta0=0.001, power_t=0.5, batch_size=32,
        n_iter_no_change=5, handle=None)),
    ("CD", "solvers/cd.pyx:76", dict(
        loss="squared_loss", alpha=0.0001, l1_ratio=0.15, fit_intercept=True,
        normalize=False, max_iter=1000, tol=1e-3, shuffle=True, handle=None)),
    ("QN", "solvers/qn.pyx:215", dict(
        loss="sigmoid", fit_intercept=True, l1_strength=0.0, l2_strength=0.0,
        max_iter=1000, tol=1e-3, linesearch_max_iter=50, lbfgs_memory=5,
        verbose=False, handle=None)),
    ("RandomForestClassifier", "ensemble/randomforestclassifier.pyx:150", dict(
        n_estimators=10, max_depth=16, handle=None, max_features="auto",
        n_bins=8, n_streams=8, split_algo=1, split_criterion=0,
        min_rows_per_node=2, bootstrap=True, bootstrap_features=False,
        type_model="classifier", verbose=False, rows_sample=1.0,
        max_leaves=-1, quantile_per_tree=False, gdf_datatype=None,
        criterion=None, min_samples_leaf=None, min_weight_fraction_leaf=None,
        max_leaf_nodes=None, min_impurity_decrease=0.0,
        min_impurity_split=None, oob_score=None, n_jobs=None,
        random_state=None, warm_start=None, class_weight=None, seed=-1)),
    ("RandomForestRegressor", "ensemble/randomforestregressor.pyx:136", dict(
        n_estimators=10, max_depth=16, handle=None, max_features="auto",
        n_bins=8, n_streams=8, split_algo=1, split_criterion=2,
        bootstrap=True, bootstrap_features=False, verbose=False,
        min_rows_per_node=2, rows_sample=1.0, max_leaves=-1,
        accuracy_metric="mse", min_samples_leaf=None,
        min_weight_fraction_leaf=None, n_jobs=None, max_leaf_nodes=None,
        min_impurity_decrease=0.0, min_impurity_split=None, oob_score=None,
        random_state=None, warm_start=None, class_weight=None,
        quantile_per_tree=False, criterion=None, seed=-1)),
    ("NearestNeighbors", "neighbors/nearest_neighbors.pyx:96", dict(
        n_neighbors=5, n_gpus=1, devices=None, verbose=False,
        should_downcast=None, handle=None, algorithm="full")),
    ("UMAP", "manifold/umap.pyx:240", dict(
        n_neighbors=15, n_components=2, n_epochs=500, learning_rate=1.0,
        min_dist=0.1, spread=1.0, set_op_mix_ratio=1.0,
        local_connectivity=1.0, repulsion_strength=1.0,
        negative_sample_rate=5, transform_queue_size=4.0, init="spectral",
        verbose=False, callback=None)),
    ("TSNE", "manifold/t_sne.pyx:186", dict(
        n_components=2, perplexity=30.0, early_exaggeration=12.0,
        learning_rate=200.0, n_iter=1000, n_iter_without_progress=300,
        min_grad_norm=1e-07, metric="euclidean", init="random", verbose=0,
        random_state=None, method="barnes_hut", angle=0.5,
        learning_rate_method="adaptive", n_neighbors=90,
        perplexity_max_iter=100, exaggeration_iter=250, pre_momentum=0.5,
        post_momentum=0.8, should_downcast=True, handle=None)),
    ("GaussianRandomProjection", "random_projection/random_projection.pyx:429", dict(
        handle=None, n_components="auto", eps=0.1, random_state=None,
        verbose=False)),
    ("SparseRandomProjection", "random_projection/random_projection.pyx:553", dict(
        handle=None, n_components="auto", density="auto", eps=0.1,
        dense_output=True, random_state=None, verbose=False)),
]


@pytest.mark.parametrize("name,ref,kwargs", CASES, ids=[c[0] for c in CASES])
def test_ctor_accepts_reference_vocabulary(name, ref, kwargs):
    cls = getattr(cs, name)
    est = cls(**kwargs)
    # the semantic params round-trip through get_params; compat-only knobs
    # are stored as attributes
    for k, v in kwargs.items():
        if k in ("handle",):
            continue
        assert hasattr(est, k), f"{name}: reference param {k!r} ({ref}) not stored"


def test_kalman_reference_vocabulary():
    # filter/kalman_filter.pyx:197 — positional dims + solver/precision/seed
    kf = cs.KalmanFilter(4, 2, solver="long_form")
    assert kf.dim_x == 4 and kf.dim_z == 2


# Intentional default-value deviations from the reference, each with the
# engine-architecture reason.  Everything else must match the reference's
# shipped default exactly.
ALLOWED_DEFAULT_DEVIATIONS = {
    # deterministic-by-default: reference random_state=None draws device
    # entropy; a distributed engine defaults to a fixed seed so re-runs of
    # the same plan reproduce (tests/oracles depend on it)
    ("KMeans", "random_state"), ("TSNE", "random_state"),
    ("GaussianRandomProjection", "random_state"),
    ("SparseRandomProjection", "random_state"),
    ("RandomForestClassifier", "random_state"),
    ("RandomForestRegressor", "random_state"),
    # full-batch distributed gradient: one aggregate job per epoch replaces
    # the reference's 32-row device minibatch, so fewer/larger steps
    # (epochs 100 vs 1000, eta0 0.01 vs 0.001, batch_size None vs 32) are
    # the Spark-appropriate defaults — a 32-row sample would still scan the
    # table every step
    ("MBSGDClassifier", "epochs"), ("MBSGDClassifier", "eta0"),
    ("MBSGDClassifier", "batch_size"),
    ("MBSGDRegressor", "epochs"), ("MBSGDRegressor", "eta0"),
    ("MBSGDRegressor", "batch_size"),
    ("SGD", "epochs"), ("SGD", "eta0"), ("SGD", "batch_size"),
    # 'full' is the reference's name for brute force; the ctor aliases it
    ("NearestNeighbors", "algorithm"),
    # min_rows=None defers to each backend's own default (MLlib 1, MAE 5)
    ("RandomForestClassifier", "min_rows_per_node"),
    ("RandomForestRegressor", "min_rows_per_node"),
}


@pytest.mark.parametrize("name,ref,kwargs", CASES, ids=[c[0] for c in CASES])
def test_ctor_defaults_match_reference(name, ref, kwargs):
    """Constructing with NO arguments must reproduce the reference's default
    hyperparameters (inert compat knobs excluded — they are only stored when
    passed; deviations above are each architecture-motivated)."""
    from cuml_spark.core.base import _COMPAT_INERT_PARAMS

    est = getattr(cs, name)()
    for k, v in kwargs.items():
        if k in ("handle",) or k in _COMPAT_INERT_PARAMS:
            continue
        if (name, k) in ALLOWED_DEFAULT_DEVIATIONS:
            continue
        ours = getattr(est, k, "<missing>")
        if ours is None and v is None:
            continue
        if isinstance(v, (int, float)) and isinstance(ours, (int, float)) \
                and not isinstance(v, bool) and float(ours) == float(v):
            continue
        assert ours == v, f"{name}.{k}: reference default {v!r} ({ref}), got {ours!r}"
