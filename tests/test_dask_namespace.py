"""Import-path parity with the reference's MNMG tier (cuml.dask, SURVEY §2.5):
reference-style distributed imports must resolve to the same (already
distributed) estimator classes."""

from __future__ import annotations


def test_dask_namespace_reexports_same_classes():
    import cuml_spark
    import cuml_spark.dask as dsk

    assert dsk.cluster.KMeans is cuml_spark.KMeans
    assert dsk.cluster.DBSCAN is cuml_spark.DBSCAN
    assert dsk.decomposition.PCA is cuml_spark.PCA
    assert dsk.decomposition.TruncatedSVD is cuml_spark.TruncatedSVD
    assert dsk.ensemble.RandomForestClassifier is cuml_spark.RandomForestClassifier
    assert dsk.ensemble.RandomForestRegressor is cuml_spark.RandomForestRegressor
    assert dsk.linear_model.LinearRegression is cuml_spark.LinearRegression
    assert dsk.neighbors.NearestNeighbors is cuml_spark.NearestNeighbors
    assert dsk.datasets.make_blobs is cuml_spark.make_blobs


def test_dask_submodule_direct_imports():
    from cuml_spark.dask.cluster import KMeans
    from cuml_spark.dask.datasets import make_blobs
    from cuml_spark.dask.ensemble import RandomForestRegressor

    assert callable(make_blobs)
    assert KMeans(n_clusters=2).n_clusters == 2
    assert RandomForestRegressor(n_estimators=3).n_estimators == 3


def test_filter_namespace_reexports_kalman():
    # reference python/cuml/filter/__init__.py:17 exposes KalmanFilter
    import cuml_spark
    from cuml_spark.filter import KalmanFilter

    assert KalmanFilter is cuml_spark.KalmanFilter


def test_ts_legacy_namespace():
    # reference python/cuml/ts/ is the legacy alias next to cuml/tsa/
    import cuml_spark.ts as ts
    from cuml_spark.tsa.arima import ARIMA, grid_search
    from cuml_spark.tsa.holtwinters import ExponentialSmoothing
    from cuml_spark.tsa.kalman import KalmanFilter

    assert ts.ARIMA is ARIMA
    assert ts.grid_search is grid_search
    assert ts.ExponentialSmoothing is ExponentialSmoothing
    assert ts.KalmanFilter is KalmanFilter
    assert callable(ts.kpss_statistic) and callable(ts.stationarity)
