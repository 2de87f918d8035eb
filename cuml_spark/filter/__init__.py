"""``cuml_spark.filter`` — import-path parity with the reference.

Reference: python/cuml/filter/__init__.py:17 exposes ``KalmanFilter``
(kalman_filter.pyx) under ``cuml.filter``; the implementation here lives in
``cuml_spark.tsa.kalman`` (batch + streaming Kalman over applyInPandas).
This alias lets ``from cuml.filter import KalmanFilter`` port by renaming
the package only, same pattern as ``cuml_spark.dask``.
"""

from cuml_spark.tsa.kalman import KalmanFilter  # noqa: F401

__all__ = ["KalmanFilter"]
