"""``cuml_spark.ts`` — legacy time-series alias, import-path parity.

Reference: python/cuml/ts/__init__.py is the (empty) legacy alias package
kept alongside ``cuml.tsa``; user code written against the old path does
``import cuml.ts`` and reaches the tsa estimators through it.  Re-export
the tsa surface so both spellings work here.
"""

from cuml_spark.tsa.arima import ARIMA, grid_search  # noqa: F401
from cuml_spark.tsa.holtwinters import ExponentialSmoothing  # noqa: F401
from cuml_spark.tsa.kalman import KalmanFilter  # noqa: F401
from cuml_spark.tsa.stationarity import kpss_statistic, stationarity  # noqa: F401

__all__ = ["ARIMA", "grid_search", "ExponentialSmoothing", "KalmanFilter",
           "kpss_statistic", "stationarity"]
