from cuml_spark.tsa.arima import ARIMA, grid_search
from cuml_spark.tsa.holtwinters import ExponentialSmoothing
from cuml_spark.tsa.kalman import KalmanFilter, kalman_filter_series, local_level_filter
from cuml_spark.tsa.stationarity import kpss_statistic, stationarity

__all__ = [
    "ARIMA",
    "ExponentialSmoothing",
    "KalmanFilter",
    "grid_search",
    "kalman_filter_series",
    "kpss_statistic",
    "local_level_filter",
    "stationarity",
]
