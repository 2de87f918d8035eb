from cuml_spark.tsa.stationarity import kpss_statistic, stationarity

__all__ = ["kpss_statistic", "stationarity"]
