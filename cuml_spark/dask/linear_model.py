"""MNMG linear-model parity (dask/linear_model/linear_regression.py)."""
from cuml_spark.linear_model.linear_regression import LinearRegression  # noqa: F401
from cuml_spark.linear_model.ridge import Ridge  # noqa: F401
