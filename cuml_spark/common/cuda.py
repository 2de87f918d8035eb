"""Alias of :mod:`cuml_spark.core.handle` (reference path common/cuda.pyx)."""
from cuml_spark.core.handle import Stream  # noqa: F401
