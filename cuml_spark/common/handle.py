"""Alias of :mod:`cuml_spark.core.handle` (reference path common/handle.pyx)."""
from cuml_spark.core.handle import Handle, Stream  # noqa: F401
