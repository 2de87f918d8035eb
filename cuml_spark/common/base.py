"""Alias of :mod:`cuml_spark.core.base` (reference path common/base.pyx)."""
from cuml_spark.core.base import Base  # noqa: F401
