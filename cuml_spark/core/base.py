"""sklearn-style estimator base, the Spark analog of ``cuml.Base``.

Reference: python/cuml/common/base.pyx:28-154 — every estimator carries a
handle, verbosity, and the ``get_params``/``set_params`` contract.  Here the
"handle" is the SparkSession (resolved lazily from the active session) and
params are plain constructor attributes discovered by introspection, exactly
like base.pyx:114-143 does with ``self.__init__.__code__.co_varnames``.
"""

from __future__ import annotations

import inspect
from typing import Any

from pyspark.sql import SparkSession


class Base:
    """Common estimator plumbing: params contract + session access."""

    def __init__(self, *, verbose: bool = False, output_type: str = "spark"):
        self.verbose = verbose
        self.output_type = output_type

    # -- sklearn contract (mirrors base.pyx:114-143) -----------------------
    @classmethod
    def _param_names(cls) -> list[str]:
        sig = inspect.signature(cls.__init__)
        return [
            p.name
            for p in sig.parameters.values()
            if p.name not in ("self", "args", "kwargs")
        ]

    def get_params(self, deep: bool = True) -> dict[str, Any]:
        return {name: getattr(self, name, None) for name in self._param_names()}

    def set_params(self, **params: Any) -> "Base":
        valid = set(self._param_names())
        for k, v in params.items():
            if k not in valid:
                raise ValueError(f"invalid parameter {k!r} for {type(self).__name__}")
            setattr(self, k, v)
        return self

    # -- session -----------------------------------------------------------
    @property
    def spark(self) -> SparkSession:
        sess = SparkSession.getActiveSession()
        if sess is None:
            from cuml_spark.core.session import get_spark

            sess = get_spark()
        return sess

    def __repr__(self) -> str:  # sklearn-ish repr
        params = ", ".join(f"{k}={v!r}" for k, v in sorted(self.get_params().items()))
        return f"{type(self).__name__}({params})"
