"""sklearn-style estimator base, the Spark analog of ``cuml.Base``.

Reference: python/cuml/common/base.pyx:28-154 — every estimator carries a
handle, verbosity, and the ``get_params``/``set_params`` contract.  Here the
"handle" is the SparkSession (resolved lazily from the active session) and
params are plain constructor attributes discovered by introspection, exactly
like base.pyx:114-143 does with ``self.__init__.__code__.co_varnames``.

Persistence (base.pyx:145-154 ``__getstate__`` strips the handle; round-trip
coverage mirrors python/cuml/test/test_pickle.py):

* plain ``pickle`` works for every estimator whose learned state is bounded
  host state (coefficients, centers, trees, support vectors).  Unpicklable
  runtime handles — SparkSession, MLlib JavaModel wrappers, DataFrames — are
  stripped and restored as ``None``.
* ``save(path)`` / ``load(path)`` is the full-fidelity API: DataFrame-valued
  state is written as parquet (scales — model state never has to fit on the
  driver), MLlib models via their native writers, the rest pickled.
"""

from __future__ import annotations

import inspect
import os
import pickle
from typing import Any

from pyspark.sql import DataFrame, SparkSession


def _is_java_model(v: Any) -> bool:
    try:
        from pyspark.ml.util import JavaMLWritable
        from pyspark.ml.wrapper import JavaParams

        return isinstance(v, JavaParams) and isinstance(v, JavaMLWritable)
    except Exception:
        return False


#: Reference ctor knobs accepted for drop-in parity and stored INERT: GPU
#: execution-tuning parameters with no Spark analog (streams, device batch
#: sizing, kernel layout) plus the sklearn-compatibility args the reference
#: itself accepts without effect (randomforest*.pyx warns-and-drops n_jobs,
#: warm_start, …; logistic_regression.pyx documents class_weight as
#: unsupported).  Anything NOT in this set still raises TypeError, so typos
#: of real hyperparameters don't pass silently.
_COMPAT_INERT_PARAMS = frozenset({
    # GPU execution knobs
    "n_streams", "n_gpus", "devices", "should_downcast", "gdf_datatype",
    "max_mbytes_per_batch", "max_samples_per_batch", "quantile_per_tree",
    "split_algo", "precision", "dense_output", "type_model",
    # sklearn-compat args the reference accepts without effect
    "n_jobs", "warm_start", "oob_score", "class_weight",
    "min_weight_fraction_leaf", "max_leaf_nodes", "min_impurity_decrease",
    "min_impurity_split", "bootstrap_features", "max_leaves",
    # solver micro-knobs folded into the wrapped optimizers
    "linesearch_max_iter", "n_iter_no_change", "shuffle",
    "learning_rate_method", "n_iter_without_progress",
    # ANN search-queue sizing (reference FAISS knob)
    "transform_queue_size",
})


class Base:
    """Common estimator plumbing: params contract + session access."""

    def __init__(self, *, handle=None, verbose: bool = False,
                 output_type: str = "spark", **compat):
        # handle= accepted on every estimator, reference base.pyx:70-81
        # semantics (default-constructed when omitted)
        from cuml_spark.core.handle import Handle

        self.handle = handle if handle is not None else Handle()
        self.verbose = verbose
        self.output_type = output_type
        unknown = set(compat) - _COMPAT_INERT_PARAMS
        if unknown:
            raise TypeError(
                f"{type(self).__name__}: unexpected parameter(s) "
                f"{sorted(unknown)} (not a reference hyperparameter nor a "
                "recognized compatibility knob)"
            )
        for k, v in compat.items():
            setattr(self, k, v)

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

    # -- persistence (base.pyx:145-154) -------------------------------------
    def __getstate__(self) -> dict:
        state, dropped = {}, []
        for k, v in self.__dict__.items():
            if isinstance(v, DataFrame) or isinstance(v, SparkSession) or _is_java_model(v):
                dropped.append(k)
            else:
                state[k] = v
        state["__stripped__"] = dropped
        return state

    def __setstate__(self, state: dict) -> None:
        dropped = state.pop("__stripped__", [])
        self.__dict__.update(state)
        for k in dropped:
            self.__dict__[k] = None

    def save(self, path: str) -> None:
        """Persist to a directory: parquet for DataFrame state, native MLlib
        writers for JavaModel state, pickle for everything else."""
        os.makedirs(path, exist_ok=True)
        heavy: dict[str, tuple] = {}
        for k, v in self.__dict__.items():
            if isinstance(v, DataFrame):
                v.write.mode("overwrite").parquet(f"{path}/df__{k}")
                heavy[k] = ("df",)
            elif _is_java_model(v):
                v.write().overwrite().save(f"{path}/java__{k}")
                heavy[k] = ("java", type(v).__module__, type(v).__name__)
        with open(f"{path}/state.pkl", "wb") as f:
            pickle.dump({"obj": self, "heavy": heavy}, f)

    @classmethod
    def load(cls, path: str, spark: SparkSession | None = None) -> "Base":
        """Inverse of :meth:`save`; re-reads parquet/MLlib state lazily."""
        with open(f"{path}/state.pkl", "rb") as f:
            blob = pickle.load(f)
        obj = blob["obj"]
        if not isinstance(obj, cls):
            raise TypeError(f"{path} holds a {type(obj).__name__}, not {cls.__name__}")
        if spark is None:
            sess = SparkSession.getActiveSession()
            if sess is None:
                from cuml_spark.core.session import get_spark

                sess = get_spark()
            spark = sess
        for k, spec in blob["heavy"].items():
            if spec[0] == "df":
                obj.__dict__[k] = spark.read.parquet(f"{path}/df__{k}")
            else:
                import importlib

                klass = getattr(importlib.import_module(spec[1]), spec[2])
                obj.__dict__[k] = klass.load(f"{path}/java__{k}")
        return obj
