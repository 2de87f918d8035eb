"""Regression metrics (cuML python/cuml/metrics/regression.pyx:32,
prim src_prims/score/scores.h:199).

Each metric is one aggregate scan — map-side partial sums, single tiny shuffle.
All return a Python float (the reference returns host scalars too).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def r2_score_df(df: DataFrame, y: str, y_pred: str, out_col: str = "r2") -> DataFrame:
    """Lazy 1-row DataFrame variant of :func:`r2_score` (for query pipelines)."""
    return df.agg(
        (
            1.0
            - F.sum((F.col(y) - F.col(y_pred)) ** 2)
            / (F.sum(F.col(y) ** 2) - F.count(y) * F.avg(y) ** 2)
        ).alias(out_col)
    )


def r2_score(df: DataFrame, y: str, y_pred: str) -> float:
    """1 − SS_res/SS_tot, sample semantics identical to scores.h:199."""
    return r2_score_df(df, y, y_pred).first()[0]


def mean_squared_error(df: DataFrame, y: str, y_pred: str) -> float:
    return df.agg(F.avg((F.col(y) - F.col(y_pred)) ** 2)).first()[0]


def mean_absolute_error(df: DataFrame, y: str, y_pred: str) -> float:
    return df.agg(F.avg(F.abs(F.col(y) - F.col(y_pred)))).first()[0]
