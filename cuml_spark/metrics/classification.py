"""Classification metrics (cuML python/cuml/metrics/accuracy.pyx:39,
prim src_prims/score/scores.h:245)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def accuracy_score_df(df: DataFrame, y: str, y_pred: str, out_col: str = "accuracy") -> DataFrame:
    """Lazy 1-row DataFrame variant of :func:`accuracy_score`."""
    return df.agg(F.avg((F.col(y) == F.col(y_pred)).cast("double")).alias(out_col))


def accuracy_score(df: DataFrame, y: str, y_pred: str) -> float:
    """avg(y == ŷ) — one aggregate scan."""
    return accuracy_score_df(df, y, y_pred).first()[0]


def log_loss(df: DataFrame, y: str, p: str, eps: float = 1e-15) -> float:
    """Binary cross-entropy: −avg(y·ln p + (1−y)·ln(1−p)), p clipped to [eps, 1−eps]."""
    pc = F.least(F.lit(1.0 - eps), F.greatest(F.lit(eps), F.col(p)))
    return df.agg(
        (-F.avg(F.col(y) * F.log(pc) + (1.0 - F.col(y)) * F.log(1.0 - pc)))
    ).first()[0]
