"""Scalar activation / loss / penalty functions as Spark Column expressions.

Reference: ``cpp/src_prims/functions/`` — sigmoid.h:26, hinge.h:38,
logisticReg.h:38, linearReg.h:36, log.h, penalty.h:30-92 (lasso/ridge/
elasticnet values + gradients), softThres.h:25, sign.h:25.

Everything here is a pure ``pyspark.sql.Column`` expression — JVM-side,
whole-stage-codegen'd, no Python in the hot path.  These are the building
blocks the solver/estimator hot loops use; exposing them keeps the public
surface at parity with the reference's prim layer and gives users the same
vocabulary for feature math in their own pipelines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.col(x) if isinstance(x, str) else F.lit(x)


def sigmoid(x) -> Column:
    """1/(1+e^-x) (sigmoid.h:26)."""
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-_c(x)))


def log_(x) -> Column:
    """Natural log guarded for the solver convention log(max(x, eps))
    (log.h applies it to probabilities)."""
    return F.log(F.greatest(_c(x), F.lit(1e-16)))


def sign(x, scalar: float = 1.0) -> Column:
    """scalar * sign(x), sign(0)=0 (sign.h:25)."""
    x = _c(x)
    return F.lit(float(scalar)) * F.signum(x)


def soft_threshold(x, thres: float) -> Column:
    """Soft-thresholding shrink operator (softThres.h:25):
    sign(x) * max(|x| - thres, 0) — the Lasso CD update kernel."""
    x = _c(x)
    t = F.lit(float(thres))
    return F.signum(x) * F.greatest(F.abs(x) - t, F.lit(0.0))


def hinge_loss(label, margin) -> Column:
    """max(0, 1 - y*m), y ∈ {-1,+1} (hinge.h:38 ``hingeLossSubtract``)."""
    return F.greatest(F.lit(0.0), F.lit(1.0) - _c(label) * _c(margin))


def logistic_loss(label, margin) -> Column:
    """log(1 + e^{-y·m}) for y ∈ {-1,+1} — the per-row term of
    logisticReg.h:38's cost (written there as −[y·log(p)+(1−y)·log(1−p)]
    over y ∈ {0,1}; identical value)."""
    return F.log(F.lit(1.0) + F.exp(-_c(label) * _c(margin)))


def squared_loss(label, pred) -> Column:
    """(y - ŷ)² / 2 — per-row term of linearReg.h:36's cost."""
    d = _c(label) - _c(pred)
    return d * d / F.lit(2.0)


def lasso_penalty(coef_sq_sum_abs, alpha: float) -> Column:
    """α·Σ|w| (penalty.h:38 ``lasso``); pass Σ|w| (a scalar column)."""
    return F.lit(float(alpha)) * _c(coef_sq_sum_abs)


def ridge_penalty(coef_sq_sum, alpha: float) -> Column:
    """α·Σw² (penalty.h:51 ``ridge``); pass Σw²."""
    return F.lit(float(alpha)) * _c(coef_sq_sum)


def elasticnet_penalty(coef_abs_sum, coef_sq_sum, alpha: float,
                       l1_ratio: float) -> Column:
    """α·l1_ratio·Σ|w| + α·(1−l1_ratio)·Σw² (penalty.h:64 ``elasticnet`` —
    note the reference composes its ridge term WITHOUT the conventional ½)."""
    a = float(alpha)
    r = float(l1_ratio)
    return (F.lit(a * r) * _c(coef_abs_sum)
            + F.lit(a * (1.0 - r)) * _c(coef_sq_sum))


def lasso_grad(coef, alpha: float) -> Column:
    """α·sign(w) (penalty.h:45 ``lassoGrad``)."""
    return F.lit(float(alpha)) * F.signum(_c(coef))


def ridge_grad(coef, alpha: float) -> Column:
    """2α·w (penalty.h:58 ``ridgeGrad``)."""
    return F.lit(2.0 * float(alpha)) * _c(coef)


def elasticnet_grad(coef, alpha: float, l1_ratio: float) -> Column:
    """lassoGrad(α·r) + ridgeGrad(α·(1−r)) (penalty.h:81)."""
    return lasso_grad(coef, float(alpha) * float(l1_ratio)) + ridge_grad(
        coef, float(alpha) * (1.0 - float(l1_ratio))
    )


__all__ = [
    "sigmoid", "log_", "sign", "soft_threshold",
    "hinge_loss", "logistic_loss", "squared_loss",
    "lasso_penalty", "ridge_penalty", "elasticnet_penalty",
    "lasso_grad", "ridge_grad", "elasticnet_grad",
]
