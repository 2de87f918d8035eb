"""Linear Kalman filter — object API plus distributed batched variant.

Reference: python/cuml/filter/kalman_filter.pyx:115 (ctor :197: dim_x, dim_z;
state attributes x, P, F, H, Q, R, K, y at :155-185; ``predict:276`` /
``update:391``) backed by cpp/src/kalman_filter/lkf.h.

Two surfaces here:

- ``KalmanFilter`` — the reference's single-filter object, faithful
  predict/update on tiny numpy matrices (the reference's device matrices are
  equally tiny; there is nothing to distribute in ONE filter).
- ``kalman_filter_series`` — the Spark-native value-add: run one filter PER
  SERIES over a long DataFrame via ``groupBy(series_id).applyInPandas``;
  state lives inside the task, exactly the stateful-per-entity shape that
  SURVEY.md §2.6 flags as the one legitimately streaming-shaped op (a
  Structured Streaming twin lives in cuml_spark.streaming).

Solver-variant note: the reference ctor takes solver ∈ {long_form,
short_implicit, short_explicit} (kalman_filter.pyx:197) selecting among
algebraically EQUIVALENT gain/covariance formulations — perf/stability
knobs for its GPU kernels on tiny matrices.  Here each name DISPATCHES to
the matching numerical route: ``short_implicit`` solves S Kᵀ = (P Hᵀ)ᵀ with
no explicit inverse (the default, cheapest), ``short_explicit`` forms
S⁻¹ explicitly, and ``long_form`` uses the Joseph-stabilized covariance
update (I−KH)P(I−KH)ᵀ + KRKᵀ — identical filter states in exact
arithmetic, different rounding/cost profiles, same contract as the
reference's variants.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class KalmanFilter:
    """Classic linear KF with the reference's attribute vocabulary."""

    def __init__(self, dim_x: int, dim_z: int, solver: str = "short_implicit"):
        if solver not in ("long_form", "short_implicit", "short_explicit"):
            raise ValueError(f"unknown solver {solver!r}")  # pyx:197 choices
        self.solver = solver  # dispatched in update() — see module docstring
        self.dim_x = dim_x
        self.dim_z = dim_z
        self.x = np.zeros((dim_x, 1))
        self.P = np.eye(dim_x)
        self.F = np.eye(dim_x)
        self.H = np.zeros((dim_z, dim_x))
        self.Q = np.eye(dim_x)
        self.R = np.eye(dim_z)
        self.K = np.zeros((dim_x, dim_z))
        self.y = np.zeros((dim_z, 1))

    def predict(self) -> None:
        """x ← Fx;  P ← FPFᵀ + Q  (kalman_filter.pyx:276)."""
        self.x = self.F @ self.x
        self.P = self.F @ self.P @ self.F.T + self.Q

    def update(self, z: np.ndarray) -> None:
        """Innovation y, gain K, posterior x/P (kalman_filter.pyx:391)."""
        z = np.asarray(z, dtype=np.float64).reshape(self.dim_z, 1)
        self.y = z - self.H @ self.x
        S = self.H @ self.P @ self.H.T + self.R
        PHt = self.P @ self.H.T
        if self.solver == "short_implicit":
            # K = PHᵀ S⁻¹ without forming S⁻¹: solve Sᵀ Kᵀ = (PHᵀ)ᵀ
            self.K = np.linalg.solve(S.T, PHt.T).T
        else:  # short_explicit and long_form form the inverse explicitly
            self.K = PHt @ np.linalg.inv(S)
        self.x = self.x + self.K @ self.y
        ikh = np.eye(self.dim_x) - self.K @ self.H
        if self.solver == "long_form":
            # Joseph-stabilized covariance: exact for ANY gain, keeps P
            # symmetric PSD under rounding — the conservative long route
            self.P = ikh @ self.P @ ikh.T + self.K @ self.R @ self.K.T
        else:
            self.P = ikh @ self.P


def local_level_filter(y: np.ndarray, q: float, r: float, x0: float | None = None,
                       p0: float = 1e6) -> tuple[np.ndarray, np.ndarray]:
    """Scalar local-level KF (dim_x = dim_z = 1, F = H = 1).

    Returns (filtered state per step, error variance per step).  This scalar
    special case is the D-class oracle surface: the same recursion is
    expressible as a recursive SQL CTE, so the distributed run is
    hash-checked against DuckDB.
    """
    n = y.size
    x = np.empty(n)
    P = np.empty(n)
    xt = y[0] if x0 is None else x0
    pt = p0
    for t in range(n):
        # predict
        pt = pt + q
        # update
        k = pt / (pt + r)
        xt = xt + k * (y[t] - xt)
        pt = (1.0 - k) * pt
        x[t] = xt
        P[t] = pt
    return x, P


def kalman_filter_series(
    df: DataFrame,
    series_col: str = "series_id",
    t_col: str = "t",
    y_col: str = "y",
    q: float = 1e-3,
    r: float = 1.0,
) -> DataFrame:
    """Local-level Kalman smoother per series → (series_id, t, y, x, p).

    One shuffle on series_id; the recursion runs inside the task.  Matrices
    are 1×1 here; for higher-dim state pass a custom model via
    ``KalmanFilter`` inside your own applyInPandas kernel.
    """
    long_df = df.select(
        F.col(series_col).cast("string").alias("series_id"),
        F.col(t_col).alias("t"),
        F.col(y_col).cast("double").alias("y"),
    )

    def run_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("t")
        y = pdf["y"].to_numpy(dtype=np.float64)
        x, P = local_level_filter(y, q, r)
        return pd.DataFrame(
            {
                "series_id": pdf["series_id"].to_numpy(),
                "t": pdf["t"].to_numpy(),
                "y": y,
                "x": x,
                "p": P,
            }
        )

    return long_df.groupBy("series_id").applyInPandas(
        run_group, "series_id string, t long, y double, x double, p double"
    )
