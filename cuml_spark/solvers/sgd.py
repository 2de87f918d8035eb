"""SGD solver — cuML ``cuml.solvers.SGD`` (python/cuml/solvers/sgd.pyx:117,
ctor :205; C++ cpp/src/solver/sgd.h:93 fit / :268 predict / :312 predictClass;
learning-rate schedules cpp/src/solver/learning_rate.h).

Losses: squared_loss, log, hinge; penalties none/l1/l2/elasticnet; schedules
constant / invscaling / adaptive.

Spark-native shape: every step computes the (sub)gradient as ONE distributed
aggregation — per-row gradient contributions are JVM column expressions with
the current weights folded in as literals, so a step is a map-side-combined
``agg`` (the treeAggregate pattern MLlib itself uses), not a Python loop over
rows.  ``batch_fraction < 1`` samples a mini-batch per step with a
step-seeded Bernoulli sample (the reference's batch_size knob, sgd.pyx:205).
L1 is applied as a proximal soft-threshold on the driver after each step —
the distributed part stays smooth.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cuml_spark.core.base import Base
from cuml_spark.core.validation import check_features

_LOSSES = ("squared_loss", "log", "hinge")


class SGD(Base):
    def __init__(
        self,
        loss: str = "squared_loss",
        penalty: str = "none",
        alpha: float = 1e-4,
        l1_ratio: float = 0.15,
        fit_intercept: bool = True,
        epochs: int = 100,
        tol: float = 1e-3,
        eta0: float = 0.01,
        power_t: float = 0.5,
        learning_rate: str = "constant",
        batch_fraction: float = 1.0,
        batch_size: int | None = None,
        seed: int = 42,
        **kwargs,
    ):
        super().__init__(**kwargs)
        if loss not in _LOSSES:
            raise ValueError(f"loss must be one of {_LOSSES}")
        if penalty not in ("none", "l1", "l2", "elasticnet"):
            raise ValueError(f"unknown penalty {penalty!r}")
        if learning_rate not in ("constant", "invscaling", "adaptive"):
            raise ValueError(f"unknown learning_rate {learning_rate!r}")
        self.loss = loss
        self.penalty = penalty
        self.alpha = alpha
        self.l1_ratio = l1_ratio
        self.fit_intercept = fit_intercept
        self.epochs = epochs
        self.tol = tol
        self.eta0 = eta0
        self.power_t = power_t
        self.learning_rate = learning_rate
        self.batch_fraction = batch_fraction
        # reference vocabulary (sgd.pyx:93): rows per minibatch — converted
        # to a sampling fraction against the table size at fit time
        self.batch_size = batch_size
        self.seed = seed
        self.coef_: np.ndarray | None = None
        self.intercept_: float = 0.0
        self._cols: list[str] | None = None

    # -- regularization split ------------------------------------------------
    def _l1_l2(self) -> tuple[float, float]:
        if self.penalty == "none":
            return 0.0, 0.0
        if self.penalty == "l1":
            return self.alpha, 0.0
        if self.penalty == "l2":
            return 0.0, self.alpha
        return self.alpha * self.l1_ratio, self.alpha * (1.0 - self.l1_ratio)

    def _grad_exprs(self, cols: list[str], w: np.ndarray, b: float, label: str):
        """Per-row gradient contribution columns for the current (w, b)."""
        z = F.lit(float(b))
        for c, wj in zip(cols, w):
            z = z + F.col(c) * float(wj)
        y = F.col(label)
        if self.loss == "squared_loss":
            err = z - y  # d/dz of 0.5(z-y)^2
        elif self.loss == "log":
            err = 1.0 / (1.0 + F.exp(-z)) - y  # y in {0,1}
        else:  # hinge, y in {0,1} mapped to ±1
            ypm = 2.0 * y - 1.0
            active = (ypm * z) < 1.0
            err = F.when(active, -ypm).otherwise(0.0)
        aggs = [F.avg(err * F.col(c)).alias(f"g_{c}") for c in cols]
        aggs.append(F.avg(err).alias("g__b"))
        return aggs

    def fit(self, df: DataFrame, feature_cols: list[str], label_col: str) -> "SGD":
        # NOT right_sized (unlike the MLlib/MAE-forest fits): each epoch's
        # aggregation evaluates the loss expression over EVERY row, so the
        # job is compute-bearing, not overhead-bound — coalescing to 4
        # partitions cost +0.6s on mbsgd_fit when tried (r7 bench)
        data = check_features(df, [*feature_cols, label_col]).cache()
        if self.batch_size is not None:
            n_rows = data.count()
            self.batch_fraction = min(1.0, self.batch_size / max(n_rows, 1))
        d = len(feature_cols)
        w = np.zeros(d)
        b = 0.0
        l1, l2 = self._l1_l2()
        eta = self.eta0
        prev_obj_grad = np.inf
        for t in range(1, self.epochs + 1):
            batch = (
                data.sample(fraction=self.batch_fraction, seed=self.seed + t)
                if self.batch_fraction < 1.0
                else data
            )
            row = batch.agg(*self._grad_exprs(feature_cols, w, b, label_col)).first()
            if row["g__b"] is None:  # empty sampled batch — skip step
                continue
            g = np.array([row[f"g_{c}"] for c in feature_cols])
            gb = float(row["g__b"])
            if l2 > 0.0:
                g = g + l2 * w
            if self.learning_rate == "invscaling":
                eta = self.eta0 / (t**self.power_t)
            elif self.learning_rate == "adaptive":
                gnorm = float(np.sqrt(g @ g + gb * gb))
                if gnorm > prev_obj_grad:  # plateau → shrink (learning_rate.h)
                    eta = eta / 5.0
                prev_obj_grad = gnorm
            w = w - eta * g
            if self.fit_intercept:
                b = b - eta * gb
            if l1 > 0.0:  # proximal soft-threshold
                w = np.sign(w) * np.maximum(np.abs(w) - eta * l1, 0.0)
            step = float(np.sqrt((eta * g) @ (eta * g)))
            if step < self.tol * max(1.0, float(np.sqrt(w @ w))):
                break
        data.unpersist()
        self.coef_ = w
        self.intercept_ = b if self.fit_intercept else 0.0
        self._cols = list(feature_cols)
        return self

    # -- scoring -------------------------------------------------------------
    def _z_expr(self):
        if self.coef_ is None or self._cols is None:
            raise RuntimeError("fit() first")
        z = F.lit(float(self.intercept_))
        for c, wj in zip(self._cols, self.coef_):
            z = z + F.col(c).cast("double") * float(wj)
        return z

    def predict(self, df: DataFrame, out_col: str = "prediction") -> DataFrame:
        """Raw decision value (sgd.h:268): z for squared/hinge, σ(z) for log."""
        z = self._z_expr()
        if self.loss == "log":
            z = 1.0 / (1.0 + F.exp(-z))
        return df.withColumn(out_col, z)

    def predictClass(self, df: DataFrame, out_col: str = "prediction") -> DataFrame:
        """Thresholded class in {0,1} (sgd.h:312)."""
        z = self._z_expr()
        thresh = 0.0 if self.loss == "hinge" else (
            0.5 if self.loss == "log" else 0.5
        )
        cls = (z > thresh) if self.loss != "log" else (
            (1.0 / (1.0 + F.exp(-z))) > 0.5
        )
        return df.withColumn(out_col, cls.cast("double"))
