"""Mini-batch SGD estimators — cuML ``MBSGDClassifier`` / ``MBSGDRegressor``
(python/cuml/linear_model/mbsgd_classifier.pyx:25 / mbsgd_regressor.pyx:25;
both delegate to the SGD solver, cpp/src/solver/sgd.h:93).

The reference's ``batch_size`` (rows per step) becomes ``batch_fraction``
(fraction sampled per step) — on a cluster an absolute row count per step is
the wrong knob; a seeded Bernoulli sample keeps every step one scan-light
distributed aggregation.  Objectives and schedules are the SGD solver's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from cuml_spark.solvers.sgd import SGD


class MBSGDClassifier(SGD):
    """loss ∈ {hinge, log, squared_loss}; predict → class in {0,1}."""

    def __init__(self, loss: str = "hinge", penalty: str = "l2",
                 alpha: float = 1e-4, l1_ratio: float = 0.15,
                 fit_intercept: bool = True, epochs: int = 100,
                 tol: float = 1e-3, eta0: float = 0.01, power_t: float = 0.5,
                 learning_rate: str = "constant", batch_fraction: float = 1.0,
                 batch_size: int | None = None,
                 seed: int = 42, **kwargs):
        super().__init__(loss=loss, penalty=penalty, alpha=alpha,
                         l1_ratio=l1_ratio, fit_intercept=fit_intercept,
                         epochs=epochs, tol=tol, eta0=eta0, power_t=power_t,
                         learning_rate=learning_rate,
                         batch_fraction=batch_fraction, batch_size=batch_size,
                         seed=seed, **kwargs)

    def predict(self, df: DataFrame, out_col: str = "prediction") -> DataFrame:
        return self.predictClass(df, out_col)


class MBSGDRegressor(SGD):
    """squared-loss mini-batch SGD; predict → continuous value."""

    def __init__(self, loss: str = "squared_loss", penalty: str = "l2", alpha: float = 1e-4,
                 l1_ratio: float = 0.15, fit_intercept: bool = True,
                 epochs: int = 100, tol: float = 1e-3, eta0: float = 0.01,
                 power_t: float = 0.5, learning_rate: str = "constant",
                 batch_fraction: float = 1.0, batch_size: int | None = None,
                 seed: int = 42, **kwargs):
        super().__init__(loss=loss, penalty=penalty, alpha=alpha,
                         l1_ratio=l1_ratio, fit_intercept=fit_intercept,
                         epochs=epochs, tol=tol, eta0=eta0, power_t=power_t,
                         learning_rate=learning_rate,
                         batch_fraction=batch_fraction, batch_size=batch_size,
                         seed=seed, **kwargs)
