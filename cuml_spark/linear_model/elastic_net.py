"""ElasticNet — cuML python/cuml/linear_model/elastic_net.pyx:25; same CD
solver as Lasso (cpp/src/solver/cd.h:80) with mixed L1/L2 penalty."""

from __future__ import annotations

from cuml_spark.linear_model.lasso import Lasso


class ElasticNet(Lasso):
    def __init__(self, alpha: float = 1.0, l1_ratio: float = 0.5, **kwargs):
        super().__init__(alpha=alpha, **kwargs)
        self.l1_ratio = l1_ratio
        self._l1_ratio = l1_ratio
