"""PCA — cuML ``PCA`` (python/cuml/decomposition/pca.pyx:115).

Reference pipeline (cpp/src/pca/pca.h:76 pcaFit): column means
(stats/mean.h:82) → covariance (stats/cov.h:48) → symmetric eig
(linalg/eig.h:44) → truncate + deterministic sign flip (pca.h:134);
singular_values = sqrt(λ·(n−1)) (pca.h:102-104).

Spark-native translation of the same dataflow:
- means + full d×d second-moment matrix in ONE distributed aggregate
  (the Gram trick — sum(x_i·x_j) expressions, map-side combined);
- eigendecomposition of the d×d covariance on the DRIVER with numpy
  (d is feature count; at 100 TB d stays small while n is huge — identical
  architecture to the reference's single-GPU eig and to its Dask MNMG path,
  which also reduces partial covariances then solves once);
- transform / inverse_transform are pure column expressions over the
  broadcast components — map-only, no shuffle.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cuml_spark.core.base import Base
from cuml_spark.core.validation import check_features


def _moment_aggregate(df: DataFrame, cols: list[str]) -> tuple[np.ndarray, np.ndarray, int]:
    """One-pass (Σx, ΣxxT, n) over the feature columns."""
    d = len(cols)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, a in enumerate(cols):
        aggs.append(F.sum(a).alias(f"__s_{i}"))
        for j, b in enumerate(cols[i:], start=i):
            aggs.append(F.sum(F.col(a) * F.col(b)).alias(f"__g_{i}_{j}"))
    row = df.agg(*aggs).first()
    n = row["__n"]
    s = np.array([row[f"__s_{i}"] for i in range(d)])
    g = np.zeros((d, d))
    for i in range(d):
        for j in range(i, d):
            g[i, j] = g[j, i] = row[f"__g_{i}_{j}"]
    return s, g, n


def _sign_flip(components: np.ndarray) -> np.ndarray:
    """Deterministic sign convention: largest-|loading| coordinate positive
    (mirrors the reference's signFlip, pca.h:134)."""
    out = components.copy()
    for i in range(out.shape[0]):
        j = int(np.argmax(np.abs(out[i])))
        if out[i, j] < 0:
            out[i] = -out[i]
    return out


class PCA(Base):
    def __init__(self, n_components: int = 1, svd_solver: str = "auto",
                 whiten: bool = False, iterated_power: int = 15, tol: float = 1e-7,
                 copy: bool = True, random_state: int | None = None, **kwargs):
        super().__init__(**kwargs)
        self.n_components = n_components
        self.svd_solver = svd_solver
        self.whiten = whiten
        self.iterated_power = iterated_power
        self.tol = tol
        self.copy = copy
        self.random_state = random_state
        self.components_: np.ndarray | None = None
        self.explained_variance_: np.ndarray | None = None
        self.explained_variance_ratio_: np.ndarray | None = None
        self.singular_values_: np.ndarray | None = None
        self.mean_: np.ndarray | None = None
        self.noise_variance_: float | None = None
        self._cols: list[str] | None = None

    def fit(self, df: DataFrame, feature_cols: list[str]) -> "PCA":
        data = check_features(df, feature_cols)
        s, g, n = _moment_aggregate(data, feature_cols)
        mean = s / n
        cov = (g - n * np.outer(mean, mean)) / (n - 1)
        evals, evecs = np.linalg.eigh(cov)  # ascending
        order = np.argsort(evals)[::-1]
        evals = np.maximum(evals[order], 0.0)
        evecs = evecs[:, order]
        k = self.n_components
        self.mean_ = mean
        self.components_ = _sign_flip(evecs[:, :k].T)
        self.explained_variance_ = evals[:k]
        total_var = evals.sum()
        self.explained_variance_ratio_ = evals[:k] / total_var if total_var > 0 else evals[:k]
        self.singular_values_ = np.sqrt(evals[:k] * (n - 1))
        d = len(feature_cols)
        self.noise_variance_ = float(evals[k:].mean()) if k < d else 0.0
        self._cols = list(feature_cols)
        return self

    def transform(self, df: DataFrame, feature_cols: list[str] | None = None,
                  prefix: str = "pc") -> DataFrame:
        """Project onto components: pure expressions, keyed columns pc0..pc{k-1}."""
        cols = feature_cols or self._cols
        if self.components_ is None:
            raise RuntimeError("model not fitted")
        out_cols = []
        for i, comp in enumerate(self.components_):
            e = F.lit(0.0)
            for c, w, m in zip(cols, comp, self.mean_):
                e = e + (F.col(c).cast("double") - float(m)) * float(w)
            if self.whiten:
                e = e / float(np.sqrt(self.explained_variance_[i]) or 1.0)
            out_cols.append(e.alias(f"{prefix}{i}"))
        keep = [c for c in df.columns if c not in cols]
        return df.select(*keep, *out_cols)

    def fit_transform(self, df: DataFrame, feature_cols: list[str]) -> DataFrame:
        return self.fit(df, feature_cols).transform(df, feature_cols)

    def inverse_transform(self, df: DataFrame, prefix: str = "pc") -> DataFrame:
        """Back-project pc columns to feature space (pca.pyx:454)."""
        if self.components_ is None:
            raise RuntimeError("model not fitted")
        k = len(self.components_)
        pcs = [F.col(f"{prefix}{i}").cast("double") for i in range(k)]
        if self.whiten:
            pcs = [p * float(np.sqrt(self.explained_variance_[i])) for i, p in enumerate(pcs)]
        out = []
        for j, c in enumerate(self._cols):
            e = F.lit(float(self.mean_[j]))
            for i in range(k):
                e = e + pcs[i] * float(self.components_[i, j])
            out.append(e.alias(c))
        keep = [c for c in df.columns if not c.startswith(prefix)]
        return df.select(*keep, *out)
