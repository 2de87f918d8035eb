"""Johnson-Lindenstrauss random projections.

Reference: python/cuml/random_projection/random_projection.pyx:284 (Gaussian)
/ :379 (Sparse/Achlioptas), JL min-dim helper :72; C++ RPROJfit generates the
random matrix, RPROJtransform is a GEMM (cpp/src/random_projection/rproj.cu,
rproj_c.h:69-77).

Spark-native: the projection matrix is tiny (d_in × d_out) — generate it
seeded on the driver (numpy), broadcast it, and run the GEMM as an
Arrow-batched pandas UDF (one numpy matmul per batch — the executor-side
analog of the reference's cuBLAS GEMM).  Features come either as an
``array<>`` column or as separate numeric columns.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType

from cuml_spark.core.base import Base


def johnson_lindenstrauss_min_dim(n_samples: int, eps: float = 0.1) -> int:
    """Min components preserving pairwise distances to 1±eps (JL lemma);
    same formula as the reference helper (random_projection.pyx:72)."""
    denom = (eps**2 / 2.0) - (eps**3 / 3.0)
    return int(4.0 * np.log(n_samples) / denom)


class _BaseRandomProjection(Base):
    def __init__(self, n_components: int | str = "auto", eps: float = 0.1,
                 random_state: int = 42, **kwargs):
        super().__init__(**kwargs)
        self.n_components = n_components
        self.eps = eps
        self.random_state = random_state

    def _make_matrix(self, d_in: int, d_out: int) -> np.ndarray:
        raise NotImplementedError

    def _resolve_components(self, n_samples: int) -> int:
        if self.n_components == "auto":
            return johnson_lindenstrauss_min_dim(n_samples, self.eps)
        return int(self.n_components)

    def fit(self, df: DataFrame, vec_col: str | None = None,
            cols: list[str] | None = None) -> "_BaseRandomProjection":
        if (vec_col is None) == (cols is None):
            raise ValueError("pass exactly one of vec_col / cols")
        if cols is not None:
            d_in = len(cols)
        else:
            d_in = len(df.select(vec_col).first()[0])
        n = df.count()
        d_out = self._resolve_components(n)
        self.components_ = self._make_matrix(d_in, d_out)  # (d_in, d_out)
        self._vec_col, self._cols = vec_col, cols
        return self

    def transform(self, df: DataFrame, out_col: str = "projection") -> DataFrame:
        W = self.components_
        if self._cols is not None:
            vec = F.array(*[F.col(c).cast("double") for c in self._cols])
            df = df.withColumn("__rp_in", vec)
            in_col = "__rp_in"
        else:
            in_col = self._vec_col

        @F.pandas_udf(ArrayType(DoubleType()))
        def project(batch: pd.Series) -> pd.Series:
            X = np.vstack(batch.to_numpy()).astype(np.float64)
            Y = X @ W  # executor-side GEMM on the Arrow batch
            return pd.Series(list(Y))

        out = df.withColumn(out_col, project(F.col(in_col)))
        return out.drop("__rp_in") if self._cols is not None else out

    def fit_transform(self, df: DataFrame, vec_col: str | None = None,
                      cols: list[str] | None = None,
                      out_col: str = "projection") -> DataFrame:
        return self.fit(df, vec_col, cols).transform(df, out_col)


class GaussianRandomProjection(_BaseRandomProjection):
    """Entries ~ N(0, 1/n_components) (random_projection.pyx:284)."""

    def _make_matrix(self, d_in: int, d_out: int) -> np.ndarray:
        rng = np.random.RandomState(self.random_state)
        return rng.standard_normal((d_in, d_out)) / np.sqrt(d_out)


class SparseRandomProjection(_BaseRandomProjection):
    """Achlioptas sparse matrix: ±sqrt(1/(density·k)) w.p. density/2 each,
    0 otherwise (random_projection.pyx:379; density defaults to 1/sqrt(d))."""

    def __init__(self, n_components: int | str = "auto", density: float | str = "auto",
                 eps: float = 0.1, random_state: int = 42, **kwargs):
        super().__init__(n_components, eps, random_state, **kwargs)
        self.density = density

    def _make_matrix(self, d_in: int, d_out: int) -> np.ndarray:
        density = 1.0 / np.sqrt(d_in) if self.density == "auto" else float(self.density)
        rng = np.random.RandomState(self.random_state)
        u = rng.uniform(size=(d_in, d_out))
        scale = np.sqrt(1.0 / (density * d_out))
        M = np.zeros((d_in, d_out))
        M[u < density / 2.0] = -scale
        M[u > 1.0 - density / 2.0] = scale
        return M
