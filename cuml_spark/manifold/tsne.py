"""TSNE — t-distributed Stochastic Neighbor Embedding (van der Maaten 2008).

Reference: python/cuml/manifold/t_sne.pyx:73 (ctor :186: perplexity=30,
method ∈ {barnes_hut, exact}) → cpp/src/tsne/tsne.cu:55: KNN-based P_ij
(distances.h:37), symmetrize (:88), then Barnes-Hut or exact gradient loop.

Spark-native split, same as UMAP: the KNN graph (the O(N²)-ish part) is
DISTRIBUTED via the shard-and-merge top-k join; conditional probabilities
(perplexity binary search) are vectorized numpy over the collected k-sparse
graph; the gradient loop runs on the driver over the n×2 embedding (the
reference's BH quadtree is also a single-device structure).  ``method``
'exact' computes the full repulsive term (O(n²) numpy, fine for the
driver-side n this targets); position very large inputs as sample-then-embed
(SURVEY.md §2.1 #20).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cuml_spark.core.base import Base
from cuml_spark.neighbors.nearest_neighbors import self_knn_graph


def _binary_search_beta(d2: np.ndarray, perplexity: float, n_iter: int = 64) -> np.ndarray:
    """Per-row precision beta_i s.t. perplexity(P_i) = target (vectorized)."""
    target = np.log(perplexity)
    n = d2.shape[0]
    beta = np.ones(n)
    lo = np.zeros(n)
    hi = np.full(n, np.inf)
    for _ in range(n_iter):
        P = np.exp(-d2 * beta[:, None])
        psum = P.sum(1) + 1e-12
        H = np.log(psum) + beta * (d2 * P).sum(1) / psum
        diff = H - target
        done = np.abs(diff) < 1e-5
        if done.all():
            break
        hi_mask = diff > 0  # entropy too high → raise beta
        lo[hi_mask] = beta[hi_mask]
        inf_hi = hi_mask & np.isinf(hi)
        beta[inf_hi] = beta[inf_hi] * 2.0
        fin_hi = hi_mask & ~np.isinf(hi)
        beta[fin_hi] = (beta[fin_hi] + hi[fin_hi]) / 2.0
        lo_mask = ~hi_mask
        hi[lo_mask] = beta[lo_mask]
        beta[lo_mask] = (beta[lo_mask] + lo[lo_mask]) / 2.0
    return beta


class TSNE(Base):
    def __init__(self, n_components: int = 2, perplexity: float = 30.0,
                 early_exaggeration: float = 12.0, learning_rate: float = 200.0,
                 n_iter: int = 500, method: str = "exact",
                 random_state: int = 42, **kwargs):
        super().__init__(**kwargs)
        if n_components != 2:
            raise ValueError("reference supports n_components=2 (t_sne.pyx:186)")
        if method != "exact":
            # the reference's default is barnes_hut (t_sne.pyx:186, CUDA
            # quadtree bh_kernels.h); this engine implements the exact
            # gradient only, under the sample-then-embed contract — refuse
            # loudly rather than silently running a different algorithm.
            raise NotImplementedError(
                f"method={method!r} is not implemented: this engine computes "
                "the exact t-SNE gradient over a driver-held sample "
                "(sample-then-embed contract). Use method='exact', and "
                "sample large inputs before embedding."
            )
        self.n_components = n_components
        self.perplexity = perplexity
        self.early_exaggeration = early_exaggeration
        self.learning_rate = learning_rate
        self.n_iter = n_iter
        self.method = method
        self.random_state = random_state

    def fit_transform(self, df: DataFrame, vec_col: str = "x",
                      id_col: str = "pid") -> DataFrame:
        pts = df.select(F.col(id_col).alias("pid"),
                        F.col(vec_col).cast("array<double>").alias("x")).cache()
        n_rows = pts.count()
        k = min(int(3 * self.perplexity), max(2, n_rows - 1))
        knn = self_knn_graph(pts, k=k, vec_col="x", id_col="pid",
                             metric="sqeuclidean", n_rows=n_rows,
                             seed=self.random_state)
        edges = knn.select("query_id", "neighbor_id", "distance", "rank").toPandas()

        ids = pts.select("pid").toPandas()["pid"].to_numpy()
        order = {pid: i for i, pid in enumerate(ids)}
        n = len(ids)
        # dense (n, k) neighbor matrix from the k-sparse graph
        D2 = np.zeros((n, k))
        NI = np.zeros((n, k), dtype=np.int64)
        qi = edges["query_id"].map(order).to_numpy()
        ri = edges["rank"].to_numpy() - 1
        D2[qi, ri] = edges["distance"].to_numpy()
        NI[qi, ri] = edges["neighbor_id"].map(order).to_numpy()

        beta = _binary_search_beta(D2, self.perplexity)
        Pcond = np.exp(-D2 * beta[:, None])
        Pcond /= Pcond.sum(1, keepdims=True) + 1e-12
        # symmetrize into dense P (driver-side n; BH variant would keep sparse)
        P = np.zeros((n, n))
        rows = np.repeat(np.arange(n), k)
        P[rows, NI.ravel()] = Pcond.ravel()
        P = (P + P.T) / (2.0 * n)
        P = np.maximum(P, 1e-12)

        rng = np.random.RandomState(self.random_state)
        Y = rng.standard_normal((n, 2)) * 1e-4
        Yinc = np.zeros_like(Y)
        momentum = 0.5
        Pij = P * self.early_exaggeration
        for it in range(self.n_iter):
            if it == 100:
                Pij = P
                momentum = 0.8
            diff = Y[:, None, :] - Y[None, :, :]
            d2 = (diff**2).sum(-1)
            Q = 1.0 / (1.0 + d2)
            np.fill_diagonal(Q, 0.0)
            Qn = Q / (Q.sum() + 1e-12)
            Qn = np.maximum(Qn, 1e-12)
            PQ = (Pij - Qn) * Q
            grad = 4.0 * (PQ[:, :, None] * diff).sum(1)
            Yinc = momentum * Yinc - self.learning_rate * grad
            Y = Y + Yinc
            Y = Y - Y.mean(0)
        self.embedding_ = Y
        self.kl_divergence_ = float((P * np.log(P / Qn)).sum())

        spark = df.sparkSession
        out = [(int(pid), [float(v) for v in Y[i]]) for i, pid in enumerate(ids)]
        return spark.createDataFrame(out, f"{id_col} long, embedding array<double>")

    fit = fit_transform
