"""UMAP — Uniform Manifold Approximation and Projection (McInnes 2018).

Reference: python/cuml/manifold/umap.pyx:113 (ctor :240: n_neighbors=15,
n_components=2, n_epochs, min_dist, spread, init ∈ {spectral, random}) →
cpp/src/umap/runner.h:82 stages: KNN graph → fuzzy simplicial set
(fuzzy_simpl_set/naive.h smooth-knn-dist) → init embedding → negative-
sampling SGD layout (simpl_set_embed/algo.h; a/b curve fit optimize.h:175).

Spark-native split (SURVEY.md §7.3): the expensive stage — the KNN graph —
is DISTRIBUTED (crossJoin-free top-k via the shard-and-merge knn_join).  The
embedding optimization mutates a global n×2 array every step and is
inherently sequential, so it runs on the DRIVER over the collected k-sparse
edge list (n×k rows, NOT n² — the same asymmetry the reference exploits:
graph build dominates).  ``transform`` of new points is distributed again:
each new point lands at the fuzzy-weighted mean of its k nearest training
embeddings.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cuml_spark.core.base import Base
from cuml_spark.core.optim import nelder_mead
from cuml_spark.neighbors.nearest_neighbors import knn_join

SMOOTH_K_TOL = 1e-5


def _smooth_knn_dist(dists: np.ndarray, k: float, n_iter: int = 64) -> tuple[float, float]:
    """(rho, sigma) per point — binary search Σexp(−(d−ρ)/σ) = log2(k)
    (fuzzy_simpl_set/naive.h smooth_knn_dist semantics)."""
    target = np.log2(k)
    rho = dists[dists > 0].min() if (dists > 0).any() else 0.0
    lo, hi, mid = 0.0, np.inf, 1.0
    for _ in range(n_iter):
        psum = np.exp(-np.maximum(dists - rho, 0.0) / mid).sum()
        if abs(psum - target) < SMOOTH_K_TOL:
            break
        if psum > target:
            hi = mid
            mid = (lo + hi) / 2.0
        else:
            lo = mid
            mid = mid * 2.0 if hi == np.inf else (lo + hi) / 2.0
    return float(rho), float(mid)


def _find_ab_params(spread: float, min_dist: float) -> tuple[float, float]:
    """Fit 1/(1+a·d^(2b)) to the desired fuzzy curve (optimize.h:175
    find_params_ab) — least squares on a grid via Nelder-Mead."""
    xv = np.linspace(0.0, spread * 3.0, 300)
    yv = np.where(xv < min_dist, 1.0, np.exp(-(xv - min_dist) / spread))

    def sse(p):
        a, b = p
        if a <= 0 or b <= 0:
            return 1e18
        f = 1.0 / (1.0 + a * xv ** (2.0 * b))
        return float(((f - yv) ** 2).sum())

    p, _ = nelder_mead(sse, np.array([1.0, 1.0]),
                       bounds=[(1e-3, 100.0), (1e-3, 10.0)], max_iter=500)
    return float(p[0]), float(p[1])


class UMAP(Base):
    def __init__(self, n_neighbors: int = 15, n_components: int = 2,
                 n_epochs: int = 200, learning_rate: float = 1.0,
                 min_dist: float = 0.1, spread: float = 1.0,
                 negative_sample_rate: int = 5, init: str = "spectral",
                 random_state: int = 42, **kwargs):
        super().__init__(**kwargs)
        if init not in ("spectral", "random"):
            raise ValueError("init must be 'spectral' or 'random'")
        self.n_neighbors = n_neighbors
        self.n_components = n_components
        self.n_epochs = n_epochs
        self.learning_rate = learning_rate
        self.min_dist = min_dist
        self.spread = spread
        self.negative_sample_rate = negative_sample_rate
        self.init = init
        self.random_state = random_state

    # ------------------------------------------------------------------
    def fit(self, df: DataFrame, vec_col: str = "x", id_col: str = "pid") -> "UMAP":
        pts = df.select(F.col(id_col).alias("pid"),
                        F.col(vec_col).cast("array<double>").alias("x")).cache()
        k = self.n_neighbors
        # 1. distributed KNN graph (shard-and-merge top-k, no full crossJoin)
        knn = knn_join(pts, pts, k=k, vec_col="x", index_id="pid",
                       query_id="pid", metric="euclidean")
        edges = knn.select("query_id", "neighbor_id", "distance").toPandas()

        ids = pts.select("pid").toPandas()["pid"].to_numpy()
        order = {pid: i for i, pid in enumerate(ids)}
        n = len(ids)
        qi = edges["query_id"].map(order).to_numpy()
        ni = edges["neighbor_id"].map(order).to_numpy()
        dist = edges["distance"].to_numpy()

        # 2. fuzzy simplicial set: per-point rho/sigma + membership strengths
        w = np.zeros(len(dist))
        for i in range(n):
            sel = qi == i
            if not sel.any():
                continue
            rho, sigma = _smooth_knn_dist(dist[sel], k)
            w[sel] = np.exp(-np.maximum(dist[sel] - rho, 0.0) / sigma)
        # symmetrize: w_sym = w + wT − w∘wT  (coo_symmetrize, sparse/coo.h:797)
        W = {}
        for a, b, v in zip(qi, ni, w):
            W[(a, b)] = v
        sym = {}
        for (a, b), v in W.items():
            vt = W.get((b, a), 0.0)
            sym[(min(a, b), max(a, b))] = v + vt - v * vt
        heads = np.array([e[0] for e in sym])
        tails = np.array([e[1] for e in sym])
        weights = np.array(list(sym.values()))

        # 3. init embedding
        rng = np.random.RandomState(self.random_state)
        if self.init == "spectral":
            Y = self._spectral_init(n, heads, tails, weights)
        else:
            Y = rng.uniform(-10.0, 10.0, size=(n, self.n_components))

        # 4. negative-sampling SGD (simpl_set_embed/algo.h semantics)
        a, b = _find_ab_params(self.spread, self.min_dist)
        Y = self._optimize(Y, heads, tails, weights, a, b, rng)

        self._train_pts = pts
        self._ids = ids
        self.embedding_ = Y
        self._ab = (a, b)
        return self

    def _spectral_init(self, n, heads, tails, weights) -> np.ndarray:
        """Normalized-Laplacian eigenmaps over the COO graph (the reference
        calls nvgraph spectral, spectral_algo.h:44).  Orthogonal iteration on
        the edge list — O(E·k) per sweep, no dense n×n — so the init works at
        any n the driver-held edge list itself allows."""
        from cuml_spark.cluster.spectral import _topk_eig

        rows = np.concatenate([heads, tails])
        cols = np.concatenate([tails, heads])
        vals = np.concatenate([weights, weights])
        Y, _ = _topk_eig(
            n, rows, cols, vals, self.n_components,
            seed=self.random_state, deflate_trivial=True,
        )
        comp = Y[:, : self.n_components]
        # scale to the optimizer's working range
        return 10.0 * comp / (np.abs(comp).max() + 1e-12)

    def _optimize(self, Y, heads, tails, weights, a, b, rng) -> np.ndarray:
        n = Y.shape[0]
        lr0 = self.learning_rate
        wmax = weights.max() if len(weights) else 1.0
        # per-edge epochs-per-sample schedule (algo.h): stronger edges move more
        eps_per_sample = wmax / np.maximum(weights, 1e-12)
        next_step = eps_per_sample.copy()
        for epoch in range(self.n_epochs):
            alpha = lr0 * (1.0 - epoch / self.n_epochs)
            active = next_step <= epoch + 1
            for e in np.where(active)[0]:
                i, j = heads[e], tails[e]
                diff = Y[i] - Y[j]
                d2 = float(diff @ diff)
                if d2 > 0.0:
                    grad_coef = (-2.0 * a * b * d2 ** (b - 1.0)) / (1.0 + a * d2**b)
                    g = np.clip(grad_coef * diff, -4.0, 4.0)
                    Y[i] += alpha * g
                    Y[j] -= alpha * g
                for _ in range(self.negative_sample_rate):
                    t = rng.randint(n)
                    if t == i:
                        continue
                    diff = Y[i] - Y[t]
                    d2 = float(diff @ diff)
                    grad_coef = (2.0 * b) / ((0.001 + d2) * (1.0 + a * d2**b))
                    g = np.clip(grad_coef * diff, -4.0, 4.0)
                    Y[i] += alpha * g
                next_step[e] += eps_per_sample[e]
        return Y

    # ------------------------------------------------------------------
    def fit_transform(self, df: DataFrame, vec_col: str = "x",
                      id_col: str = "pid") -> DataFrame:
        self.fit(df, vec_col, id_col)
        spark = df.sparkSession
        rows = [
            (int(pid), [float(v) for v in self.embedding_[i]])
            for i, pid in enumerate(self._ids)
        ]
        return spark.createDataFrame(rows, f"{id_col} long, embedding array<double>")

    def transform(self, df: DataFrame, vec_col: str = "x",
                  id_col: str = "pid") -> DataFrame:
        """Distributed out-of-sample embed: fuzzy-weighted mean of the k
        nearest TRAINING embeddings (umap.pyx:495 transform semantics,
        neighborhood-weighted placement)."""
        if not hasattr(self, "embedding_"):
            raise RuntimeError("fit() first")
        spark = df.sparkSession
        emb_rows = [
            (int(pid), [float(v) for v in self.embedding_[i]])
            for i, pid in enumerate(self._ids)
        ]
        emb_df = spark.createDataFrame(emb_rows, "tid long, emb array<double>")
        q = df.select(F.col(id_col).alias("qid"),
                      F.col(vec_col).cast("array<double>").alias("x"))
        knn = knn_join(self._train_pts, q, k=self.n_neighbors, vec_col="x",
                       index_id="pid", query_id="qid", metric="euclidean")
        weighted = (
            knn.withColumn("w", 1.0 / (1.0 + F.col("distance")))
            .join(F.broadcast(emb_df), F.col("neighbor_id") == F.col("tid"))
        )
        dims = self.n_components
        agg = weighted.groupBy("query_id").agg(
            *[
                (F.sum(F.element_at("emb", d + 1) * F.col("w")) / F.sum("w")).alias(f"e{d}")
                for d in range(dims)
            ]
        )
        return agg.select(
            F.col("query_id").alias(id_col),
            F.array(*[f"e{d}" for d in range(dims)]).alias("embedding"),
        )
