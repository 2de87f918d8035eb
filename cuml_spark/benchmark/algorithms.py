"""AlgorithmPair registry — parity with the reference's plugin registry
(python/cuml/benchmark/algorithms.py:48 ``AlgorithmPair``, :198
``all_algorithms``).

Each pair binds one distributed Spark estimator to a driver-local numpy
baseline of the same algorithm family plus a quality metric, so the runners
can time and accuracy-gate them uniformly.  Baselines are numpy closed forms
(sklearn is not a dependency of this engine).
"""

from __future__ import annotations

import numpy as np


class AlgorithmPair:
    """(name, run_spark(df, cols, label) -> result,
    baseline_fn(X, y) -> result, accuracy_fn(result, baseline, X, y))."""

    def __init__(self, name, run_spark, baseline_fn=None, accuracy_fn=None):
        self.name = name
        self.run_spark = run_spark
        self.baseline_fn = baseline_fn
        self.accuracy_fn = accuracy_fn

    def __repr__(self):
        return f"AlgorithmPair({self.name})"


# ---------------------------------------------------------------------------
# Spark runners
# ---------------------------------------------------------------------------

def _spark_kmeans(df, cols, label):
    from cuml_spark.cluster import KMeans

    km = KMeans(n_clusters=4, max_iter=10, random_state=0)
    out = km.fit_predict(df, cols, out_col="cluster")
    # materialize the assignment (the timed unit includes the action)
    sizes = out.groupBy("cluster").count().collect()
    return {"centers": km.cluster_centers_, "sizes": sizes}


def _spark_linreg(df, cols, label):
    from cuml_spark.linear_model import LinearRegression

    m = LinearRegression(algorithm="eig").fit(df, cols, label)
    return {"coef": np.asarray(m.coef_), "intercept": m.intercept_}


def _spark_pca(df, cols, label):
    from cuml_spark.decomposition import PCA

    p = PCA(n_components=2).fit(df, cols)
    return {"evr": np.asarray(p.explained_variance_ratio_)}


def _spark_knn(df, cols, label):
    from pyspark.sql import functions as F

    from cuml_spark.neighbors import knn_join

    vec = df.select(
        F.col("id").alias("vec_id"),
        F.array(*cols).cast("array<double>").alias("embedding"),
    )
    q = vec.where(F.col("vec_id") < 10)
    rows = knn_join(vec, q, k=5).collect()
    by_q: dict = {}
    for r in sorted(rows, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
    return by_q


# ---------------------------------------------------------------------------
# numpy baselines (single-node reference implementations)
# ---------------------------------------------------------------------------

def _np_kmeans(X, y):
    rng = np.random.RandomState(0)
    C = X[rng.choice(len(X), 4, replace=False)]
    for _ in range(10):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        a = d.argmin(1)
        for c in range(4):
            if (a == c).any():
                C[c] = X[a == c].mean(0)
    return {"centers": C, "assign": a}


def _np_linreg(X, y):
    A = np.column_stack([np.ones(len(X)), X])
    beta, *_ = np.linalg.lstsq(A, y, rcond=None)
    return {"coef": beta[1:], "intercept": float(beta[0])}


def _np_pca(X, y):
    Xc = X - X.mean(0)
    ev = np.linalg.eigvalsh(np.cov(Xc, rowvar=False))[::-1]
    return {"evr": ev[:2] / ev.sum()}


def _np_knn(X, y):
    out = {}
    for qi in range(min(10, len(X))):
        d = ((X - X[qi]) ** 2).sum(1)
        order = sorted((float(d[j]), j) for j in range(len(X)) if j != qi)
        out[qi] = [j for _, j in order[:5]]
    return out


# ---------------------------------------------------------------------------
# accuracy metrics: spark result vs numpy baseline on the same data
# ---------------------------------------------------------------------------

def _acc_kmeans(result, baseline, X, y):
    """Inertia ratio baseline/spark — ≥ ~0.8 means same-quality clustering."""
    def inertia(C):
        d = ((X[:, None, :] - np.asarray(C)[None, :, :]) ** 2).sum(-1)
        return float(d.min(1).sum())

    return inertia(baseline["centers"]) / max(inertia(result["centers"]), 1e-12)


def _acc_linreg(result, baseline, X, y):
    """R² of the spark coefficients on the full data."""
    pred = X @ np.asarray(result["coef"]) + result["intercept"]
    ss = ((y - pred) ** 2).sum()
    tot = ((y - y.mean()) ** 2).sum()
    return 1.0 - ss / max(tot, 1e-12)


def _acc_pca(result, baseline, X, y):
    return 1.0 - float(
        np.abs(np.asarray(result["evr"]) - np.asarray(baseline["evr"])).max()
    )


def _acc_knn(result, baseline, X, y):
    recalls = [
        len(set(result.get(q, [])) & set(baseline[q])) / len(baseline[q])
        for q in baseline
    ]
    return float(np.mean(recalls))


def all_algorithms() -> list[AlgorithmPair]:
    """The registry (algorithms.py:198 shape)."""
    return [
        AlgorithmPair("KMeans", _spark_kmeans, _np_kmeans, _acc_kmeans),
        AlgorithmPair("LinearRegression", _spark_linreg, _np_linreg, _acc_linreg),
        AlgorithmPair("PCA", _spark_pca, _np_pca, _acc_pca),
        AlgorithmPair("NearestNeighbors", _spark_knn, _np_knn, _acc_knn),
    ]


def algorithm_by_name(name: str) -> AlgorithmPair:
    for a in all_algorithms():
        if a.name.lower() == name.lower():
            return a
    raise ValueError(f"unknown algorithm {name!r}")
