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


# ---------------------------------------------------------------------------
# second wave: the rest of the reference registry (algorithms.py:198-320).
# Pairs whose single-node baseline would be a full reimplementation (forests,
# TSNE) register baseline_fn=None — exactly the reference's cpu_class=None
# contract (its MBSGD rows): timed and accuracy-gated, speedup not reported.
# ---------------------------------------------------------------------------

def _spark_tsvd(df, cols, label):
    from cuml_spark.decomposition import TruncatedSVD

    t = TruncatedSVD(n_components=2).fit(df, cols)
    return {"sv": np.asarray(t.singular_values_)}


def _np_tsvd(X, y):
    sv = np.linalg.svd(X, compute_uv=False)
    return {"sv": sv[:2]}


def _acc_tsvd(result, baseline, X, y):
    rel = np.abs(np.asarray(result["sv"]) - baseline["sv"]) / baseline["sv"]
    return 1.0 - float(rel.max())


def _spark_dbscan(df, cols, label):
    from pyspark.sql import functions as F

    from cuml_spark.cluster import DBSCAN

    out = DBSCAN(eps=3.0, min_samples=2).fit_predict(
        df.withColumn("pid", F.col("id")), cols, id_col="pid",
        include_role=True,
    )
    pdf = out.toPandas().sort_values("pid")
    return {"labels": pdf["label"].to_numpy(), "roles": pdf["role"].to_numpy()}


def _np_dbscan(X, y, eps=3.0, min_samples=2):
    d2 = ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1)
    neigh = d2 <= eps * eps
    core = neigh.sum(1) >= min_samples  # includes self
    labels = np.full(len(X), -1)
    cur = 0
    for s in range(len(X)):
        if not core[s] or labels[s] != -1:
            continue
        stack = [s]
        labels[s] = cur
        while stack:
            p = stack.pop()
            if not core[p]:
                continue
            for q in np.nonzero(neigh[p])[0]:
                if labels[q] == -1:
                    labels[q] = cur
                    stack.append(q)
        cur += 1
    return {"labels": labels, "core": core}


def _acc_dbscan(result, baseline, X, y):
    """Core/noise status agreement — label ids are arbitrary, the
    core-point set is not."""
    got_core = np.asarray(result["roles"]) == "core"
    return float((got_core == baseline["core"]).mean())


def _spark_ridge(df, cols, label):
    from cuml_spark.linear_model import Ridge

    m = Ridge(alpha=0.1).fit(df, cols, label)
    return {"coef": np.asarray(m.coef_).ravel(),
            "intercept": float(np.asarray(m.intercept_).ravel()[0])}


def _np_ridge(X, y, alpha=0.1):
    A = np.column_stack([np.ones(len(X)), X])
    reg = np.eye(A.shape[1]) * alpha
    reg[0, 0] = 0.0
    beta = np.linalg.solve(A.T @ A + reg, A.T @ y)
    return {"coef": beta[1:], "intercept": float(beta[0])}


def _spark_logreg(df, cols, label):
    from pyspark.sql import functions as F

    from cuml_spark.linear_model import LogisticRegression

    lab = (F.col(label) > 0).cast("int")
    d = df.withColumn("__cls", lab)
    m = LogisticRegression(penalty="l2", C=1.0, max_iter=50).fit(d, cols, "__cls")
    pred = m.predict(d, cols)
    acc = pred.agg(
        F.avg((F.col("prediction") == F.col("__cls")).cast("double"))
    ).first()[0]
    return {"acc": float(acc)}


def _np_logreg(X, y, iters=100, lr=0.1):
    yy = (y > 0).astype(float)
    w = np.zeros(X.shape[1] + 1)
    A = np.column_stack([np.ones(len(X)), X])
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(A @ w)))
        w -= lr * (A.T @ (p - yy)) / len(X)
    acc = float((((A @ w) > 0) == (yy > 0.5)).mean())
    return {"acc": acc}


def _acc_logreg(result, baseline, X, y):
    return result["acc"]


def _spark_rfc(df, cols, label):
    from pyspark.sql import functions as F

    from cuml_spark.ensemble import RandomForestClassifier

    d = df.withColumn("__cls", (F.col(label) > 0).cast("double"))
    rf = RandomForestClassifier(n_estimators=10, max_depth=6, random_state=0)
    rf.fit(d, cols, "__cls")
    return {"acc": rf.score(d, cols, "__cls")}


def _spark_rfr(df, cols, label):
    from cuml_spark.ensemble import RandomForestRegressor

    rf = RandomForestRegressor(n_estimators=10, max_depth=6, random_state=0)
    rf.fit(df, cols, label)
    return {"r2": rf.score(df, cols, label)}


def _spark_tsne(df, cols, label):
    from pyspark.sql import functions as F

    from cuml_spark.manifold import TSNE
    from cuml_spark.metrics import trustworthiness

    pts = df.select(F.col("id").alias("pid"),
                    F.array(*cols).cast("array<double>").alias("x"))
    out = TSNE(perplexity=10.0, n_iter=100, random_state=3).fit_transform(
        pts, vec_col="x", id_col="pid"
    )
    emb = out.select("pid", F.col("embedding").alias("x"))
    return {"trust": trustworthiness(pts, emb, n_neighbors=5, id_col="pid")}


def _spark_umap(df, cols, label):
    from pyspark.sql import functions as F

    from cuml_spark.manifold import UMAP
    from cuml_spark.metrics import trustworthiness

    pts = df.select(F.col("id").alias("pid"),
                    F.array(*cols).cast("array<double>").alias("x"))
    out = UMAP(n_neighbors=10, n_epochs=60, init="random",
               random_state=3).fit_transform(pts, vec_col="x", id_col="pid")
    emb = out.select("pid", F.col("embedding").alias("x"))
    return {"trust": trustworthiness(pts, emb, n_neighbors=5, id_col="pid")}


# third wave: the five reference pairs not yet registered
# (GaussianRandomProjection, Lasso, ElasticNet, MBSGDClassifier, FIL)

def _spark_grp(df, cols, label):
    from cuml_spark.decomposition import GaussianRandomProjection

    gp = GaussianRandomProjection(n_components=max(2, len(cols) // 2),
                                  random_state=0)
    out = gp.fit_transform(df, cols=cols, out_col="p")
    rows = out.select("id", "p").orderBy("id").limit(200).collect()
    return {"P": np.asarray([r["p"] for r in rows], dtype=float),
            "ids": [r["id"] for r in rows]}


def _acc_grp(result, baseline, X, y):
    """Mean pairwise-distance distortion of the projection on the sampled
    rows vs the original space (1.0 = perfectly preserved — the JL bound
    says close for n_components >= the JL dim; here we gate it is finite
    and centered near 1)."""
    ids = result["ids"]
    P = result["P"]
    Xs = X[np.asarray(ids)]
    rng = np.random.RandomState(0)
    i = rng.randint(0, len(ids), 200)
    j = rng.randint(0, len(ids), 200)
    keep = i != j
    do = np.sqrt(((Xs[i[keep]] - Xs[j[keep]]) ** 2).sum(1))
    dp = np.sqrt(((P[i[keep]] - P[j[keep]]) ** 2).sum(1))
    ratio = dp / np.maximum(do, 1e-12)
    return 1.0 - float(abs(np.median(ratio) - 1.0))


def _np_cd(X, y, l1, l2, iters=200):
    """Shared coordinate-descent baseline for Lasso / ElasticNet (standard
    soft-threshold update on centered data)."""
    Xc = X - X.mean(0)
    yc = y - y.mean()
    n, d = Xc.shape
    w = np.zeros(d)
    col_sq = (Xc ** 2).sum(0) / n + l2
    for _ in range(iters):
        for k in range(d):
            r = yc - Xc @ w + Xc[:, k] * w[k]
            rho = (Xc[:, k] * r).sum() / n
            w[k] = np.sign(rho) * max(abs(rho) - l1, 0.0) / max(col_sq[k], 1e-12)
    b = float(y.mean() - X.mean(0) @ w)
    return {"coef": w, "intercept": b}


def _spark_lasso(df, cols, label):
    from cuml_spark.linear_model import Lasso

    m = Lasso(alpha=0.01, max_iter=200).fit(df, cols, label)
    return {"coef": np.asarray(m.coef_), "intercept": float(m.intercept_)}


def _np_lasso(X, y):
    return _np_cd(X, y, l1=0.01, l2=0.0)


def _spark_enet(df, cols, label):
    from cuml_spark.linear_model import ElasticNet

    m = ElasticNet(alpha=0.01, l1_ratio=0.5, max_iter=200).fit(df, cols, label)
    return {"coef": np.asarray(m.coef_), "intercept": float(m.intercept_)}


def _np_enet(X, y):
    return _np_cd(X, y, l1=0.005, l2=0.005)


def _spark_mbsgd(df, cols, label):
    from pyspark.sql import functions as F

    from cuml_spark.linear_model.mbsgd import MBSGDClassifier

    d = df.withColumn("__cls", (F.col(label) > 0).cast("double"))
    m = MBSGDClassifier(loss="hinge", epochs=8, eta0=0.1,
                        batch_fraction=0.5, seed=0).fit(d, cols, "__cls")
    acc = (
        m.predict(d)
        .selectExpr("avg(cast(prediction = __cls as double)) as a")
        .first()["a"]
    )
    return {"acc": float(acc)}


_FIL_BENCH_TREES = [
    {
        "nodeid": 0, "split": "f0", "split_condition": 0.0, "yes": 1, "no": 2,
        "children": [{"nodeid": 1, "leaf": -0.4}, {"nodeid": 2, "leaf": 0.4}],
    },
    {
        "nodeid": 0, "split": "f1", "split_condition": 1.0, "yes": 1, "no": 2,
        "children": [{"nodeid": 1, "leaf": -0.2}, {"nodeid": 2, "leaf": 0.2}],
    },
]


def _spark_fil(df, cols, label):
    from pyspark.sql import functions as F

    from cuml_spark.fil import ForestInference

    feats = df.select(
        "id", F.col(cols[0]).alias("f0"), F.col(cols[1]).alias("f1")
    )
    fil = ForestInference.load_from_xgboost_json(_FIL_BENCH_TREES, output="sigmoid")
    rows = fil.predict(feats, ["f0", "f1"], out_col="s").orderBy("id").limit(500).collect()
    return {"ids": [r["id"] for r in rows],
            "scores": np.asarray([r["s"] for r in rows], dtype=float)}


def _np_fil(X, y):
    raw = np.where(X[:, 0] < 0.0, -0.4, 0.4) + np.where(X[:, 1] < 1.0, -0.2, 0.2)
    return {"scores": 1.0 / (1.0 + np.exp(-raw))}


def _acc_fil(result, baseline, X, y):
    ids = np.asarray(result["ids"])
    return 1.0 - float(
        np.abs(result["scores"] - baseline["scores"][ids]).max()
    )


def all_algorithms() -> list[AlgorithmPair]:
    """The registry (algorithms.py:198 shape, same algorithm names)."""
    return [
        AlgorithmPair("KMeans", _spark_kmeans, _np_kmeans, _acc_kmeans),
        AlgorithmPair("PCA", _spark_pca, _np_pca, _acc_pca),
        AlgorithmPair("tSVD", _spark_tsvd, _np_tsvd, _acc_tsvd),
        AlgorithmPair("NearestNeighbors", _spark_knn, _np_knn, _acc_knn),
        AlgorithmPair("DBSCAN", _spark_dbscan, _np_dbscan, _acc_dbscan),
        AlgorithmPair("LinearRegression", _spark_linreg, _np_linreg, _acc_linreg),
        AlgorithmPair("Ridge", _spark_ridge, _np_ridge, _acc_linreg),
        AlgorithmPair("LogisticRegression", _spark_logreg, _np_logreg, _acc_logreg),
        AlgorithmPair("RandomForestClassifier", _spark_rfc, None,
                      lambda r, b, X, y: r["acc"]),
        AlgorithmPair("RandomForestRegressor", _spark_rfr, None,
                      lambda r, b, X, y: r["r2"]),
        AlgorithmPair("TSNE", _spark_tsne, None,
                      lambda r, b, X, y: r["trust"]),
        AlgorithmPair("UMAP", _spark_umap, None,
                      lambda r, b, X, y: r["trust"]),
        AlgorithmPair("GaussianRandomProjection", _spark_grp, None, _acc_grp),
        AlgorithmPair("Lasso", _spark_lasso, _np_lasso, _acc_linreg),
        AlgorithmPair("ElasticNet", _spark_enet, _np_enet, _acc_linreg),
        AlgorithmPair("MBSGDClassifier", _spark_mbsgd, None,
                      lambda r, b, X, y: r["acc"]),
        AlgorithmPair("FIL", _spark_fil, _np_fil, _acc_fil),
    ]


def algorithm_by_name(name: str) -> AlgorithmPair:
    for a in all_algorithms():
        if a.name.lower() == name.lower():
            return a
    raise ValueError(f"unknown algorithm {name!r}")
