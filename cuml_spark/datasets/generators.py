"""Dataset generators — cuML ``make_blobs`` (python/cuml/datasets/blobs.pyx:77,
prim src_prims/random/make_blobs.h:66) and ``make_regression``
(datasets/regression.pyx:75, prim src_prims/random/make_regression.h:166).

Generation strategy: parameters (centers, coefficients) are drawn on the
driver with a seeded numpy RNG (tiny); the DATA is generated distributed —
``spark.range(n)`` partitions the id space and each row derives its values
from seeded per-partition numpy streams via ``mapInPandas`` (Arrow-batched).
Deterministic for a given (seed, n, d) regardless of parallelism, because the
stream is keyed by row-id block, not by task.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession

_BLOCK = 8192  # rows per deterministic RNG block (id // _BLOCK seeds a stream)


def _blockwise_rng(seed: int, block: int) -> np.random.RandomState:
    return np.random.RandomState((seed * 1_000_003 + block) % (2**31 - 1))


def make_blobs(
    spark: SparkSession,
    n_samples: int = 100,
    n_features: int = 2,
    centers: int | np.ndarray = 3,
    cluster_std: float = 1.0,
    center_box: tuple[float, float] = (-10.0, 10.0),
    random_state: int = 0,
    partitions: int | None = None,
) -> DataFrame:
    """Isotropic Gaussian blobs → DataFrame[id, f0..f{d-1}, label]."""
    rng = np.random.RandomState(random_state)
    if isinstance(centers, int):
        centers_arr = rng.uniform(center_box[0], center_box[1], size=(centers, n_features))
    else:
        centers_arr = np.asarray(centers, dtype=float)
    k = len(centers_arr)
    centers_b = spark.sparkContext.broadcast(centers_arr)
    schema = ", ".join(
        ["id long"] + [f"f{i} double" for i in range(n_features)] + ["label int"]
    )
    seed = random_state

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            out_feats = np.empty((len(ids), n_features))
            labels = np.empty(len(ids), dtype=np.int32)
            c = centers_b.value
            for blk in np.unique(ids // _BLOCK):
                mask = ids // _BLOCK == blk
                off = (ids[mask] - blk * _BLOCK).astype(int)
                r = _blockwise_rng(seed, int(blk))
                # draw the FULL block stream then index by absolute offset, so
                # results are identical no matter how ids are partitioned
                lab_full = r.randint(0, k, size=_BLOCK)
                noise_full = r.standard_normal((_BLOCK, n_features)) * cluster_std
                lab = lab_full[off]
                out_feats[mask] = c[lab] + noise_full[off]
                labels[mask] = lab
            res = pd.DataFrame({"id": ids})
            for i in range(n_features):
                res[f"f{i}"] = out_feats[:, i]
            res["label"] = labels
            yield res

    base = spark.range(n_samples, numPartitions=partitions)
    return base.mapInPandas(gen, schema=schema)


def make_mvg(
    spark: SparkSession,
    n_samples: int,
    mu: np.ndarray,
    sigma: np.ndarray,
    random_state: int = 0,
    partitions: int | None = None,
) -> DataFrame:
    """Multivariate-gaussian sampler — the MVG prim
    (src_prims/random/mvg.h:102 ``MultiVarGaussian``, chol_decomp mode
    :104): x = μ + L·z with Σ = L·Lᵀ.  The d×d Cholesky factor is driver
    numpy (tiny, like the reference's cusolver potrf on one matrix); the
    z-draws and the affine map are distributed, blockwise-deterministic
    like the other generators.  → DataFrame[id, f0..f{d-1}]."""
    mu = np.asarray(mu, dtype=float)
    sigma = np.asarray(sigma, dtype=float)
    d = mu.shape[0]
    if sigma.shape != (d, d):
        raise ValueError(f"sigma must be {d}x{d}, got {sigma.shape}")
    L = np.linalg.cholesky(sigma)
    mu_b = spark.sparkContext.broadcast(mu)
    L_b = spark.sparkContext.broadcast(L)
    schema = ", ".join(["id long"] + [f"f{i} double" for i in range(d)])
    seed = random_state

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            Z = np.empty((len(ids), d))
            for blk in np.unique(ids // _BLOCK):
                mask = ids // _BLOCK == blk
                off = (ids[mask] - blk * _BLOCK).astype(int)
                r = _blockwise_rng(seed, int(blk))
                Z[mask] = r.standard_normal((_BLOCK, d))[off]
            X = mu_b.value + Z @ L_b.value.T
            res = pd.DataFrame({"id": ids})
            for i in range(d):
                res[f"f{i}"] = X[:, i]
            yield res

    base = spark.range(n_samples, numPartitions=partitions)
    return base.mapInPandas(gen, schema=schema)


def make_regression(
    spark: SparkSession,
    n_samples: int = 100,
    n_features: int = 2,
    n_informative: int | None = None,
    bias: float = 0.0,
    noise: float = 0.0,
    random_state: int = 0,
    coef: bool = False,
    partitions: int | None = None,
):
    """Linear problem y = X·w + bias + noise → DataFrame[id, f*, y] (+ coef_)."""
    rng = np.random.RandomState(random_state)
    n_inf = n_informative if n_informative is not None else n_features
    w = np.zeros(n_features)
    w[:n_inf] = rng.uniform(1.0, 100.0, size=n_inf)
    w_b = spark.sparkContext.broadcast(w)
    schema = ", ".join(["id long"] + [f"f{i} double" for i in range(n_features)] + ["y double"])
    seed = random_state

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            X = np.empty((len(ids), n_features))
            eps = np.zeros(len(ids))
            for blk in np.unique(ids // _BLOCK):
                mask = ids // _BLOCK == blk
                off = (ids[mask] - blk * _BLOCK).astype(int)
                r = _blockwise_rng(seed, int(blk))
                X_full = r.standard_normal((_BLOCK, n_features))
                X[mask] = X_full[off]
                if noise > 0:
                    eps_full = r.standard_normal(_BLOCK) * noise
                    eps[mask] = eps_full[off]
            y = X @ w_b.value + bias + eps
            res = pd.DataFrame({"id": ids})
            for i in range(n_features):
                res[f"f{i}"] = X[:, i]
            res["y"] = y
            yield res

    base = spark.range(n_samples, numPartitions=partitions)
    df = base.mapInPandas(gen, schema=schema)
    return (df, w) if coef else df
