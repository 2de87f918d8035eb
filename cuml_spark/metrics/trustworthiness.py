"""Trustworthiness of an embedding vs the original space.

Reference: python/cuml/metrics/trustworthiness.pyx:56 →
cpp/src/metrics/trustworthiness.cu:37 ``trustworthiness_score``:
T(k) = 1 − 2/(n·k·(2n−3k−1)) · Σᵢ Σ_{j ∈ U⁽ᵏ⁾(i)} (r(i,j) − k),
where U⁽ᵏ⁾(i) are points in the k-NN of i in the EMBEDDED space but not in
the k-NN of i in the ORIGINAL space, and r(i,j) is j's rank by distance from
i in the original space (self excluded).

Spark-native: the reference point set is broadcast once (the metric is
inherently O(N²) — at scale you sample first, the contract sklearn's
implementation shares); query points stream through an Arrow-batched
``mapInPandas`` that computes both distance matrices with vectorized numpy,
ranks via per-row lexsort (tie-break by neighbor id — deterministic,
matching the D-class oracle exactly), and emits one penalty per point.
Only O(N) rows ever shuffle.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CHUNK = 256  # query rows per numpy distance-matrix chunk (bounds memory)


def trustworthiness(
    orig: DataFrame,
    emb: DataFrame,
    n_neighbors: int = 5,
    orig_vec: str = "x",
    emb_vec: str = "x",
    id_col: str = "pid",
    sample_size: int | None = None,
    seed: int = 42,
) -> float:
    """T(k) ∈ [0,1]; 1 = embedding preserves all k-neighborhoods.

    ``sample_size``: optional cap — the metric is O(N²); above the cap a
    deterministic hash sample of points is scored (the sklearn/cuML
    sample-first contract at scale).  Requires ``n_neighbors < n/2``
    (the normalizer changes sign beyond that, sklearn raises too)."""
    k = int(n_neighbors)
    o = orig.select(
        F.col(id_col).alias("pid"),
        F.col(orig_vec).cast("array<double>").alias("o_vec"),
    )
    e = emb.select(
        F.col(id_col).alias("pid"),
        F.col(emb_vec).cast("array<double>").alias("e_vec"),
    )
    joined = o.join(e, "pid")
    if sample_size is not None:
        total = joined.count()
        if total > sample_size:
            from cuml_spark.ops.sampling import hash_sample_pred

            joined = joined.filter(
                hash_sample_pred("pid", sample_size / total, seed)
            )

    ref = joined.toPandas()
    n = len(ref)
    if n == 0:
        return 1.0
    if k >= n / 2.0:
        raise ValueError(
            f"n_neighbors ({k}) must be < n/2 ({n / 2:.0f}): the "
            "trustworthiness normalizer 2/(n·k·(2n−3k−1)) is undefined there"
        )
    ref = ref.sort_values("pid").reset_index(drop=True)  # id-order columns:
    # a STABLE argsort over distance rows then breaks ties by position = id,
    # matching the oracle's ORDER BY dist, id without any per-row lexsort.
    ids_all = ref["pid"].to_numpy()
    O_all = np.stack(ref["o_vec"].to_numpy()).astype(np.float64)
    E_all = np.stack(ref["e_vec"].to_numpy()).astype(np.float64)
    spark = joined.sparkSession
    bc = spark.sparkContext.broadcast((ids_all, O_all, E_all))

    def penalties(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        b_ids, B_o, B_e = bc.value
        nn = len(b_ids)
        for pdf in batches:
            if not len(pdf):
                continue
            A_ids = pdf["pid"].to_numpy()
            A_o = np.stack(pdf["o_vec"].to_numpy()).astype(np.float64)
            A_e = np.stack(pdf["e_vec"].to_numpy()).astype(np.float64)
            out = np.zeros(len(pdf))
            # GEMM-form squared distances (a²+b²−2a·b): only the ORDER of
            # distances matters here, so the ~1e-12 fp deviation vs per-pair
            # subtraction is irrelevant; the BLAS call is what makes a
            # 5k×5k×64d block take milliseconds instead of seconds.
            b_o2 = np.einsum("ij,ij->i", B_o, B_o)
            b_e2 = np.einsum("ij,ij->i", B_e, B_e)
            for s in range(0, len(pdf), _CHUNK):
                sl = slice(s, min(s + _CHUNK, len(pdf)))
                Ao, Ae = A_o[sl], A_e[sl]
                D_o = (
                    np.einsum("ij,ij->i", Ao, Ao)[:, None]
                    + b_o2[None, :]
                    - 2.0 * Ao @ B_o.T
                )
                D_e = (
                    np.einsum("ij,ij->i", Ae, Ae)[:, None]
                    + b_e2[None, :]
                    - 2.0 * Ae @ B_e.T
                )
                order_o = np.argsort(D_o, axis=1, kind="stable")
                order_e = np.argsort(D_e, axis=1, kind="stable")
                nrow = D_o.shape[0]
                r_full = np.empty_like(order_o)
                np.put_along_axis(
                    r_full, order_o, np.tile(np.arange(nn), (nrow, 1)), axis=1
                )
                for i in range(nrow):
                    self_j = int(np.searchsorted(b_ids, A_ids[s + i]))
                    # 1-based rank with self removed: ranks behind self shift up 1
                    rs = r_full[i] - (r_full[i] > r_full[i, self_j]) + 1
                    cand = order_e[i, : k + 1]
                    topk = cand[cand != self_j][:k]
                    ro = rs[topk]
                    out[s + i] = float(ro[ro > k].sum() - k * (ro > k).sum())
            yield pd.DataFrame({"penalty": out})

    total = (
        joined.repartition(max(2, n // (8 * _CHUNK)))
        .mapInPandas(penalties, "penalty double")
        .agg(F.sum("penalty"))
        .first()[0]
    )
    total = float(total or 0.0)
    return 1.0 - (2.0 / (n * k * (2.0 * n - 3.0 * k - 1.0))) * total
