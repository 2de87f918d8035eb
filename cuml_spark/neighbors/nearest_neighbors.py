"""Exact brute-force KNN + ANN over embedding columns.

Reference: cuML ``NearestNeighbors`` (python/cuml/neighbors/
nearest_neighbors.pyx:96, fit :265, kneighbors :405) delegates to FAISS
GpuIndexFlatL2 brute force (cpp/src/knn/knn.cu:57); its multi-GPU path chunks
the index and merges per-shard top-k (cuml/neighbors/knn.hpp:77).

Spark-native design, same merge pattern:
- queries (small side) are BROADCAST; the index side streams partition-local —
  each task computes distances for its slice and keeps only its top-k via the
  rank-limited window (WindowGroupLimit pushes k below the shuffle), then the
  per-partition winners merge — exactly the reference's shard-then-merge.
- distances use the expanded ‖a‖²+‖b‖²−2aᵀb form with precomputed norms
  (euclidean.h:54 trick), JVM higher-order functions only.
- ANN mode: random-hyperplane LSH bucketing with deterministic seeded planes;
  candidates = bucket-mates (multi-probe over b tables), exact re-rank on the
  candidate set.  This is the 100 TB path: no all-pairs crossJoin.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cuml_spark.core.base import Base
from cuml_spark.ops.distance import (cosine_sim, hyperplane_buckets,
                                     sq_euclidean, sq_norm, with_sq_norm)

# Above this many query rows the GEMM path (which holds the query matrix in
# every task) would stop being "broadcast the small side" — fall back to the
# pair-join formulation.  20k × d=64 doubles ≈ 10 MB per task: comfortably
# executor-resident, same regime as a Spark broadcast join threshold.
_GEMM_QUERY_CAP = 20_000


def _knn_gemm(
    index: DataFrame,
    q_ids: np.ndarray,
    Q: np.ndarray,
    qid_type: T.DataType,
    k: int,
    vec_col: str,
    index_id: str,
    metric: str,
) -> DataFrame:
    """Brute top-k via one BLAS GEMM per Arrow batch (the reference's
    shard-then-merge, knn.hpp:77): every index partition scores its slice
    against the full query matrix, keeps its LOCAL top-k per query, and the
    tiny per-shard winners (n_batches · m · k rows) merge in one window.

    No per-pair row is ever materialized and nothing here depends on
    whole-stage codegen limits — the hot loop is numpy matmul.
    """
    q_sq = np.einsum("ij,ij->i", Q, Q)
    euclidean = metric == "euclidean"
    cosine = metric == "cosine"
    k_local = k
    src = index.select(
        F.col(index_id).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("i_vec"),
    )
    schema = T.StructType(
        [
            T.StructField("query_id", qid_type),
            T.StructField("neighbor_id", src.schema["neighbor_id"].dataType),
            T.StructField("distance", T.DoubleType()),
        ]
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.asarray(pdf["i_vec"].tolist(), dtype=np.float64)
            nid = pdf["neighbor_id"].to_numpy()
            G = X @ Q.T  # (batch, m) — the one GEMM
            if cosine:
                x_n = np.sqrt(np.einsum("ij,ij->i", X, X))
                with np.errstate(divide="ignore", invalid="ignore"):
                    D = 1.0 - G / (x_n[:, None] * np.sqrt(q_sq)[None, :])
            else:
                x_sq = np.einsum("ij,ij->i", X, X)
                D = np.maximum(0.0, x_sq[:, None] + q_sq[None, :] - 2.0 * G)
                if euclidean:
                    D = np.sqrt(D)
            D[nid[:, None] == q_ids[None, :]] = np.inf  # self-pair exclusion
            kk = min(k_local, len(nid))
            out_q, out_n, out_d = [], [], []
            for j in range(len(q_ids)):
                dj = D[:, j]
                top = np.lexsort((nid, dj))[:kk]  # exact (distance, id) order
                keep = np.isfinite(dj[top])
                top = top[keep]
                out_q.append(np.full(len(top), q_ids[j]))
                out_n.append(nid[top])
                out_d.append(dj[top])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q) if out_q else [],
                    "neighbor_id": np.concatenate(out_n) if out_n else [],
                    "distance": np.concatenate(out_d) if out_d else [],
                }
            )

    shards = src.mapInPandas(score, schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("distance").asc(), F.col("neighbor_id").asc()
    )
    return shards.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def _knn_stream_queries(
    index_rows: list,
    queries: DataFrame,
    k: int,
    metric: str,
    nid_type: T.DataType | None = None,
) -> DataFrame:
    """Top-k for an UNBOUNDED query side against a bounded index: the index
    matrix ships in the scorer closure and each query partition computes its
    own complete top-k — a pure map, NO shuffle, no merge window.  This is
    the 100 TB inference plan (e.g. UMAP.transform over the full table
    against a capped training sample)."""
    i_ids = np.asarray([r[0] for r in index_rows])
    X = np.asarray([r[1] for r in index_rows], dtype=np.float64)
    x_sq = np.einsum("ij,ij->i", X, X)
    euclidean = metric == "euclidean"
    cosine = metric == "cosine"

    q_src = queries  # (query_id, q_vec) — caller normalized the columns
    out_schema = T.StructType(
        [
            T.StructField("query_id", q_src.schema["query_id"].dataType),
            T.StructField(
                "neighbor_id",
                nid_type if nid_type is not None
                else (T.LongType() if i_ids.dtype.kind in "iu" else T.StringType()),
            ),
            T.StructField("distance", T.DoubleType()),
            T.StructField("rank", T.IntegerType()),
        ]
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            Q = np.asarray(pdf["q_vec"].tolist(), dtype=np.float64)
            qid = pdf["query_id"].to_numpy()
            G = Q @ X.T  # (batch, n_index)
            if cosine:
                q_n = np.sqrt(np.einsum("ij,ij->i", Q, Q))
                with np.errstate(divide="ignore", invalid="ignore"):
                    D = 1.0 - G / (q_n[:, None] * np.sqrt(x_sq)[None, :])
            else:
                q_sq = np.einsum("ij,ij->i", Q, Q)
                D = np.maximum(0.0, q_sq[:, None] + x_sq[None, :] - 2.0 * G)
                if euclidean:
                    D = np.sqrt(D)
            D[qid[:, None] == i_ids[None, :]] = np.inf  # self-pair exclusion
            kk = min(k, D.shape[1])
            out_q, out_n, out_d, out_r = [], [], [], []
            for r in range(len(qid)):
                dr = D[r]
                top = np.lexsort((i_ids, dr))[:kk]
                top = top[np.isfinite(dr[top])]
                out_q.append(np.full(len(top), qid[r]))
                out_n.append(i_ids[top])
                out_d.append(dr[top])
                out_r.append(np.arange(1, len(top) + 1))
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q) if out_q else [],
                    "neighbor_id": np.concatenate(out_n) if out_n else [],
                    "distance": np.concatenate(out_d) if out_d else [],
                    "rank": np.concatenate(out_r) if out_r else [],
                }
            )

    return q_src.mapInPandas(score, out_schema)


def knn_join(
    index: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    index_id: str = "vec_id",
    query_id: str = "vec_id",
    metric: str = "sqeuclidean",
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k neighbors per query → (query_id, neighbor_id, distance, rank).

    Ties broken by neighbor id (reference uses index order).  Default path:
    the query side (small by contract) is collected ONCE and shipped in the
    scorer closure; the index side streams through an Arrow-batched GEMM and
    only per-shard top-k rows reach the merge window (``_knn_gemm``).  When
    the QUERY side is the big one but the index fits the cap (the inference
    shape: score everything against a bounded model/sample), the roles flip:
    the index ships in the closure and queries stream shuffle-free
    (``_knn_stream_queries``).  Only when BOTH sides exceed the cap does the
    broadcast pair-join fallback run.
    """
    if metric not in ("sqeuclidean", "euclidean", "l2", "cosine"):
        raise ValueError(f"unsupported metric {metric!r}")
    q_src = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("q_vec"),
    )
    q_rows = q_src.limit(_GEMM_QUERY_CAP + 1).collect()
    if len(q_rows) <= _GEMM_QUERY_CAP:
        if not q_rows:
            return (
                q_src.select(
                    F.col("query_id"),
                    F.col("query_id").alias("neighbor_id"),
                    F.lit(0.0).alias("distance"),
                    F.lit(1).alias("rank"),
                )
                .limit(0)
            )
        q_ids = np.asarray([r["query_id"] for r in q_rows])
        Q = np.asarray([r["q_vec"] for r in q_rows], dtype=np.float64)
        return _knn_gemm(
            index, q_ids, Q, q_src.schema["query_id"].dataType,
            k, vec_col, index_id, metric,
        )
    i_src = index.select(
        F.col(index_id).alias("index_id"),
        F.col(vec_col).cast("array<double>").alias("i_vec"),
    )
    i_rows = i_src.limit(_GEMM_QUERY_CAP + 1).collect()
    if 0 < len(i_rows) <= _GEMM_QUERY_CAP:
        return _knn_stream_queries(
            i_rows, q_src, k, metric,
            nid_type=i_src.schema["index_id"].dataType,
        )
    # ------- fallback: broadcast pair-join (BOTH sides too big to ship) ----
    # HOF distances above dim 16: the unrolled element_at tree at high dim
    # blows whole-stage-codegen method limits (janino compile dominates).
    if dim is not None and dim > 16:
        dim = None
    idx = with_sq_norm(
        index.select(F.col(index_id).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("i_vec")),
        "i_vec", "i_sq", dim=dim,
    )
    q = with_sq_norm(
        q_src, "q_vec", "q_sq", dim=dim,
    )
    joined = idx.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
    if metric in ("sqeuclidean", "euclidean", "l2"):
        d = sq_euclidean(F.col("q_vec"), F.col("i_vec"), F.col("q_sq"), F.col("i_sq"), dim=dim)
        if metric == "euclidean":
            d = F.sqrt(d)
    else:
        d = 1.0 - cosine_sim(F.col("q_vec"), F.col("i_vec"), F.col("q_sq"), F.col("i_sq"), dim=dim)
    order = [F.col("distance").asc(), F.col("neighbor_id").asc()]
    scored = joined.select("query_id", "neighbor_id", d.alias("distance"))
    w = Window.partitionBy("query_id").orderBy(*order)
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def self_knn_graph(
    pts: DataFrame,
    k: int = 15,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    metric: str = "sqeuclidean",
    exact_max_rows: int = _GEMM_QUERY_CAP,
    n_tables: int = 8,
    seed: int = 42,
    n_rows: int | None = None,
) -> DataFrame:
    """KNN graph of a dataset against itself → (query_id, neighbor_id,
    distance, rank) — the graph-build primitive behind UMAP / TSNE / spectral.

    Up to ``exact_max_rows`` the exact GEMM-sharded scorer runs (every task
    holds the n×d query matrix — bounded by the cap, no broadcast join).
    Above it, candidates come from multi-table hyperplane LSH (id-only bucket
    joins) with exact re-rank — the 100 TB path: nothing all-pairs, nothing
    that ships the full dataset to every task.  Plane count scales with n to
    keep expected bucket size ~512 rows.
    """
    n = pts.count() if n_rows is None else n_rows
    if n <= exact_max_rows:
        return knn_join(pts, pts, k=k, vec_col=vec_col, index_id=id_col,
                        query_id=id_col, metric=metric)
    n_planes = max(4, int(np.ceil(np.log2(max(n, 2) / 512.0))))
    nn = NearestNeighbors(
        n_neighbors=k, algorithm="lsh", metric=metric,
        n_planes=n_planes, n_tables=n_tables, seed=seed,
    )
    return nn.fit(pts, vec_col=vec_col, id_col=id_col).kneighbors(
        pts, query_id=id_col
    )


def cosine_topk(
    index: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    index_id: str = "vec_id",
    query_id: str = "vec_id",
) -> DataFrame:
    """Brute-force cosine top-k (similarity search baseline) →
    (query_id, neighbor_id, cos_sim, rank), most-similar first."""
    out = knn_join(index, queries, k=k, vec_col=vec_col, index_id=index_id,
                   query_id=query_id, metric="cosine")
    return out.select(
        "query_id", "neighbor_id", (1.0 - F.col("distance")).alias("cos_sim"), "rank"
    )


class NearestNeighbors(Base):
    """cuML-vocabulary facade: fit(index_df) then kneighbors(query_df).

    ``algorithm='brute'`` (reference 'full'): exact.  ``algorithm='lsh'``:
    random-hyperplane bucketing + exact re-rank of bucket candidates.
    """

    def __init__(self, n_neighbors: int = 5, algorithm: str = "brute",
                 metric: str = "sqeuclidean", n_planes: int = 8,
                 n_tables: int = 4, seed: int = 42, **kwargs):
        super().__init__(**kwargs)
        self.n_neighbors = n_neighbors
        # reference vocabulary: algorithm='full' (nearest_neighbors.pyx:96)
        # is its brute-force mode
        self.algorithm = "brute" if algorithm == "full" else algorithm
        self.metric = metric
        self.n_planes = n_planes
        self.n_tables = n_tables
        self.seed = seed
        self._index: DataFrame | None = None
        self._vec_col = "embedding"
        self._id_col = "vec_id"
        self._dim: int | None = None

    def fit(self, df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id",
            dim: int | None = None) -> "NearestNeighbors":
        self._index = df
        self._vec_col = vec_col
        self._id_col = id_col
        self._dim = dim  # sniffed lazily (once) when not supplied
        return self

    def _bucketed(self, df: DataFrame, dim: int, id_alias: str) -> DataFrame:
        """Attach (table, bucket) LSH keys: sign pattern of n_planes projections."""
        out = df.select(
            F.col(self._id_col).alias(id_alias),
            F.col(self._vec_col).cast("array<double>").alias("__vec"),
        )
        buckets = hyperplane_buckets(self.n_planes, self.n_tables, dim, self.seed)
        return out.select(
            id_alias, "__vec",
            F.posexplode(buckets(F.col("__vec"))).alias("table", "bucket"),
        )

    def kneighbors(self, queries: DataFrame, query_id: str | None = None) -> DataFrame:
        if self._index is None:
            raise RuntimeError("call fit() first")
        qid = query_id or self._id_col
        if self.algorithm == "brute":
            return knn_join(
                self._index, queries, k=self.n_neighbors, vec_col=self._vec_col,
                index_id=self._id_col, query_id=qid, metric=self.metric,
            )
        if self.algorithm != "lsh":
            raise ValueError(f"unknown algorithm {self.algorithm!r}")
        if self._dim is None:
            self._dim = len(self._index.select(self._vec_col).first()[0])
        dim = self._dim
        # bucket join carries ONLY ids — the pair-distinct shuffles small
        # int pairs, never the vectors; vectors re-attach via equi-joins on
        # id afterwards (co-partitionable / broadcastable at scale)
        idx_b = self._bucketed(self._index, dim, "neighbor_id").select(
            "neighbor_id", "table", "bucket"
        )
        q_b = self._bucketed(
            queries.select(F.col(qid).alias(self._id_col), F.col(self._vec_col)),
            dim, "query_id",
        ).select("query_id", "table", "bucket")
        pairs = (
            idx_b.join(q_b, on=["table", "bucket"])
            .where(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id")
            .distinct()
        )
        idx_vec = self._index.select(
            F.col(self._id_col).alias("neighbor_id"),
            F.col(self._vec_col).cast("array<double>").alias("__vec"),
        )
        q_vec = queries.select(
            F.col(qid).alias("query_id"),
            F.col(self._vec_col).cast("array<double>").alias("__qvec"),
        )
        cand = pairs.join(q_vec, "query_id").join(idx_vec, "neighbor_id")
        # exact re-rank: Arrow-batched pair scorer (one einsum per batch —
        # no dim-unrolled codegen tree, no janino compile per query)
        from cuml_spark.ops.distance import pair_distance_udf

        scorer = pair_distance_udf(self.metric)
        d = scorer(F.col("__qvec"), F.col("__vec"))
        if self.metric == "cosine":
            d = 1.0 - d
        scored = cand.select("query_id", "neighbor_id", d.alias("distance"))
        w = Window.partitionBy("query_id").orderBy(F.col("distance").asc(), F.col("neighbor_id").asc())
        return scored.withColumn("rank", F.row_number().over(w)).filter(
            F.col("rank") <= self.n_neighbors
        )
