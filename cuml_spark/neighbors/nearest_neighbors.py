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

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cuml_spark.core.base import Base
from cuml_spark.ops.distance import (cosine_sim, hyperplane_buckets,
                                     sq_euclidean, sq_norm, with_sq_norm)


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

    Ties broken by neighbor id (reference uses index order).  Queries are
    broadcast — index side never shuffles until the k-bounded window.
    ``dim`` (sniffed from the small query side when not given) unrolls the
    pair-loop dot product into codegen arithmetic.
    """
    if dim is None:
        first = queries.select(F.size(F.col(vec_col)).alias("d")).first()
        d = None if first is None else first["d"]
        dim = int(d) if d is not None and d >= 0 else None
    idx = with_sq_norm(
        index.select(F.col(index_id).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("i_vec")),
        "i_vec", "i_sq", dim=dim,
    )
    q = with_sq_norm(
        queries.select(F.col(query_id).alias("query_id"), F.col(vec_col).cast("array<double>").alias("q_vec")),
        "q_vec", "q_sq", dim=dim,
    )
    joined = idx.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
    if metric in ("sqeuclidean", "euclidean", "l2"):
        d = sq_euclidean(F.col("q_vec"), F.col("i_vec"), F.col("q_sq"), F.col("i_sq"), dim=dim)
        if metric == "euclidean":
            d = F.sqrt(d)
        order = [F.col("distance").asc(), F.col("neighbor_id").asc()]
    elif metric == "cosine":
        d = 1.0 - cosine_sim(F.col("q_vec"), F.col("i_vec"), F.col("q_sq"), F.col("i_sq"), dim=dim)
        order = [F.col("distance").asc(), F.col("neighbor_id").asc()]
    else:
        raise ValueError(f"unsupported metric {metric!r}")
    scored = joined.select("query_id", "neighbor_id", d.alias("distance"))
    w = Window.partitionBy("query_id").orderBy(*order)
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
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
        self.algorithm = algorithm
        self.metric = metric
        self.n_planes = n_planes
        self.n_tables = n_tables
        self.seed = seed
        self._index: DataFrame | None = None
        self._vec_col = "embedding"
        self._id_col = "vec_id"

    def fit(self, df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id") -> "NearestNeighbors":
        self._index = df
        self._vec_col = vec_col
        self._id_col = id_col
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
        dim = len(self._index.select(self._vec_col).first()[0])
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
        cand = cand.withColumn("q_sq", sq_norm(F.col("__qvec"), dim=dim))
        cand = cand.withColumn("i_sq", sq_norm(F.col("__vec"), dim=dim))
        if self.metric == "cosine":
            d = 1.0 - cosine_sim(F.col("__qvec"), F.col("__vec"), F.col("q_sq"), F.col("i_sq"), dim=dim)
        else:
            d = sq_euclidean(F.col("__qvec"), F.col("__vec"), F.col("q_sq"), F.col("i_sq"), dim=dim)
        scored = cand.select("query_id", "neighbor_id", d.alias("distance"))
        w = Window.partitionBy("query_id").orderBy(F.col("distance").asc(), F.col("neighbor_id").asc())
        return scored.withColumn("rank", F.row_number().over(w)).filter(
            F.col("rank") <= self.n_neighbors
        )
