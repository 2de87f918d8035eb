"""Silhouette score/samples over a labeled point set.

Reference: C++-only ``silhouetteScore`` (cpp/include/cuml/metrics/metrics.hpp:93,
prim src_prims/metrics/silhouetteScore.h) — s(i) = (b−a)/max(a,b) with
a = mean intra-cluster distance (self excluded), b = min over other clusters
of mean distance; singleton clusters score 0.

Spark-native, block-nested-loop: points are hashed into blocks, each block
packed into one row (collect_list of structs), and the O(N²) distance work
runs as nblk² block-pair tasks inside an Arrow-batched ``mapInPandas`` —
vectorized numpy per task instead of N² JVM rows.  Each task emits only
(point × cluster) partial sums, so the shuffle after the quadratic stage is
O(N·k), not O(N²).  Per-pair math is the same subtraction/sqrt as a row-at-a-
time formulation, so results agree with a SQL oracle to fp-sum-order noise.
O(N²) like the reference's kernel; at scale, sample first (the same contract
sklearn's ``sample_size`` exposes).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_BLOCK_ROWS = 4096  # target points per packed block
_CHUNK = 512  # a-side rows per numpy broadcast chunk (bounds memory)


def _cluster_sums(pts: DataFrame) -> DataFrame:
    """→ (pid, label ``a_label``, b_label, sum_dist): total L2 distance from
    each point to every member of each cluster (self-distance contributes 0)."""
    n = pts.count()
    nblk = max(1, -(-n // _BLOCK_ROWS))
    blocked = pts.withColumn(
        "blk", F.pmod(F.xxhash64(F.col("pid")), F.lit(nblk)).cast("int")
    )
    packed = blocked.groupBy("blk").agg(
        F.collect_list(F.struct("pid", "x", "label")).alias("rows")
    )
    pairs = (
        packed.select(F.col("rows").alias("a_rows"))
        .crossJoin(F.broadcast(packed.select(F.col("rows").alias("b_rows"))))
        .repartition(max(nblk * nblk // 4, 1))
    )

    pid_type = pts.schema["pid"].dataType
    label_type = pts.schema["label"].dataType
    out_schema = T.StructType(
        [
            T.StructField("pid", pid_type),
            T.StructField("a_label", label_type),
            T.StructField("b_label", label_type),
            T.StructField("part_sum", T.DoubleType()),
        ]
    )

    def block_dists(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for i in range(len(pdf)):
                a_rows, b_rows = pdf["a_rows"].iloc[i], pdf["b_rows"].iloc[i]
                A = np.asarray([r["x"] for r in a_rows], dtype=np.float64)
                B = np.asarray([r["x"] for r in b_rows], dtype=np.float64)
                a_pid = [r["pid"] for r in a_rows]
                a_lab = [r["label"] for r in a_rows]
                b_lab = np.asarray([r["label"] for r in b_rows])
                labels = sorted(set(b_lab.tolist()))
                masks = [b_lab == lab for lab in labels]
                sums = np.zeros((len(A), len(labels)))
                for s in range(0, len(A), _CHUNK):
                    diff = A[s : s + _CHUNK, None, :] - B[None, :, :]
                    D = np.sqrt(np.einsum("ijk,ijk->ij", diff, diff))
                    for j, m in enumerate(masks):
                        sums[s : s + _CHUNK, j] = D[:, m].sum(axis=1)
                na = len(A)
                yield pd.DataFrame(
                    {
                        "pid": np.repeat(np.asarray(a_pid, dtype=object), len(labels)),
                        "a_label": np.repeat(
                            np.asarray(a_lab, dtype=object), len(labels)
                        ),
                        "b_label": np.tile(np.asarray(labels, dtype=object), na),
                        "part_sum": sums.ravel(),
                    }
                )

    return (
        pairs.mapInPandas(block_dists, out_schema)
        .groupBy("pid", "a_label", "b_label")
        .agg(F.sum("part_sum").alias("sum_dist"))
    )


def _hash_sample(pts: DataFrame, sample_size: int | None, seed: int) -> DataFrame:
    """Deterministic seeded subsample by hash threshold — no sort, no
    collect, stable across partitioning.  This is the 100 TB contract: the
    metric is inherently O(N²), so above ``sample_size`` points the score is
    estimated on a hash-selected subset (sklearn ``sample_size`` semantics)."""
    if sample_size is None:
        return pts
    n = pts.count()
    if n <= sample_size:
        return pts
    # keep ≈ sample_size rows — the shared deterministic sample contract
    from cuml_spark.ops.sampling import hash_sample_pred

    return pts.filter(hash_sample_pred("pid", sample_size / n, seed))


def silhouette_samples(
    df: DataFrame, cols: list[str], label_col: str, id_col: str,
    sample_size: int | None = None, seed: int = 42,
) -> DataFrame:
    """→ (id_col, silhouette) per point.

    ``sample_size``: optional cap — when set, both the scored points and the
    reference clusters are restricted to a deterministic hash sample, keeping
    the quadratic stage O(sample²) regardless of input size."""
    pts = df.select(
        F.col(id_col).alias("pid"),
        F.array(*[F.col(c).cast("double") for c in cols]).alias("x"),
        F.col(label_col).alias("label"),
    )
    pts = _hash_sample(pts, sample_size, seed)
    sizes = pts.groupBy(F.col("label").alias("b_label")).agg(
        F.count("*").alias("cluster_n")
    )
    to_cluster = _cluster_sums(pts).join(F.broadcast(sizes), "b_label")
    # intra: divide by (cluster_n - 1) — self excluded (its distance-0 term
    # contributes nothing to the sum); inter: by cluster_n
    intra = F.when(
        F.col("a_label") == F.col("b_label"),
        F.when(F.col("cluster_n") > 1, F.col("sum_dist") / (F.col("cluster_n") - 1)),
    )
    inter = F.when(
        F.col("a_label") != F.col("b_label"), F.col("sum_dist") / F.col("cluster_n")
    )
    per_point = to_cluster.groupBy("pid").agg(
        F.max(intra).alias("a_val"),  # at most one non-null
        F.min(inter).alias("b_val"),
    )
    s = F.when(
        F.col("a_val").isNull() | F.col("b_val").isNull(), F.lit(0.0)
    ).otherwise(
        (F.col("b_val") - F.col("a_val")) / F.greatest("a_val", "b_val")
    )
    return per_point.select(F.col("pid").alias(id_col), s.alias("silhouette"))


def silhouette_score(
    df: DataFrame, cols: list[str], label_col: str, id_col: str,
    sample_size: int | None = None, seed: int = 42,
) -> float:
    """Mean silhouette over all samples (metrics.hpp:93); ``sample_size``
    bounds the O(N²) stage at scale."""
    out = silhouette_samples(df, cols, label_col, id_col,
                             sample_size=sample_size, seed=seed)
    return out.agg(F.avg("silhouette")).first()[0]
