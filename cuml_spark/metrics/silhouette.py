"""Silhouette score/samples over a labeled point set.

Reference: C++-only ``silhouetteScore`` (cpp/include/cuml/metrics/metrics.hpp:93,
prim src_prims/metrics/silhouetteScore.h) — s(i) = (b−a)/max(a,b) with
a = mean intra-cluster distance (self excluded), b = min over other clusters
of mean distance; singleton clusters score 0.

Spark-native: one pairwise self-join (L2 on the feature array) →
``groupBy (point, other-cluster)`` mean distances → per-point a/b via
conditional aggregation.  O(N²) like the reference's kernel; at scale,
sample first (the same contract sklearn's ``sample_size`` exposes).
Entirely JVM-side expressions → fully DuckDB-checkable (D-class).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pair_dists(pts: DataFrame) -> DataFrame:
    a = pts.select(F.col("pid").alias("a_id"), F.col("x").alias("a_x"),
                   F.col("label").alias("a_label"))
    b = pts.select(F.col("pid").alias("b_id"), F.col("x").alias("b_x"),
                   F.col("label").alias("b_label"))
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(F.col("a_x"), F.col("b_x"), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    return (
        a.crossJoin(b)
        .filter(F.col("a_id") != F.col("b_id"))
        .select("a_id", "a_label", "b_label", dist.alias("dist"))
    )


def silhouette_samples(
    df: DataFrame, cols: list[str], label_col: str, id_col: str
) -> DataFrame:
    """→ (id_col, silhouette) per point."""
    pts = df.select(
        F.col(id_col).alias("pid"),
        F.array(*[F.col(c).cast("double") for c in cols]).alias("x"),
        F.col(label_col).alias("label"),
    )
    sizes = pts.groupBy(F.col("label").alias("b_label")).agg(
        F.count("*").alias("cluster_n")
    )
    # mean distance from each point to each cluster
    to_cluster = (
        _pair_dists(pts)
        .groupBy("a_id", "a_label", "b_label")
        .agg(F.sum("dist").alias("sum_dist"), F.count("*").alias("n_pairs"))
        .join(F.broadcast(sizes), "b_label")
    )
    # intra: divide by (cluster_n - 1) — self excluded; inter: by cluster_n
    intra = F.when(
        F.col("a_label") == F.col("b_label"),
        F.when(F.col("cluster_n") > 1, F.col("sum_dist") / (F.col("cluster_n") - 1)),
    )
    inter = F.when(
        F.col("a_label") != F.col("b_label"), F.col("sum_dist") / F.col("cluster_n")
    )
    per_point = to_cluster.groupBy("a_id").agg(
        F.max(intra).alias("a_val"),  # at most one non-null
        F.min(inter).alias("b_val"),
    )
    s = F.when(
        F.col("a_val").isNull() | F.col("b_val").isNull(), F.lit(0.0)
    ).otherwise(
        (F.col("b_val") - F.col("a_val")) / F.greatest("a_val", "b_val")
    )
    return per_point.select(F.col("a_id").alias(id_col), s.alias("silhouette"))


def silhouette_score(
    df: DataFrame, cols: list[str], label_col: str, id_col: str
) -> float:
    """Mean silhouette over all samples (metrics.hpp:93)."""
    out = silhouette_samples(df, cols, label_col, id_col)
    return out.agg(F.avg("silhouette")).first()[0]
