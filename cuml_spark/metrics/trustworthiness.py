"""Trustworthiness of an embedding vs the original space.

Reference: python/cuml/metrics/trustworthiness.pyx:56 →
cpp/src/metrics/trustworthiness.cu:37 ``trustworthiness_score``:
T(k) = 1 − 2/(n·k·(2n−3k−1)) · Σᵢ Σ_{j ∈ U⁽ᵏ⁾(i)} (r(i,j) − k),
where U⁽ᵏ⁾(i) are points in the k-NN of i in the EMBEDDED space but not in
the k-NN of i in the ORIGINAL space, and r(i,j) is j's rank by distance from
i in the original space (self excluded).

Spark-native: one pairwise join computes both distances; two row_number
windows (partitioned per query point) yield the two rank columns; the
penalty is a filtered aggregate.  Ties break by neighbor id — deterministic,
matching the D-class oracle exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def trustworthiness(
    orig: DataFrame,
    emb: DataFrame,
    n_neighbors: int = 5,
    orig_vec: str = "x",
    emb_vec: str = "x",
    id_col: str = "pid",
) -> float:
    """T(k) ∈ [0,1]; 1 = embedding preserves all k-neighborhoods."""
    k = int(n_neighbors)
    n = orig.count()

    def dist2(xa, xb):
        return F.aggregate(
            F.zip_with(xa, xb, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    o = orig.select(
        F.col(id_col).alias("a_id"),
        F.col(orig_vec).cast("array<double>").alias("o_a"),
    )
    o2 = orig.select(
        F.col(id_col).alias("b_id"),
        F.col(orig_vec).cast("array<double>").alias("o_b"),
    )
    e = emb.select(
        F.col(id_col).alias("a_id"),
        F.col(emb_vec).cast("array<double>").alias("e_a"),
    )
    e2 = emb.select(
        F.col(id_col).alias("b_id"),
        F.col(emb_vec).cast("array<double>").alias("e_b"),
    )
    # cartesian partitions multiply (left × right); keep the product ~cores
    pairs = (
        o.join(e, "a_id").coalesce(8)
        .crossJoin(o2.join(e2, "b_id").coalesce(4))
        .filter(F.col("a_id") != F.col("b_id"))
        .select(
            "a_id", "b_id",
            dist2(F.col("o_a"), F.col("o_b")).alias("d_orig"),
            dist2(F.col("e_a"), F.col("e_b")).alias("d_emb"),
        )
    )
    w_orig = Window.partitionBy("a_id").orderBy(F.col("d_orig").asc(), F.col("b_id").asc())
    w_emb = Window.partitionBy("a_id").orderBy(F.col("d_emb").asc(), F.col("b_id").asc())
    ranked = pairs.select(
        "a_id",
        F.row_number().over(w_orig).alias("r_orig"),
        F.row_number().over(w_emb).alias("r_emb"),
    )
    penalty = (
        ranked.filter((F.col("r_emb") <= k) & (F.col("r_orig") > k))
        .agg(F.sum(F.col("r_orig") - k))
        .first()[0]
    )
    penalty = float(penalty or 0.0)
    return 1.0 - (2.0 / (n * k * (2.0 * n - 3.0 * k - 1.0))) * penalty
