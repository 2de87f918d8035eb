"""Cluster dispersion metric.

Reference: src_prims/metrics/dispersion.h:53-129 ``dispersion`` — used to
auto-select k for KMeans: μ = (Σ_c n_c·centroid_c)/N, result =
sqrt(Σ_c n_c·‖centroid_c − μ‖²).

Spark-native: two hash aggregations (points → per-cluster centroid/size →
weighted global centroid) and a closed-form combine — all JVM-side, one
shuffle on the label key, constant-size driver result.  D-class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cluster_dispersion_df(df: DataFrame, cols: list[str], label_col: str) -> DataFrame:
    """→ single-row DataFrame (dispersion double) from labeled points."""
    cents = df.groupBy(F.col(label_col).alias("__lbl")).agg(
        F.count("*").alias("__n"),
        *[F.avg(F.col(c).cast("double")).alias(f"__c_{c}") for c in cols],
    )
    n_total = F.sum("__n")
    mu = [(F.sum(F.col(f"__c_{c}") * F.col("__n")) / n_total).alias(f"__mu_{c}")
          for c in cols]
    with_mu = cents.crossJoin(F.broadcast(cents.agg(*mu)))
    sq = sum(
        ((F.col(f"__c_{c}") - F.col(f"__mu_{c}"))
         * (F.col(f"__c_{c}") - F.col(f"__mu_{c}"))) for c in cols
    )
    return with_mu.agg(F.sqrt(F.sum(F.col("__n") * sq)).alias("dispersion"))


def cluster_dispersion(df: DataFrame, cols: list[str], label_col: str) -> float:
    """Scalar dispersion (dispersion.h:129 returns sqrt of the sum)."""
    return cluster_dispersion_df(df, cols, label_col).first()[0]
