"""Batched KPSS stationarity test (Kwiatkowski et al. 1992).

Reference: python/cuml/tsa/stationarity.pyx:50 →
src_prims/timeSeries/stationarity.h:345 — computes the KPSS level-stationarity
statistic per series in a batch and returns the recommended differencing order
d ∈ {0, 1} by comparing against the 95% critical value.

Spark-native: the reference's batching axis (one GPU block per series) becomes
``Window.partitionBy(series_id)`` — residuals, cumulative sums, and lagged
autocovariances are all window/aggregate expressions, whole-stage codegen'd,
shuffling once on series_id.  Long format in, one row per series out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 95% critical value for the level-stationarity KPSS test (Kwiatkowski 1992, table 1)
KPSS_CRIT_95 = 0.463


def kpss_statistic(
    df: DataFrame,
    series_col: str = "series_id",
    t_col: str = "t",
    y_col: str = "y",
    lags: int = 0,
) -> DataFrame:
    """Per-series KPSS statistic → (series_id, n, kpss_stat).

    η = Σ S_t² / n²  with  S_t = Σ_{i≤t} e_i,  e = y − ȳ;
    s² = γ₀ + 2 Σ_{l≤L} (1 − l/(L+1)) γ_l  (Bartlett window, stationarity.h
    eq.10);  statistic = η / s².
    """
    part = Window.partitionBy(series_col)
    ordered = part.orderBy(t_col)
    cum = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    e = (F.col(y_col) - F.avg(y_col).over(part)).alias("e")
    base = df.select(F.col(series_col).alias("series_id"), F.col(t_col).alias("t"), e)
    base = base.withColumn("s_cum", F.sum("e").over(cum))
    lag_cols = []
    for l in range(1, lags + 1):
        base = base.withColumn(f"e_lag{l}", F.lag("e", l).over(ordered))
        lag_cols.append(l)

    aggs = [
        F.count("*").alias("n"),
        F.sum(F.col("s_cum") ** 2).alias("sum_s2"),
        F.sum(F.col("e") ** 2).alias("gamma0_n"),
    ]
    for l in lag_cols:
        aggs.append(F.sum(F.col("e") * F.col(f"e_lag{l}")).alias(f"gl_{l}"))
    g = base.groupBy("series_id").agg(*aggs)

    s2 = F.col("gamma0_n") / F.col("n")
    for l in lag_cols:
        w = 1.0 - l / (lags + 1.0)
        s2 = s2 + 2.0 * w * F.coalesce(F.col(f"gl_{l}"), F.lit(0.0)) / F.col("n")
    eta = F.col("sum_s2") / (F.col("n") ** 2)
    return g.select(
        "series_id",
        F.col("n").cast("long").alias("n"),
        (eta / s2).alias("kpss_stat"),
    )


def stationarity(
    df: DataFrame,
    series_col: str = "series_id",
    t_col: str = "t",
    y_col: str = "y",
    lags: int = 0,
    crit: float = KPSS_CRIT_95,
) -> DataFrame:
    """Recommended differencing order per series → (series_id, d).

    d=0 if the level-stationarity hypothesis stands (stat < crit), else 1 —
    mirroring the reference's {0,1} output (stationarity.pyx:50).
    """
    stats = kpss_statistic(df, series_col, t_col, y_col, lags)
    return stats.select(
        "series_id", F.when(F.col("kpss_stat") < crit, 0).otherwise(1).cast("int").alias("d")
    )
