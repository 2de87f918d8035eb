"""Harness queries: clustering-agreement / regression / probabilistic metrics.

All three are D-class: every metric is closed-form arithmetic over exact
integer counts (contingency table / group shares) or single-pass aggregates,
so DuckDB replays the same formulas on the same tables.  Reference:
cpp/include/cuml/metrics/metrics.hpp:73-236 (adjusted_rand_index, rand_index,
mutual_info, homogeneity/completeness/v_measure, kl_divergence),
src_prims/score/scores.h:199 (r2/mse), accuracy.pyx:39, logloss via sklearn
parity in python/cuml/metrics.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cuml_spark.core.session import read_table
from cuml_spark.metrics import (
    adjusted_rand_score,
    homogeneity_completeness_v_measure,
    kl_divergence,
    log_loss,
    mean_absolute_error,
    mean_squared_error,
    mutual_info_score,
    r2_score,
    rand_score,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, f"{sf_dir}/{name}.parquet")


def q_cluster_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARI / Rand / MI / homogeneity / completeness / V between returnflag
    and linestatus partitions of lineitem — ONE contingency groupBy job
    feeds all six via cluster_agreement_metrics (metrics.hpp:73-236)."""
    from cuml_spark.metrics import cluster_agreement_metrics

    li = _t(spark, sf_dir, "lineitem")
    m = cluster_agreement_metrics(li, "l_returnflag", "l_linestatus")
    vals = (m["ari"], m["rand"], m["mi"],
            m["homogeneity"], m["completeness"], m["v_measure"])
    return spark.createDataFrame(
        [tuple(round(x, 6) for x in vals)],
        "ari double, rand double, mi double, homogeneity double, "
        "completeness double, v_measure double",
    )


_SQL_CLUSTER_AGREEMENT = """
WITH c AS (
  SELECT l_returnflag AS y, l_linestatus AS yp, count(*)::DOUBLE AS n
  FROM lineitem GROUP BY 1, 2
), tot AS (SELECT sum(n) AS n FROM c),
am AS (SELECT y, sum(n) AS n FROM c GROUP BY y),
bm AS (SELECT yp, sum(n) AS n FROM c GROUP BY yp),
s AS (
  SELECT (SELECT sum(n*(n-1)/2) FROM c) AS sij,
         (SELECT sum(n*(n-1)/2) FROM am) AS sa,
         (SELECT sum(n*(n-1)/2) FROM bm) AS sb,
         (SELECT n*(n-1)/2 FROM tot) AS st,
         (SELECT n FROM tot) AS n,
         (SELECT sum(c.n/t.n * ln(t.n * c.n / (a.n * b.n)))
          FROM c JOIN am a USING (y) JOIN bm b USING (yp), tot t) AS mi,
         (SELECT -sum(am.n/t.n * ln(am.n/t.n)) FROM am, tot t) AS hy,
         (SELECT -sum(bm.n/t.n * ln(bm.n/t.n)) FROM bm, tot t) AS hp
)
SELECT round((sij - sa*sb/st) / ((sa+sb)/2 - sa*sb/st), 6) AS ari,
       round((st + 2*sij - sa - sb) / st, 6) AS rand,
       round(mi, 6) AS mi,
       round(mi/hy, 6) AS homogeneity,
       round(mi/hp, 6) AS completeness,
       round(2*(mi/hy)*(mi/hp)/(mi/hy + mi/hp), 6) AS v_measure
FROM s
"""


def q_regression_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mse / mae / r2 of the deterministic rule ŷ = 1000·l_quantity against
    l_extendedprice.  mse is ~1e7 so it is reported as log10 (scale-free);
    mae and r2 carry absolute rounding."""
    li = _t(spark, sf_dir, "lineitem").withColumn(
        "yhat", F.col("l_quantity") * 1000.0
    )
    mse = mean_squared_error(li, "l_extendedprice", "yhat")
    mae = mean_absolute_error(li, "l_extendedprice", "yhat")
    r2 = r2_score(li, "l_extendedprice", "yhat")
    return spark.createDataFrame(
        [(round(math.log10(mse), 6), round(mae, 4), round(r2, 6))],
        "log10_mse double, mae double, r2 double",
    )


_SQL_REGRESSION_METRICS = """
WITH d AS (
  SELECT l_extendedprice AS y, l_quantity * 1000.0 AS yhat FROM lineitem
)
SELECT round(log10(avg((y - yhat)^2)), 6) AS log10_mse,
       round(avg(abs(y - yhat)), 4) AS mae,
       round(1.0 - sum((y - yhat)^2)
                 / (sum(y^2) - count(*) * avg(y)^2), 6) AS r2
FROM d
"""


def q_prob_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """log_loss of a deterministic sigmoid scorer + KL(returnflag shares ‖
    uniform) — closed-form over exact counts (klDivergence.h)."""
    li = _t(spark, sf_dir, "lineitem")
    scored = li.select(
        (F.col("l_discount") > 0.05).cast("double").alias("y"),
        (1.0 / (1.0 + F.exp(-(F.col("l_quantity") - 25.0) / 10.0))).alias("p"),
    )
    ll = log_loss(scored, "y", "p")
    shares = (
        li.groupBy("l_returnflag")
        .agg(F.count("*").alias("n"))
        .select(
            (F.col("n") / F.sum("n").over(_W())).alias("p"),
            (F.lit(1.0) / F.count("*").over(_W())).alias("q"),
        )
    )
    kl = kl_divergence(shares, "p", "q")
    return spark.createDataFrame(
        [(round(ll, 6), round(kl, 6))], "log_loss double, kl_uniform double"
    )


def _W():
    from pyspark.sql import Window

    return Window.partitionBy()


_SQL_PROB_METRICS = """
WITH d AS (
  SELECT CASE WHEN l_discount > 0.05 THEN 1.0 ELSE 0.0 END AS y,
         1.0/(1.0 + exp(-(l_quantity - 25.0)/10.0)) AS p
  FROM lineitem
), ll AS (
  SELECT -avg(y * ln(least(1.0 - 1e-15, greatest(1e-15, p)))
            + (1.0 - y) * ln(1.0 - least(1.0 - 1e-15, greatest(1e-15, p)))) AS v
  FROM d
), shares AS (
  SELECT count(*)::DOUBLE AS n FROM lineitem GROUP BY l_returnflag
), kl AS (
  SELECT sum(p * ln(p / q)) AS v FROM (
    SELECT n / sum(n) OVER () AS p,
           1.0 / count(*) OVER () AS q
    FROM shares)
)
SELECT round(ll.v, 6) AS log_loss, round(kl.v, 6) AS kl_uniform FROM ll, kl
"""


QUERIES_METRICS = {
    "cluster_agreement": q_cluster_agreement,
    "regression_metrics": q_regression_metrics,
    "prob_metrics": q_prob_metrics,
}

ORACLES_METRICS = {
    "cluster_agreement": _SQL_CLUSTER_AGREEMENT,
    "regression_metrics": _SQL_REGRESSION_METRICS,
    "prob_metrics": _SQL_PROB_METRICS,
}
