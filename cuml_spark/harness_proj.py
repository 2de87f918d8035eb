"""Harness queries: random projection / silhouette / trustworthiness.

All three are D-class.  The random-projection oracle bakes the seeded
projection matrix into the SQL as literals (the matrix is a deterministic
function of the seed, generated identically at query-build time), so DuckDB
replays the exact GEMM with ``list_dot_product``.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cuml_spark.decomposition import GaussianRandomProjection
from cuml_spark.metrics import silhouette_samples, trustworthiness
from cuml_spark.core.session import read_table

_RP_K, _RP_SEED = 4, 3


def q_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, f"{sf_dir}/embeddings.parquet").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    rp = GaussianRandomProjection(n_components=_RP_K, random_state=_RP_SEED).fit(
        emb, vec_col="embedding"
    )
    out = rp.transform(emb)
    return out.select(
        "vec_id",
        *[
            F.round(F.element_at("projection", j + 1), 4).alias(f"p{j}")
            for j in range(_RP_K)
        ],
    )


def _sql_random_projection() -> str:
    # regenerate the identical seeded matrix (64 input dims in the testdata)
    rng = np.random.RandomState(_RP_SEED)
    W = rng.standard_normal((64, _RP_K)) / np.sqrt(_RP_K)
    cols = []
    for j in range(_RP_K):
        lits = ", ".join(repr(float(v)) for v in W[:, j])
        cols.append(
            f"round(list_dot_product(embedding::DOUBLE[], [{lits}]), 4) AS p{j}"
        )
    return "SELECT vec_id, " + ", ".join(cols) + " FROM embeddings"


def q_silhouette_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-point silhouette.  ``sample_size=4000`` is the documented scale
    contract for this O(N²) metric: inactive at the sf0.01 correctness scale
    (1,500 customers → exact, matching the SQL oracle row-for-row), active at
    bench/production scales so the quadratic stage stays bounded."""
    cust = read_table(spark, f"{sf_dir}/customer.parquet")
    pts = cust.select(
        "c_custkey",
        (F.col("c_acctbal") / 1000.0).alias("x1"),
        ((F.col("c_custkey") % 89) / 8.9).alias("x2"),
        F.col("c_mktsegment").alias("seg"),
    )
    out = silhouette_samples(pts, ["x1", "x2"], "seg", "c_custkey",
                             sample_size=4000)
    return out.select("c_custkey", F.round("silhouette", 6).alias("silhouette"))


_SQL_SILHOUETTE = """
WITH pts AS (
  SELECT c_custkey AS pid, c_acctbal/1000.0 AS x1, (c_custkey % 89)/8.9 AS x2,
         c_mktsegment AS label
  FROM customer
), sizes AS (
  SELECT label, count(*) AS n FROM pts GROUP BY label
), pair AS (
  SELECT a.pid AS a_id, a.label AS a_label, b.label AS b_label,
         sqrt((a.x1-b.x1)*(a.x1-b.x1) + (a.x2-b.x2)*(a.x2-b.x2)) AS dist
  FROM pts a JOIN pts b ON a.pid != b.pid
), agg AS (
  SELECT a_id, a_label, b_label, sum(dist) AS sum_dist
  FROM pair GROUP BY 1, 2, 3
), ab AS (
  SELECT a_id,
         max(CASE WHEN a_label = b_label AND s.n > 1
                  THEN sum_dist / (s.n - 1) END) AS a_val,
         min(CASE WHEN a_label != b_label THEN sum_dist / s.n END) AS b_val
  FROM agg JOIN sizes s ON s.label = agg.b_label
  GROUP BY a_id
)
SELECT a_id AS c_custkey,
       round(CASE WHEN a_val IS NULL OR b_val IS NULL THEN 0.0
                  ELSE (b_val - a_val) / greatest(a_val, b_val) END, 6)
         AS silhouette
FROM ab
"""


def q_trustworthiness_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, f"{sf_dir}/embeddings.parquet")
    orig = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("x"))
    sliced = emb.select(
        "vec_id", F.slice(F.col("embedding").cast("array<double>"), 1, 2).alias("x")
    )
    t = trustworthiness(orig, sliced, n_neighbors=5, id_col="vec_id")
    return spark.createDataFrame([(round(float(t), 6),)], "trust double")


_SQL_TRUSTWORTHINESS = """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings
), pair AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         list_distance(a.x, b.x)^2 AS d_orig,
         (a.x[1]-b.x[1])^2 + (a.x[2]-b.x[2])^2 AS d_emb
  FROM e a JOIN e b ON a.vec_id != b.vec_id
), ranked AS (
  SELECT a_id,
         row_number() OVER (PARTITION BY a_id ORDER BY d_orig, b_id) AS r_orig,
         row_number() OVER (PARTITION BY a_id ORDER BY d_emb, b_id) AS r_emb
  FROM pair
), pen AS (
  SELECT coalesce(sum(r_orig - 5), 0)::DOUBLE AS penalty
  FROM ranked WHERE r_emb <= 5 AND r_orig > 5
), n AS (SELECT count(*)::DOUBLE AS n FROM e)
SELECT round(1.0 - (2.0 / (n.n * 5 * (2*n.n - 3*5 - 1))) * pen.penalty, 6) AS trust
FROM pen, n
"""


QUERIES_PROJ = {
    "random_projection": q_random_projection,
    "silhouette_customers": q_silhouette_customers,
    "trustworthiness_slice": q_trustworthiness_slice,
}

ORACLES_PROJ = {
    "random_projection": _sql_random_projection(),
    "silhouette_customers": _SQL_SILHOUETTE,
    "trustworthiness_slice": _SQL_TRUSTWORTHINESS,
}
