"""Harness queries: DBSCAN (grid-pruned, distributed).

``dbscan_roles`` is D-class: the core/border/noise classification is a pure
function of the eps-graph and is replayed in DuckDB with self-joins.
``dbscan_cluster_sizes`` additionally needs connected components (not SQL) →
rows-only; its label partitions are asserted against a numpy BFS reference in
tests/test_dbscan.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cuml_spark.cluster import DBSCAN

_EPS, _MIN_SAMPLES = 0.35, 5


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return cust.select(
        F.col("c_custkey").alias("pid"),
        (F.col("c_acctbal") / 1000.0).alias("x1"),
        ((F.col("c_custkey") % 89) / 8.9).alias("x2"),
    )


def q_dbscan_roles(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    out = DBSCAN(eps=_EPS, min_samples=_MIN_SAMPLES).fit_predict(
        pts, ["x1", "x2"], id_col="pid", include_role=True
    )
    return out.select(F.col("pid").alias("c_custkey"), "role")


_SQL_DBSCAN_ROLES = f"""
WITH pts AS (
  SELECT c_custkey AS pid, c_acctbal/1000.0 AS x1, (c_custkey % 89)/8.9 AS x2
  FROM customer
), deg AS (
  SELECT a.pid, count(*) + 1 AS deg
  FROM pts a JOIN pts b ON a.pid != b.pid
   AND (a.x1-b.x1)*(a.x1-b.x1) + (a.x2-b.x2)*(a.x2-b.x2) <= {_EPS * _EPS}
  GROUP BY a.pid
), core AS (
  SELECT p.pid, p.x1, p.x2, coalesce(d.deg, 1) >= {_MIN_SAMPLES} AS is_core
  FROM pts p LEFT JOIN deg d USING (pid)
)
SELECT p.pid AS c_custkey,
       CASE WHEN p.is_core THEN 'core'
            WHEN EXISTS (
              SELECT 1 FROM core b
              WHERE b.is_core AND b.pid != p.pid
                AND (p.x1-b.x1)*(p.x1-b.x1) + (p.x2-b.x2)*(p.x2-b.x2)
                    <= {_EPS * _EPS}
            ) THEN 'border'
            ELSE 'noise' END AS role
FROM core p
"""


def q_dbscan_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster size distribution (labels need CC → rows-only check)."""
    pts = _points(spark, sf_dir)
    out = DBSCAN(eps=_EPS, min_samples=_MIN_SAMPLES).fit_predict(
        pts, ["x1", "x2"], id_col="pid"
    )
    return (
        out.groupBy("label").agg(F.count("*").alias("n_points"))
        .orderBy("label")
    )


QUERIES_CLUSTER = {
    "dbscan_roles": q_dbscan_roles,
    "dbscan_cluster_sizes": q_dbscan_cluster_sizes,
}

ORACLES_CLUSTER = {
    "dbscan_roles": _SQL_DBSCAN_ROLES,
}
