"""Harness entries: sparse graph prims, cluster dispersion, scalar functions.

Covers SURVEY §2.4 sparse COO/CSR rows (coo.h / csr.h), Stats::dispersion
(src_prims/metrics/dispersion.h:53-129) and the src_prims/functions scalar
layer — each with a DuckDB oracle.

Graph construction for the oracle-checkable CC query: nations grouped by
region form disjoint star graphs (hub = min nationkey per region), so the
weak-CC answer is closed-form in SQL (component = min nationkey over the
region) — no recursive CTE needed, and the Spark side still exercises the
real iterative min-label propagation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cuml_spark.functions import sigmoid, soft_threshold
from cuml_spark.metrics.dispersion import cluster_dispersion_df
from cuml_spark.ops.sparse import connected_components, row_normalize_l1
from cuml_spark.core.session import read_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, f"{sf_dir}/{name}.parquet")


def q_graph_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weak CC (csr.h:853) on the nation-region star graph."""
    nation = _t(spark, sf_dir, "nation")
    hub = nation.groupBy("n_regionkey").agg(F.min("n_nationkey").alias("hub"))
    edges = (
        nation.join(hub, "n_regionkey")
        .filter(F.col("n_nationkey") != F.col("hub"))
        .select(F.col("n_nationkey").alias("src"), F.col("hub").alias("dst"))
    )
    out = connected_components(edges, src="src", dst="dst")
    return out.select(
        F.col("vertex").cast("long").alias("vertex"),
        F.col("component").cast("long").alias("component"),
    )


_SQL_GRAPH_CONNECTED_COMPONENTS = """
SELECT n_nationkey::BIGINT AS vertex,
       (min(n_nationkey) OVER (PARTITION BY n_regionkey))::BIGINT AS component
FROM nation
-- singleton regions have no edges, hence no vertex in the CC output
QUALIFY count(*) OVER (PARTITION BY n_regionkey) > 1
"""


def q_sparse_row_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """csr_row_normalize_l1 (csr.h:299) over the order→supplier quantity
    bipartite edge list.  Still checked per-edge, but reported as bucketed
    exact-integer checksums: each edge contributes round(value·1e6) —
    an exact bigint on both engines — to its row-hash bucket, so any single
    edge's row/col/value changing flips a bucket, while the result stays
    bounded (997 rows) instead of scaling with the edge count."""
    li = _t(spark, sf_dir, "lineitem")
    # ONE exchange total on the big side: pre-partition by row so the
    # (row, col) hash-agg, the row-sum window inside row_normalize_l1, and
    # the per-edge checksum projection all run within the same partitioning
    # (hash(row) satisfies clustering for (row, col) and for the window);
    # only the 997-bucket partial-agg merge shuffles after that.
    edges = (
        li.select(
            F.col("l_orderkey").alias("row"),
            F.col("l_suppkey").alias("col"),
            F.col("l_quantity").alias("q"),
        )
        .repartition("row")
        .groupBy("row", "col")
        .agg(F.sum("q").alias("value"))
    )
    out = row_normalize_l1(edges, row="row", value="value")
    micro = F.round(F.col("value") * 1e6, 0).cast("long")
    return (
        out.select(
            (F.col("row") % 997).cast("int").alias("bucket"),
            micro.alias("micro"),
            (micro * ((F.col("row") * 31 + F.col("col")) % 100003)).alias("term"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_edges"),
            F.sum("micro").alias("sum_micro"),
            F.sum("term").alias("chk"),
        )
    )


_SQL_SPARSE_ROW_NORMALIZE = """
WITH e AS (
  SELECT l_orderkey AS row, l_suppkey AS col, sum(l_quantity) AS value
  FROM lineitem GROUP BY 1, 2
), norm AS (
  SELECT row, col,
         round(1e6 * (value / sum(abs(value)) OVER (PARTITION BY row)))::BIGINT
           AS micro
  FROM e
)
SELECT (row % 997)::INT AS bucket, count(*) AS n_edges,
       sum(micro)::BIGINT AS sum_micro,
       sum(micro * ((row * 31 + col) % 100003))::BIGINT AS chk
FROM norm GROUP BY 1
"""


def q_cluster_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stats::dispersion (dispersion.h:53-129) with l_returnflag as labels."""
    li = _t(spark, sf_dir, "lineitem")
    out = cluster_dispersion_df(
        li, ["l_quantity", "l_extendedprice", "l_discount"], "l_returnflag"
    )
    return out.select(F.round("dispersion", 4).alias("dispersion"))


_SQL_CLUSTER_DISPERSION = """
WITH c AS (
  SELECT l_returnflag, count(*)::DOUBLE AS n,
         avg(l_quantity) AS c1, avg(l_extendedprice) AS c2, avg(l_discount) AS c3
  FROM lineitem GROUP BY 1
), m AS (
  SELECT sum(n * c1) / sum(n) AS m1, sum(n * c2) / sum(n) AS m2,
         sum(n * c3) / sum(n) AS m3
  FROM c
)
SELECT round(sqrt(sum(n * ((c1-m1)*(c1-m1) + (c2-m2)*(c2-m2) + (c3-m3)*(c3-m3)))), 4)
       AS dispersion
FROM c, m
"""


def q_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """src_prims/functions scalar layer as codegen'd Column exprs."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.sum(sigmoid(F.col("l_discount") * 10)), 4).alias("sum_sigmoid"),
        F.round(F.sum(soft_threshold(F.col("l_discount") - 0.05, 0.02)), 4).alias(
            "sum_softthres"
        ),
    )


_SQL_SCALAR_FUNCTIONS = """
SELECT round(sum(1.0 / (1.0 + exp(-(l_discount * 10)))), 4) AS sum_sigmoid,
       round(sum(CASE WHEN abs(l_discount - 0.05) > 0.02
                      THEN (CASE WHEN l_discount - 0.05 >= 0 THEN 1 ELSE -1 END)
                           * (abs(l_discount - 0.05) - 0.02)
                      ELSE 0 END), 4) AS sum_softthres
FROM lineitem
"""


def q_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LinAlg gemm-accumulated XᵀX (gemm.h:78 via ops.linalg.gram_matrix) —
    one shuffle-free aggregate pass; D-class.  Entries are reported
    scale-free (column cosine g_ij/√(g_ii·g_jj) + log10 magnitude) because
    raw sums ~1e14 are not reproducible to fixed decimals across reduction
    orders."""
    import math

    from cuml_spark.ops.linalg import gram_matrix

    li = _t(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    g = gram_matrix(li, cols)
    rows = [
        (i, j,
         round(float(g[i, j] / math.sqrt(g[i, i] * g[j, j])), 6),
         round(math.log10(float(g[i, j])), 6))
        for i in range(3)
        for j in range(3)
    ]
    return spark.createDataFrame(rows, "i int, j int, cosine double, log10_value double")


_SQL_GRAM_MATRIX = """
WITH s AS (
  SELECT sum(l_quantity*l_quantity) AS g00,
         sum(l_quantity*l_extendedprice) AS g01,
         sum(l_quantity*l_discount) AS g02,
         sum(l_extendedprice*l_extendedprice) AS g11,
         sum(l_extendedprice*l_discount) AS g12,
         sum(l_discount*l_discount) AS g22
  FROM lineitem
)
SELECT 0 AS i, 0 AS j, round(g00/sqrt(g00*g00), 6) AS cosine, round(log10(g00), 6) AS log10_value FROM s
UNION ALL SELECT 0, 1, round(g01/sqrt(g00*g11), 6), round(log10(g01), 6) FROM s
UNION ALL SELECT 0, 2, round(g02/sqrt(g00*g22), 6), round(log10(g02), 6) FROM s
UNION ALL SELECT 1, 0, round(g01/sqrt(g00*g11), 6), round(log10(g01), 6) FROM s
UNION ALL SELECT 1, 1, round(g11/sqrt(g11*g11), 6), round(log10(g11), 6) FROM s
UNION ALL SELECT 1, 2, round(g12/sqrt(g11*g22), 6), round(log10(g12), 6) FROM s
UNION ALL SELECT 2, 0, round(g02/sqrt(g00*g22), 6), round(log10(g02), 6) FROM s
UNION ALL SELECT 2, 1, round(g12/sqrt(g11*g22), 6), round(log10(g12), 6) FROM s
UNION ALL SELECT 2, 2, round(g22/sqrt(g22*g22), 6), round(log10(g22), 6) FROM s
"""


QUERIES_GRAPH = {
    "graph_connected_components": q_graph_connected_components,
    "sparse_row_normalize": q_sparse_row_normalize,
    "cluster_dispersion": q_cluster_dispersion,
    "scalar_functions": q_scalar_functions,
    "gram_matrix": q_gram_matrix,
}

ORACLES_GRAPH = {
    "graph_connected_components": _SQL_GRAPH_CONNECTED_COMPONENTS,
    "sparse_row_normalize": _SQL_SPARSE_ROW_NORMALIZE,
    "cluster_dispersion": _SQL_CLUSTER_DISPERSION,
    "scalar_functions": _SQL_SCALAR_FUNCTIONS,
    "gram_matrix": _SQL_GRAM_MATRIX,
}
