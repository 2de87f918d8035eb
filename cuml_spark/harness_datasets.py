"""Harness query: seeded dataset generators (blobs.pyx:77, regression.pyx:75).

S-class generation (seeded RNG inside mapInPandas) with a D-class projection:
exact row/label counts from the parameters, cluster means inside the
center_box ± cluster_std envelope, and — because noise=0 — the regression
target must satisfy y = X·w + bias EXACTLY (max abs residual < 1e-9 over all
rows).  A broken per-partition seeding, dropped partition, or wrong linear
combination flips a boolean or a count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cuml_spark.datasets import make_blobs, make_regression

_BLOB_N, _BLOB_K, _REG_N, _REG_D = 5000, 3, 4000, 3


def q_generator_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    blobs = make_blobs(
        spark, n_samples=_BLOB_N, n_features=2, centers=_BLOB_K,
        cluster_std=1.0, random_state=11,
    )
    reg, coef = make_regression(
        spark, n_samples=_REG_N, n_features=_REG_D, bias=4.2, noise=0.0,
        random_state=11, coef=True,
    )
    expr = F.lit(4.2)
    for i, w in enumerate(coef):
        expr = expr + F.col(f"f{i}") * float(w)
    # the two generator probes are independent single-job chains — overlap
    # them (guide §2.6; results identical, r12)
    from cuml_spark.core.session import run_overlapped

    bstats, rrow = run_overlapped(
        lambda: blobs.agg(
            F.count("*").alias("n"),
            F.countDistinct("label").alias("k"),
            F.avg("f0").alias("m0"),
            F.avg("f1").alias("m1"),
        ).first(),
        lambda: reg.agg(
            F.count("*").alias("n"),
            F.max(F.abs(F.col("y") - expr)).alias("max_resid"),
        ).first(),
    )
    means_ok = abs(bstats["m0"]) <= 13.0 and abs(bstats["m1"]) <= 13.0
    return spark.createDataFrame(
        [(
            int(bstats["n"]), int(bstats["k"]), bool(means_ok),
            int(rrow["n"]), bool(rrow["max_resid"] < 1e-9),
        )],
        "blob_n long, blob_k int, blob_means_in_box boolean, "
        "reg_n long, reg_exact boolean",
    )


_SQL_GENERATOR_CHECKS = f"""
SELECT CAST({_BLOB_N} AS BIGINT) AS blob_n, {_BLOB_K} AS blob_k,
       true AS blob_means_in_box,
       CAST({_REG_N} AS BIGINT) AS reg_n, true AS reg_exact
"""

QUERIES_DATASETS = {"generator_checks": q_generator_checks}
ORACLES_DATASETS = {"generator_checks": _SQL_GENERATOR_CHECKS}
