"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``cuml_spark.harness``; this file stays thin.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: closed-form OLS (cuML LinearRegression) on sf0.001 lineitem."""
    from cuml_spark.harness import q_ols_multi_revenue

    return q_ols_multi_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from cuml_spark.harness import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from cuml_spark.harness import ORACLES

    return dict(ORACLES)
