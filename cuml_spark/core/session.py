"""SparkSession factory with scale-oriented defaults.

cuML's ``cuml.Handle`` (reference: python/cuml/common/handle.pyx:32-72) owns the
CUDA stream and allocators; the Spark-native analog is simply the SparkSession
plus its config.  The defaults below are what we want on a real cluster too:
AQE on (runtime re-planning + skew-join handling), Arrow on (every
pandas-UDF hop is Arrow-batched), sensible shuffle parallelism for local[32].
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "cuml_spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    On a real cluster most of these are cluster-conf; setting them here is
    harmless (existing session wins) and makes local runs representative.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # pin tz so LTZ timestamp <-> date/day bucketing is host-independent
        # (and matches DuckDB's naive-timestamp arithmetic in the oracles)
        .config("spark.sql.session.timeZone", "UTC")
        # driver testdata writes TIMESTAMP(NANOS) parquet; Spark reads them as
        # long nanoseconds with this legacy flag (no nanos timestamp type yet)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if not SparkSession.getActiveSession():
        builder = builder.master(os.environ.get("SPARK_MASTER", f"local[{cpus}]"))
    return builder.getOrCreate()


def ensure_parallelism(df, min_parts: int | None = None):
    """Round-robin repartition up to the session's default parallelism when
    the plan currently yields fewer partitions.

    Why: a parquet file exposes at most one scan split per row group, so a
    single-row-group file (the local testdata) caps every downstream stage —
    iterative fits, pandas-UDF scoring, cached working sets — at parallelism
    1 regardless of core count.  On a real cluster a 100 TB table scans as
    thousands of row-group splits (`getNumPartitions() >= cores`) and this
    returns the input unchanged, so the call is free at scale; locally it
    trades one narrow shuffle of the working set for full-core execution of
    everything after it.
    """
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
