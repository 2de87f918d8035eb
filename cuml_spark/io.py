"""Source/sink layer: typed table ingestion and egress.

The reference funnels every input through ``input_to_dev_array``
(python/cuml/utils/input_utils.py:71-239): accept several container types,
validate dtype/shape/nulls, hand the kernels one dense matrix.  The
Spark-native analog ingests TABLES — parquet (columnar, row-group-splittable,
the 100 TB default), ORC, CSV, and JSON-lines — and funnels feature columns
into the same validation layer every estimator uses
(``core/validation.check_features``: numeric-only, opt-in null rejection,
column-count checks).

Egress mirrors ingestion: ``write_table`` is a thin, mode-explicit wrapper
so pipelines can land results partitioned by a key column (the layout that
keeps downstream scans pruned at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cuml_spark.core.validation import check_features

FORMATS = ("parquet", "orc", "csv", "json")


def read_table(
    spark: SparkSession,
    path: str,
    format: str = "parquet",
    schema: str | None = None,
    columns: list[str] | None = None,
    feature_cols: list[str] | None = None,
    check_nulls: bool = False,
    **options: str,
) -> DataFrame:
    """Read a table from any supported source format.

    - ``columns`` projects early so column pruning reaches the scan;
    - ``feature_cols`` runs the estimator-grade validation funnel on those
      columns (numeric-only; ``check_nulls=True`` adds the reference's hard
      null rejection, one aggregate scan — opt-in, as everywhere else);
    - CSV defaults to ``header=true`` and infers the schema only when none
      is given (schema inference is an extra pass — pass ``schema`` at
      scale).
    """
    if format not in FORMATS:
        raise ValueError(f"format must be one of {FORMATS}, got {format!r}")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if format == "csv":
        options.setdefault("header", "true")
        if schema is None:
            options.setdefault("inferSchema", "true")
    df = getattr(reader.options(**options), format)(path)
    if columns:
        df = df.select(*columns)
    if feature_cols:
        check_features(df, feature_cols, check_nulls=check_nulls)
    return df


def write_table(
    df: DataFrame,
    path: str,
    format: str = "parquet",
    mode: str = "error",
    partition_by: list[str] | str | None = None,
    **options: str,
) -> None:
    """Write a table; ``mode`` is explicit (default ``error`` — refuse to
    clobber) and ``partition_by`` lands one directory per key value so
    later scans partition-prune on it."""
    if format not in FORMATS:
        raise ValueError(f"format must be one of {FORMATS}, got {format!r}")
    if format == "csv":
        options.setdefault("header", "true")  # match read_table's default
    writer = df.write.mode(mode).options(**options)
    if partition_by:
        keys = [partition_by] if isinstance(partition_by, str) else list(partition_by)
        writer = writer.partitionBy(*keys)
    getattr(writer, format)(path)
