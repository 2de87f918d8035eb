"""Source/sink layer: every supported format round-trips; the feature
validation funnel fires on read."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cuml_spark.io import read_table, write_table


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        [(1, 1.5, "a"), (2, 2.5, "b"), (3, 3.5, "a"), (4, 4.5, "c")],
        "id long, x double, grp string",
    )


@pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "json"])
def test_round_trip(frame, tmp_path, fmt):
    p = str(tmp_path / fmt)
    write_table(frame, p, format=fmt)
    schema = None if fmt in ("parquet", "orc") else "id long, x double, grp string"
    back = read_table(frame.sparkSession, p, format=fmt, schema=schema)
    assert sorted((r["id"], r["x"], r["grp"]) for r in back.collect()) == sorted(
        (r["id"], r["x"], r["grp"]) for r in frame.collect()
    )


def test_projection_reaches_scan(frame, tmp_path):
    p = str(tmp_path / "proj")
    write_table(frame, p)
    df = read_table(frame.sparkSession, p, columns=["id", "x"])
    assert df.columns == ["id", "x"]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "grp" not in plan.split("ReadSchema")[1][:200]  # pruned at the scan


def test_feature_validation_rejects_strings(frame, tmp_path):
    p = str(tmp_path / "val")
    write_table(frame, p)
    with pytest.raises(TypeError, match="non-numeric"):
        read_table(frame.sparkSession, p, feature_cols=["x", "grp"])


def test_null_rejection_opt_in(spark, tmp_path):
    df = spark.createDataFrame([(1, 1.0), (2, None)], "id long, x double")
    p = str(tmp_path / "nulls")
    write_table(df, p)
    # default: no extra scan, nulls pass through
    read_table(spark, p, feature_cols=["x"])
    with pytest.raises(ValueError, match="null"):
        read_table(spark, p, feature_cols=["x"], check_nulls=True)


def test_partitioned_sink_prunes(frame, tmp_path):
    p = str(tmp_path / "bykey")
    write_table(frame, p, partition_by="grp")
    back = read_table(frame.sparkSession, p).where(F.col("grp") == "a")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert back.count() == 2
    assert "PartitionFilters: [" in plan and "grp" in plan.split("PartitionFilters")[1][:120]


def test_write_refuses_clobber_by_default(frame, tmp_path):
    p = str(tmp_path / "clobber")
    write_table(frame, p)
    with pytest.raises(Exception):
        write_table(frame, p)  # mode='error'
    write_table(frame.limit(1), p, mode="overwrite")
    assert read_table(frame.sparkSession, p).count() == 1


def test_unknown_format_raises(frame, tmp_path):
    with pytest.raises(ValueError, match="format"):
        write_table(frame, str(tmp_path / "x"), format="avro")
    with pytest.raises(ValueError, match="format"):
        read_table(frame.sparkSession, str(tmp_path / "x"), format="avro")
