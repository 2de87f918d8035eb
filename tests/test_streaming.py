"""Streaming Kalman vs its batch twin: same recursion, state across batches."""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import numpy as np
import pytest

from cuml_spark.streaming import streaming_local_level_filter
from cuml_spark.tsa import local_level_filter


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="kstream_")
    yield Path(d)
    shutil.rmtree(d, ignore_errors=True)


def test_streaming_kalman_matches_batch(spark, tmpdir):
    rng = np.random.RandomState(21)
    series = {s: np.cumsum(rng.standard_normal(40)) for s in ("a", "b")}
    rows = [
        (s, t, float(y[t])) for s, y in series.items() for t in range(40)
    ]
    in_dir = tmpdir / "in"
    in_dir.mkdir()
    chk = str(tmpdir / "chk")

    def write_chunk(name, chunk_rows):
        df = spark.createDataFrame(chunk_rows, "series_id string, t long, y double")
        df.coalesce(1).write.mode("overwrite").parquet(str(tmpdir / "stage" / name))
        src = next((tmpdir / "stage" / name).glob("*.parquet"))
        shutil.copy(src, in_dir / f"{name}.parquet")

    # first half of each series arrives in batch 1
    write_chunk("chunk1", [r for r in rows if r[1] < 20])

    stream = spark.readStream.schema("series_id string, t long, y double").parquet(
        str(in_dir)
    )
    filtered = streaming_local_level_filter(stream, q=0.01, r=1.0)
    query = (
        filtered.writeStream.format("memory")
        .queryName("kstream_out")
        .option("checkpointLocation", chk)
        .outputMode("append")
        .start()
    )
    try:
        query.processAllAvailable()
        # second half arrives in batch 2 — state must carry over
        write_chunk("chunk2", [r for r in rows if r[1] >= 20])
        query.processAllAvailable()
        out = spark.sql("select * from kstream_out").toPandas()
    finally:
        query.stop()

    assert len(out) == len(rows)
    for s, y in series.items():
        got = out[out["series_id"] == s].sort_values("t")["x"].to_numpy()
        x_ref, _ = local_level_filter(y, q=0.01, r=1.0)
        np.testing.assert_allclose(got, x_ref, rtol=1e-9)
