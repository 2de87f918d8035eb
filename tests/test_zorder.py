"""Z-order layout key tests (ops/zorder.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _ref_interleave(bx, by, bits):
    z = 0
    for b in range(bits):
        z |= ((bx >> b) & 1) << (2 * b)
        z |= ((by >> b) & 1) << (2 * b + 1)
    return z


def test_zorder_key_matches_python(spark):
    import random

    from cuml_spark.ops.zorder import zorder_key

    rng = random.Random(5)
    rows = [(i, rng.uniform(-10, 10), rng.uniform(0, 100)) for i in range(300)]
    df = spark.createDataFrame(rows, "rid long, x double, y double")
    bits = 8
    got = {r["rid"]: r["zkey"] for r in zorder_key(df, ["x", "y"], bits=bits).collect()}

    xs, ys = [r[1] for r in rows], [r[2] for r in rows]
    nx, xx, ny, xy = min(xs), max(xs), min(ys), max(ys)
    span = (1 << bits) - 1
    import math
    for rid, x, y in rows:
        bx = min(span, max(0, math.floor((x - nx) / (xx - nx) * span)))
        by = min(span, max(0, math.floor((y - ny) / (xy - ny) * span)))
        assert got[rid] == _ref_interleave(bx, by, bits), rid


def test_zorder_locality_beats_single_column_sort(spark):
    """The point of Z-order: walking the curve keeps BOTH dimensions
    local.  On a full grid, consecutive rows in zkey order move far less
    in y than consecutive rows in x-major order."""
    from cuml_spark.ops.zorder import zorder_key

    n = 32
    rows = [(i * n + j, float(i), float(j)) for i in range(n) for j in range(n)]
    df = spark.createDataFrame(rows, "rid long, x double, y double")
    keyed = zorder_key(df, ["x", "y"], bits=5)

    def y_travel(ordered):
        ys = [r["y"] for r in ordered]
        return sum(abs(b - a) for a, b in zip(ys, ys[1:]))

    z_travel = y_travel(keyed.orderBy("zkey", "rid").collect())
    x_travel = y_travel(keyed.orderBy("x", "y", "rid").collect())
    # x-major order pays a full n-length y-jump at every row boundary;
    # the z curve pays O(1) most steps (measured 651 vs 1953 on 32x32)
    assert z_travel < x_travel / 2


def test_zorder_layout_range_partitions(spark):
    from cuml_spark.ops.zorder import zorder_layout

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    out = zorder_layout(li, ["l_extendedprice", "l_quantity"], bits=8,
                        num_partitions=4)
    assert out.rdd.getNumPartitions() <= 4
    assert out.count() == li.count()
    assert "__zkey" not in out.columns


def test_zorder_validation(spark):
    from cuml_spark.ops.zorder import zorder_key

    df = spark.createDataFrame([(1.0, 2.0, 3.0)], "a double, b double, c double")
    with pytest.raises(ValueError, match="exactly 2"):
        zorder_key(df, ["a", "b", "c"])
    with pytest.raises(ValueError, match="bits"):
        zorder_key(df, ["a", "b"], bits=0)
    # degenerate span (constant column) maps to bucket 0, no crash
    one = spark.createDataFrame([(1.0, 5.0), (2.0, 5.0)], "x double, y double")
    keys = {r["zkey"] for r in zorder_key(one, ["x", "y"], bits=4).collect()}
    assert keys == {0, 0b0101010101010101 & 0b01010101}  # y bucket 0 always
