"""Exact-quantile tests (ops/quantiles.py): python order-statistic
replay, percentile_disc rank convention, degenerate shapes, NULL/NaN
handling, and the no-global-sort plan contract."""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cuml_spark.ops.quantiles import exact_quantiles

SET = settings(max_examples=12, deadline=None)


def _disc(sorted_vals, p):
    return sorted_vals[max(1, math.ceil(p * len(sorted_vals))) - 1]


def test_exact_quantiles_matches_python_replay(spark):
    vals = [float(v) for v in [7, 1, 5, 3, 9, 2, 8, 4, 6, 0]]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = dict(exact_quantiles(df, "x", [0.1, 0.5, 0.9, 1.0],
                               n_buckets=4, collect_threshold=2))
    s = sorted(vals)
    for p, v in got.items():
        assert v == _disc(s, p)


def test_exact_quantiles_duplicates_and_constant(spark):
    # heavy duplicate mass: intervals collapse to a point, still exact
    vals = [2.0] * 50 + [5.0] * 50
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = dict(exact_quantiles(df, "x", [0.25, 0.5, 0.75],
                               n_buckets=4, collect_threshold=3))
    assert got == {0.25: 2.0, 0.5: 2.0, 0.75: 5.0}
    const = spark.createDataFrame([(1.5,)] * 20, "x double")
    assert exact_quantiles(const, "x", [0.5], collect_threshold=3) == [(0.5, 1.5)]


def test_exact_quantiles_nulls_and_empty(spark):
    df = spark.createDataFrame([(1.0,), (None,), (3.0,)], "x double")
    # NULLs excluded: n=2, median = rank ceil(.5*2)=1 -> 1.0
    assert exact_quantiles(df, "x", [0.5], collect_threshold=1) == [(0.5, 1.0)]
    empty = spark.createDataFrame([(None,)], "x double")
    assert exact_quantiles(empty, "x", [0.5]) == [(0.5, None)]


def test_exact_quantiles_validation(spark):
    df = spark.createDataFrame([(1.0,)], "x double")
    with pytest.raises(ValueError, match="prob"):
        exact_quantiles(df, "x", [0.0])
    with pytest.raises(ValueError, match="probs"):
        exact_quantiles(df, "x", [])
    with pytest.raises(ValueError, match="n_buckets"):
        exact_quantiles(df, "x", [0.5], n_buckets=1)
    nan = spark.createDataFrame([(1.0,), (float("nan"),)], "x double")
    with pytest.raises(ValueError, match="NaN"):
        exact_quantiles(nan, "x", [0.5])
    inf = spark.createDataFrame([(1.0,), (float("inf"),)], "x double")
    with pytest.raises(ValueError, match="NaN/inf"):
        exact_quantiles(inf, "x", [0.5])


@SET
@given(
    vals=st.lists(
        st.one_of(st.integers(-50, 50).map(float),
                  st.floats(-1e6, 1e6, allow_nan=False, width=32)),
        min_size=1, max_size=120),
    probs=st.lists(st.sampled_from([0.01, 0.2, 0.5, 0.8, 0.99, 1.0]),
                   min_size=1, max_size=4, unique=True),
    buckets=st.sampled_from([2, 4, 16]),
    thresh=st.sampled_from([1, 5, 50]),
)
def test_exact_quantiles_property(spark, vals, probs, buckets, thresh):
    """For ANY values (duplicates, negatives, float32 noise) and ANY
    bucket/threshold config: the result is the exact percentile_disc
    order statistic from the python sorted replay."""
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = dict(exact_quantiles(df, "x", probs,
                               n_buckets=buckets, collect_threshold=thresh,
                               max_passes=12))
    s = sorted(vals)
    for p in probs:
        assert got[p] == _disc(s, p), (p, got[p], _disc(s, p))


def test_exact_quantiles_no_global_sort_plan(spark):
    """The refinement histogram must be a map-side-combined aggregation
    (partial HashAggregate before the exchange), never a full Sort of
    the data — the final TakeOrdered runs only over a bounded interval."""
    from pyspark.sql import functions as F

    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    base = li.select(F.col("l_extendedprice").alias("__v")).where(
        F.col("__v").isNotNull())
    staged = base.select(
        F.floor((F.col("__v")) / F.lit(1000.0)).cast("int").alias("b_0"))
    hist = staged.select(F.expr("stack(1, 0, b_0) AS (j, b)")).where(
        F.col("b").isNotNull()).groupBy("j", "b").count()
    plan = hist._jdf.queryExecution().executedPlan().toString()
    assert "Sort" not in plan
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_exact_quantiles_edge_straddling_value(spark):
    """Regression (r10 review): a data value within ~1 ulp of a computed
    bucket edge must not be double-counted or lost — classification is
    by edge COMPARISON, not floor division, so executor membership and
    driver interval bounds agree exactly."""
    lo, hi = -538266.9169180314, -319485.87957956153
    w = (hi - lo) / 64
    edge61 = lo + 61 * w  # a value floor-classification misplaces
    vals = [edge61] * 5 + [lo + i * (hi - lo) / 49 for i in range(50)] + [hi] * 5
    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    s = sorted(vals)
    got = dict(exact_quantiles(df, "x", [0.84, 0.88, 0.91],
                               n_buckets=64, collect_threshold=2,
                               max_passes=12))
    for p in (0.84, 0.88, 0.91):
        assert got[p] == _disc(s, p), (p, got[p], _disc(s, p))


def test_exact_quantiles_duplicate_mass_beyond_threshold(spark):
    """Regression (r10 review): a duplicate mass larger than
    collect_threshold freezes at double resolution and must return the
    DATA value via the bounded distinct-value histogram — never a
    computed interval edge a few ulps off."""
    v0 = -319485.87957956153
    vals = [v0] * 400 + [v0 + 1000.0] * 50
    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    got = dict(exact_quantiles(df, "x", [0.5, 0.95],
                               n_buckets=8, collect_threshold=100,
                               max_passes=20))
    assert got[0.5] == v0           # exactly the data value
    assert got[0.95] == v0 + 1000.0
