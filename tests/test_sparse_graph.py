"""Tests: ops.sparse (COO/CSR prims, weak CC), metrics.dispersion,
functions scalar layer — vs numpy/pure-python oracles."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from cuml_spark.functions import (
    elasticnet_penalty,
    hinge_loss,
    logistic_loss,
    sigmoid,
    sign,
    soft_threshold,
    squared_loss,
)
from cuml_spark.metrics.dispersion import cluster_dispersion
from cuml_spark.ops.sparse import (
    connected_components,
    coo_remove_zeros,
    coo_symmetrize,
    row_normalize_l1,
    row_normalize_max,
)


@pytest.fixture(scope="module")
def edges(spark):
    rows = [(0, 1, 2.0), (1, 2, 4.0), (0, 2, 0.0), (2, 0, 6.0), (1, 0, -2.0)]
    return spark.createDataFrame(rows, "row int, col int, value double")


def test_coo_remove_zeros(edges):
    got = coo_remove_zeros(edges).collect()
    assert len(got) == 4
    assert all(r.value != 0 for r in got)


def test_coo_symmetrize_default_mean(edges):
    out = {(r.row, r.col): r.value for r in coo_symmetrize(edges).collect()}
    # in(0,1)=2, in(1,0)=-2 → mean 0; in(1,2)=4, in(2,1) missing → 2
    assert out[(0, 1)] == pytest.approx(0.0)
    assert out[(1, 0)] == pytest.approx(0.0)
    assert out[(1, 2)] == pytest.approx(2.0)
    assert out[(2, 1)] == pytest.approx(2.0)
    # symmetric by construction
    for (i, j), v in out.items():
        assert out[(j, i)] == pytest.approx(v)


def test_row_normalize_l1(edges):
    got = {(r.row, r.col): r.value for r in row_normalize_l1(edges).collect()}
    # row 0: |2| + |0| + |6|? no — (2,0,6.0) is row 2. row 0 has 2.0, 0.0 → sum 2
    assert got[(0, 1)] == pytest.approx(1.0)
    assert got[(0, 2)] == pytest.approx(0.0)
    # row 1: |4| + |-2| = 6
    assert got[(1, 2)] == pytest.approx(4 / 6)
    assert got[(1, 0)] == pytest.approx(-2 / 6)


def test_row_normalize_max(edges):
    got = {(r.row, r.col): r.value for r in row_normalize_max(edges).collect()}
    assert got[(1, 2)] == pytest.approx(1.0)
    assert got[(1, 0)] == pytest.approx(-0.5)


def test_connected_components_two_chains(spark):
    # chain 0-1-2-3, pair 10-11, self-contained triangle 20-21-22
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20)],
        "src int, dst int",
    )
    got = {r.vertex: r.component for r in connected_components(e).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_connected_components_long_chain_bounded_plan(spark):
    """A 400-vertex path needs many propagation rounds; the per-round
    lineage truncation must keep the analyzed plan bounded (before the
    localCheckpoint fix the plan nested ~2^rounds and OOMed the driver in
    plan analysis) and the doubling must still converge to min-id labels."""
    n = 400
    e = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], "src int, dst int")
    out = connected_components(e, max_iter=30)
    got = {r.vertex: r.component for r in out.collect()}
    assert got == {i: 0 for i in range(n)}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert len(plan) < 100_000  # truncated lineage, not 2^rounds nesting


def test_cluster_dispersion_vs_numpy(spark):
    rng = np.random.default_rng(7)
    pts = rng.normal(size=(300, 2))
    labels = rng.integers(0, 4, size=300)
    df = spark.createDataFrame(
        [(float(a), float(b), int(l)) for (a, b), l in zip(pts, labels)],
        "x double, y double, lbl int",
    )
    got = cluster_dispersion(df, ["x", "y"], "lbl")

    # oracle: dispersion.h math in numpy
    cents = np.array([pts[labels == k].mean(axis=0) for k in range(4)])
    ns = np.array([(labels == k).sum() for k in range(4)], dtype=float)
    mu = (cents * ns[:, None]).sum(axis=0) / ns.sum()
    want = math.sqrt(float((ns * ((cents - mu) ** 2).sum(axis=1)).sum()))
    assert got == pytest.approx(want, rel=1e-9)


def test_scalar_functions_vs_numpy(spark):
    xs = np.linspace(-3, 3, 13)
    df = spark.createDataFrame([(float(x),) for x in xs], "x double")
    out = df.select(
        sigmoid("x").alias("sig"),
        sign("x", 2.0).alias("sgn"),
        soft_threshold("x", 1.0).alias("st"),
        hinge_loss(F.lit(1.0), "x").alias("hinge"),
        logistic_loss(F.lit(-1.0), "x").alias("ll"),
        squared_loss(F.lit(0.5), "x").alias("sq"),
    ).collect()
    for r, x in zip(out, xs):
        assert r.sig == pytest.approx(1 / (1 + math.exp(-x)), rel=1e-12)
        assert r.sgn == pytest.approx(2.0 * np.sign(x))
        assert r.st == pytest.approx(np.sign(x) * max(abs(x) - 1.0, 0.0))
        assert r.hinge == pytest.approx(max(0.0, 1.0 - x))
        assert r.ll == pytest.approx(math.log1p(math.exp(x)), rel=1e-9)
        assert r.sq == pytest.approx((0.5 - x) ** 2 / 2)


def test_elasticnet_penalty_scalar(spark):
    df = spark.createDataFrame([(3.0, 5.0)], "sabs double, ssq double")
    got = df.select(
        elasticnet_penalty("sabs", "ssq", alpha=0.5, l1_ratio=0.4).alias("p")
    ).first().p
    assert got == pytest.approx(0.5 * 0.4 * 3.0 + 0.5 * 0.6 * 5.0)


def test_csr_add_merges_structures(spark):
    """csr_add (csr.h:535): union of structures, values summed on overlap."""
    a = spark.createDataFrame(
        [(0, 0, 1.0), (0, 1, 2.0), (1, 1, 3.0)], "row int, col int, value double"
    )
    b = spark.createDataFrame(
        [(0, 1, 10.0), (2, 0, 5.0)], "row int, col int, value double"
    )
    from cuml_spark.ops.sparse import csr_add

    got = {(r["row"], r["col"]): r["value"] for r in csr_add(a, b).collect()}
    assert got == {(0, 0): 1.0, (0, 1): 12.0, (1, 1): 3.0, (2, 0): 5.0}
