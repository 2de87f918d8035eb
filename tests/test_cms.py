"""Count-min sketch tests (ops/cms.py)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F


def _ref_cms(items, depth, width):
    counts = [[0] * width for _ in range(depth)]
    for key, w in items:
        for i in range(depth):
            j = int(hashlib.md5(f"{key}:{i}".encode()).hexdigest()[:8], 16) % width
            counts[i][j] += w
    return counts


def test_cms_counters_match_python(spark):
    from cuml_spark.ops.cms import fit_cms

    rows = [(f"k{i % 17}",) for i in range(300)]
    df = spark.createDataFrame(rows, "k string")
    m = fit_cms(df, "k", depth=3, width=64, hash_scheme="per_row")
    ref = _ref_cms([(k, 1) for (k,) in rows], 3, 64)
    assert [list(r) for r in m.counts] == ref
    assert m.total == 300


def test_cms_never_undercounts(spark):
    from collections import Counter

    from cuml_spark.ops.cms import fit_cms

    rows = [(f"tok{i % 97}",) for i in range(2000)]
    df = spark.createDataFrame(rows, "k string")
    m = fit_cms(df, "k", depth=4, width=256)
    exact = Counter(k for (k,) in rows)
    for k, c in exact.items():
        assert m.estimate(k) >= c
    # additive error bound holds for every key (Markov gives it w.h.p.;
    # with deterministic hashing this is a fixed fact of the fixture)
    assert all(m.estimate(k) - c <= m.error_bound() * 4 for k, c in exact.items())


def test_cms_estimate_col_matches_driver_estimate(spark):
    from cuml_spark.ops.cms import cms_estimate_col, fit_cms

    rows = [(f"w{i % 23}",) for i in range(500)]
    df = spark.createDataFrame(rows, "k string")
    m = fit_cms(df, "k", depth=4, width=128)
    keys = df.distinct()
    got = {r["k"]: r["est"] for r in keys.select(
        "k", cms_estimate_col(m, F.col("k")).alias("est")).collect()}
    assert got == {k: m.estimate(k) for (k,) in keys.collect()}


def test_cms_weighted_fit(spark):
    from cuml_spark.ops.cms import fit_cms

    df = spark.createDataFrame(
        [("a", 10), ("b", 5), ("a", 3)], "k string, w long")
    m = fit_cms(df, "k", depth=4, width=64, weight_col="w")
    assert m.estimate("a") >= 13
    assert m.total == 18


def test_cms_validation(spark):
    from cuml_spark.ops.cms import fit_cms

    with pytest.raises(ValueError, match="depth"):
        fit_cms(None, "k", depth=0)
    with pytest.raises(ValueError, match="width"):
        fit_cms(None, "k", width=1)


def test_cms_counters_merge_by_addition(spark):
    """Mergeability: cell-wise ADDITION of two disjoint-shard sketches
    equals the whole-corpus sketch — per-shard CMS tables sum before
    querying."""
    from pyspark.sql import functions as F

    from cuml_spark.ops.cms import CountMinSketch, fit_cms

    df = spark.range(2000).select(
        F.concat(F.lit("t"), F.col("id") % 53).alias("k"),
        F.col("id").alias("i"))
    whole = fit_cms(df, "k", depth=3, width=128)
    a = fit_cms(df.where(F.col("i") % 2 == 0), "k", depth=3, width=128)
    b = fit_cms(df.where(F.col("i") % 2 == 1), "k", depth=3, width=128)
    merged = [
        [a.counts[i][j] + b.counts[i][j] for j in range(128)]
        for i in range(3)
    ]
    assert [list(r) for r in whole.counts] == merged
    assert whole.total == a.total + b.total


def test_cms_sliced_scheme_matches_python_and_never_undercounts(spark):
    """The 'sliced' scheme — the r11 DEFAULT (ONE md5 per key, rows take
    digest slices): counters equal the python replay, point estimates
    never undercount, the column path agrees with the driver path, and
    an unadorned fit_cms now produces exactly these counters."""
    import hashlib
    from collections import Counter

    from pyspark.sql import functions as F

    from cuml_spark.ops.cms import cms_estimate_col, fit_cms

    df = spark.range(1500).select(
        F.concat(F.lit("w"), F.col("id") % 37).alias("k"))
    m = fit_cms(df, "k", depth=4, width=64, hash_scheme="sliced")
    truth = Counter(f"w{i % 37}" for i in range(1500))
    expect = [[0] * 64 for _ in range(4)]
    for key, c in truth.items():
        d = hashlib.md5(key.encode()).hexdigest()
        for i in range(4):
            expect[i][int(d[8 * i:8 * i + 8], 16) % 64] += c
    assert [list(r) for r in m.counts] == expect
    for key, c in truth.items():
        assert m.estimate(key) >= c
    col_est = {
        r["k"]: r["e"]
        for r in df.distinct().select(
            "k", cms_estimate_col(m, F.col("k")).alias("e")).collect()
    }
    assert col_est == {k: m.estimate(k) for k in truth}
    # the default IS sliced since r11 (flipped with the harness oracle)
    m0 = fit_cms(df, "k", depth=4, width=64)
    assert m0.scheme == "sliced"
    assert [list(r) for r in m0.counts] == expect
    # per_row stays available explicitly (pre-r11 parity, depth > 4)
    mp = fit_cms(df, "k", depth=4, width=64, hash_scheme="per_row")
    d0 = hashlib.md5(b"w0:0").hexdigest()
    assert mp.scheme == "per_row"
    assert mp.counts[0][int(d0[:8], 16) % 64] >= truth["w0"]


def test_cms_sliced_validation(spark):
    import pytest
    from pyspark.sql import functions as F

    from cuml_spark.ops.cms import fit_cms

    df = spark.range(5).select(F.col("id").cast("string").alias("k"))
    with pytest.raises(ValueError, match="depth must be <= 4"):
        fit_cms(df, "k", depth=5, hash_scheme="sliced")
    with pytest.raises(ValueError, match="hash_scheme"):
        fit_cms(df, "k", hash_scheme="xxhash")


def test_cms_direct_construction_validation():
    import pytest

    from cuml_spark.ops.cms import CountMinSketch

    with pytest.raises(ValueError, match="depth must be <= 4"):
        CountMinSketch(depth=5, width=8, total=0,
                       counts=tuple(tuple([0] * 8) for _ in range(5)),
                       scheme="sliced")
    with pytest.raises(ValueError, match="scheme"):
        CountMinSketch(depth=1, width=8, total=0,
                       counts=((0,) * 8,), scheme="xxhash")


def test_cms_pre_scheme_pickle_defaults_to_per_row(spark):
    """A model pickled before the scheme field existed restores without
    it — both query paths must default it to per_row, not crash."""
    from pyspark.sql import functions as F

    from cuml_spark.ops.cms import CountMinSketch, cms_estimate_col, fit_cms

    df = spark.createDataFrame([("a",)] * 7 + [("b",)] * 3, "k string")
    # pre-scheme sketches were per_row by construction — replay that
    m = fit_cms(df, "k", depth=2, width=16, hash_scheme="per_row")
    legacy = object.__new__(CountMinSketch)  # __dict__ restore, no init
    object.__setattr__(legacy, "depth", m.depth)
    object.__setattr__(legacy, "width", m.width)
    object.__setattr__(legacy, "total", m.total)
    object.__setattr__(legacy, "counts", m.counts)
    assert legacy.estimate("a") == m.estimate("a") >= 7
    got = {r["k"]: r["e"] for r in df.distinct().select(
        "k", cms_estimate_col(legacy, F.col("k")).alias("e")).collect()}
    assert got == {"a": m.estimate("a"), "b": m.estimate("b")}
