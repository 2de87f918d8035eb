"""Rng uniform/normal, permute, reduce_cols_by_key (rng.h, permute.h,
reduce_cols_by_key.h) — moment envelopes and exact identities."""

import pytest
from pyspark.sql import functions as F

from cuml_spark.ops import permute, reduce_cols_by_key, rng_normal, rng_uniform


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 4000).select(F.col("id").alias("rid"))


def test_rng_uniform_moments(ids):
    r = rng_uniform(ids, "u", seed=3, low=2.0, high=4.0).select(
        F.avg("u").alias("m"), F.min("u").alias("lo"), F.max("u").alias("hi")
    ).first()
    assert 2.9 < r["m"] < 3.1
    assert r["lo"] >= 2.0 and r["hi"] <= 4.0


def test_rng_normal_moments(ids):
    r = rng_normal(ids, "z", seed=5, mu=10.0, sigma=2.0).select(
        F.avg("z").alias("m"), F.stddev("z").alias("s")
    ).first()
    assert 9.8 < r["m"] < 10.2
    assert 1.85 < r["s"] < 2.15


def test_rng_deterministic_for_seed(ids):
    a = rng_uniform(ids, "u", seed=11).select(F.sum("u")).first()[0]
    b = rng_uniform(ids, "u", seed=11).select(F.sum("u")).first()[0]
    c = rng_uniform(ids, "u", seed=12).select(F.sum("u")).first()[0]
    assert a == b
    assert a != c


def test_permute_is_permutation(ids):
    n = 4000
    r = permute(ids, ["rid"], seed=7).select(
        F.countDistinct("pos").alias("d"),
        F.sum("pos").alias("s"),
        F.avg(F.when(F.col("pos") - 1 != F.col("rid"), 1.0).otherwise(0.0)
              ).alias("moved"),
    ).first()
    assert r["d"] == n
    assert r["s"] == n * (n + 1) // 2
    assert r["moved"] > 0.99


def test_permute_deterministic(ids):
    a = permute(ids, ["rid"], seed=7).orderBy("rid").limit(5).collect()
    b = permute(ids, ["rid"], seed=7).orderBy("rid").limit(5).collect()
    assert a == b


def test_reduce_cols_by_key(spark):
    df = spark.createDataFrame(
        [(1.0, 2.0, 3.0, 4.0)], "a double, b double, c double, d double"
    )
    out = reduce_cols_by_key(df, ["a", "b", "c", "d"], [0, 1, 0, 1]).first()
    assert out["k0"] == 4.0  # a + c
    assert out["k1"] == 6.0  # b + d
    with pytest.raises(ValueError):
        reduce_cols_by_key(df, ["a"], [0, 1])
