"""HyperLogLog sketch tests (ops/hll.py)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F


def _ref_registers(values, b):
    """Pure-python register table for a single group."""
    rem_bits = 32 - b
    regs = {}
    for v in values:
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)
        bucket, rem = h >> rem_bits, h % (1 << rem_bits)
        rho = rem_bits - rem.bit_length() + 1 if rem else rem_bits + 1
        regs[bucket] = max(regs.get(bucket, 0), rho)
    return regs


def test_hll_registers_match_python(spark):
    from cuml_spark.ops.hll import hll_registers

    vals = [f"tok{i}" for i in range(500)]
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v string")
    got = {
        r["bucket"]: r["max_rho"]
        for r in hll_registers(df, ["g"], "v", b=8).collect()
    }
    assert got == _ref_registers(vals, 8)


def test_hll_estimate_within_error_bound(spark):
    from cuml_spark.ops.hll import hll_distinct, hll_error_bound

    b = 10
    for n in (50, 1000, 20000):
        df = spark.range(n).select(
            F.lit("g").alias("g"),
            F.concat(F.lit("value-"), F.col("id")).alias("v"))
        est = hll_distinct(df, ["g"], "v", b=b).collect()[0]["approx_distinct"]
        # 5 standard errors: deterministic hash, so this never flakes
        assert abs(est - n) / n <= 5 * hll_error_bound(b), (n, est)


def test_hll_duplicates_do_not_inflate(spark):
    from cuml_spark.ops.hll import hll_distinct

    base = spark.range(300).select(
        F.lit("g").alias("g"),
        F.concat(F.lit("k"), F.col("id")).alias("v"))
    dup = base.union(base).union(base)
    one = hll_distinct(base, ["g"], "v", b=10).collect()[0]["approx_distinct"]
    three = hll_distinct(dup, ["g"], "v", b=10).collect()[0]["approx_distinct"]
    assert one == three


def test_hll_partitioning_invariance(spark):
    from cuml_spark.ops.hll import hll_distinct

    df = spark.range(2000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.concat(F.lit("u"), F.col("id") % 700).alias("v"))
    a = {r["g"]: r["approx_distinct"]
         for r in hll_distinct(df.coalesce(1), ["g"], "v").collect()}
    bb = {r["g"]: r["approx_distinct"]
          for r in hll_distinct(df.repartition(16), ["g"], "v").collect()}
    assert a == bb  # exact-dyadic harmonic sum: bit-equal on any layout


def test_hll_null_and_validation(spark):
    from cuml_spark.ops.hll import hll_distinct

    df = spark.createDataFrame(
        [("g", "x"), ("g", None), ("g", "y")], "g string, v string")
    est = hll_distinct(df, ["g"], "v", b=10).collect()[0]["approx_distinct"]
    assert est == pytest.approx(2, abs=0.5)  # nulls ignored
    with pytest.raises(ValueError, match="b must"):
        hll_distinct(df, ["g"], "v", b=20)


def test_hll_registers_merge_by_max(spark):
    """Mergeability — the property that makes sketches shard-safe: the
    register-wise MAX of two half-corpus sketches equals the whole-corpus
    sketch, so per-shard sketches union before folding."""
    from pyspark.sql import functions as F

    from cuml_spark.ops.hll import hll_registers

    df = spark.range(3000).select(
        F.lit("g").alias("g"), F.concat(F.lit("u"), F.col("id") % 1100).alias("v"))
    whole = {r["bucket"]: r["max_rho"]
             for r in hll_registers(df, ["g"], "v", b=9).collect()}
    h1 = {r["bucket"]: r["max_rho"] for r in hll_registers(
        df.where(F.col("v").substr(2, 10).cast("long") % 2 == 0),
        ["g"], "v", b=9).collect()}
    h2 = {r["bucket"]: r["max_rho"] for r in hll_registers(
        df.where(F.col("v").substr(2, 10).cast("long") % 2 == 1),
        ["g"], "v", b=9).collect()}
    merged = dict(h1)
    for k, v in h2.items():
        merged[k] = max(merged.get(k, 0), v)
    assert merged == whole
