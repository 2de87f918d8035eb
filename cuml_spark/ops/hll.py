"""HyperLogLog distinct-count sketches (Flajolet et al. 2007): THE
cardinality tool at 100 TB — "how many distinct users / tokens / URLs
per group?" without ever shuffling the values themselves.  Spark ships
``approx_count_distinct`` (its own HLL++), but a pipeline that persists
or merges sketches across engines needs a PORTABLE register layout; this
one is md5-derived, so the identical computation runs on any engine with
md5 (and the DuckDB oracle replays it register-for-register).

Spark shape (100 TB): registers are ONE aggregation keyed by
``(group, bucket)`` — map-side combined ``max(rho)``, bounded at
``groups × 2^b`` rows by construction — followed by one group-keyed
reduce folding the ≤ 2^b register rows into the estimate.  The raw
values never cross the shuffle; a trillion-row group costs the same
reducer memory as a hundred-row group (the bounded-fit contract of
text/dsir.py).

Determinism (cross-engine bit-exactness): the hash is the first 8 md5
hex digits (32 bits, the ``token_bucket`` idiom); ``rho`` comes from
``length(bin(remainder))`` — both engines render minimal binary.  The
harmonic sum Σ 2^-M_j is EXACT in double (each term is dyadic ≥ 2^-33
and the total is < 2^b ≤ 2^14, so every partial sum fits the 53-bit
mantissa regardless of aggregation order — no fp-association flake),
and the bias constant alpha_m is computed from literals by identical
IEEE ops.  Only the small-range ``ln`` correction can differ in the
last ulp across engines, so estimates are rounded before comparison.

Accuracy: the standard 1.04/sqrt(2^b) relative error (b=10 → ~3.3%).
The 32-bit large-range correction is intentionally omitted: at
cardinalities approaching 2^32 callers should raise ``b``, not lean on
the correction's poor tail behavior.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["hll_alpha", "hll_bucket_rho", "hll_distinct", "hll_estimate_from_registers", "hll_registers"]

_HASH_BITS = 32


def hll_alpha(m: int) -> float:
    """Standard HLL bias constant for ``m = 2^b`` registers."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _rho(rem: Column, rem_bits: int) -> Column:
    """Position of the leftmost 1-bit of ``rem`` within ``rem_bits``
    bits, 1-based; ``rem_bits + 1`` when ``rem == 0`` (all zeros)."""
    return F.when(
        rem > 0, F.lit(rem_bits) - F.length(F.bin(rem)) + 1
    ).otherwise(F.lit(rem_bits + 1)).cast("int")


def hll_bucket_rho(value_col: str, *, b: int = 10) -> tuple[Column, Column]:
    """The (bucket, rho) column pair for one value — THE single
    definition of the register hash layout, shared by the batch
    aggregation below and the streaming register aggregation
    (streaming/pipeline.py), so the two can never desynchronize and
    sketches from either side merge register-for-register."""
    if not 4 <= b <= 14:
        raise ValueError(f"b must be in [4, 14], got {b}")
    rem_bits = _HASH_BITS - b
    h = F.conv(
        F.substring(F.md5(F.col(value_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    bucket = (h / (1 << rem_bits)).cast("int")
    rem = h % (1 << rem_bits)
    return bucket, _rho(rem, rem_bits)


def hll_registers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    *,
    b: int = 10,
) -> DataFrame:
    """→ (group_cols..., bucket, max_rho): the per-group HLL register
    table — ≤ ``2^b`` rows per group, absent buckets meaning register 0.
    ONE map-side-combined aggregation; null values are ignored (SQL
    ``count(distinct)`` convention)."""
    bucket, rho = hll_bucket_rho(value_col, b=b)
    return (
        df.where(F.col(value_col).isNotNull())
        .select(*group_cols, bucket.alias("bucket"), rho.alias("__rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("__rho").alias("max_rho"))
    )


def hll_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    *,
    b: int = 10,
    out_col: str = "approx_distinct",
) -> DataFrame:
    """→ (group_cols..., out_col): per-group HLL cardinality estimate
    with the standard small-range (linear counting) correction.  Two
    bounded shuffles: the register aggregation, then a ≤ 2^b-row-per-
    group fold into the estimate."""
    regs = hll_registers(df, group_cols, value_col, b=b)
    # absent buckets are zero registers: each adds 2^0 = 1 to the
    # harmonic sum and counts toward the linear-counting zero set
    # (handled inside the shared fold)
    return hll_estimate_from_registers(regs, group_cols, b=b, out_col=out_col)


def hll_error_bound(b: int) -> float:
    """The standard-error coefficient 1.04 / sqrt(2^b)."""
    return 1.04 / math.sqrt(1 << b)


def hll_estimate_from_registers(
    regs: DataFrame,
    group_cols: list[str],
    *,
    b: int = 10,
    rho_col: str = "max_rho",
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Fold a register table — (group_cols..., bucket, rho_col), absent
    buckets = zero registers — into per-group estimates.  The batch-side
    finalizer for :func:`hll_registers` and the streaming register
    aggregation (streaming/pipeline.py): registers are mergeable state,
    the estimate is a ≤ 2^b-row fold."""
    m = 1 << b
    alpha = hll_alpha(m)
    agg = regs.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col(rho_col))).alias("__s_hit"),
        F.count("*").alias("__hit"),
    )
    zeros = F.lit(m) - F.col("__hit")
    s = F.col("__s_hit") + zeros.cast("double")
    raw = F.lit(alpha * m * m) / s
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return agg.select(*group_cols, est.alias(out_col))
