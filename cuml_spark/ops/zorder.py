"""Z-order (Morton) interleaved sort keys: multi-column data layout for
scan locality — the engine behind lakehouse ``OPTIMIZE ZORDER BY``
(Delta/Iceberg) re-expressed as plain Spark.  Writing a 100 TB table
range-partitioned by a Z-key clusters rows that are close in EVERY keyed
dimension into the same files, so min/max file statistics prune scans
for predicates on ANY prefix-free subset of the keyed columns — the
layout complement to partition pruning (one column) that a multi-tenant
training-data lake needs for (source, date), (lang, quality-bucket) or
(domain, length) access patterns.

Spark shape (100 TB): the key is pure in-row integer bit-interleaving —
zero shuffle to COMPUTE; the one intentional shuffle is the
``repartitionByRange(zkey)`` the caller runs to actually lay files out
(Spark samples range boundaries — the standard total-order machinery).
Column normalization to ``2^bits`` buckets uses a broadcast min/max
(one stats row), keeping the map exact-integer.

Engine portability: interleaving is Σ_b ((x>>b & 1) << 2b | (y>>b & 1)
<< 2b+1) over exact integers — bit-identical in any engine; the DuckDB
oracle replays keys value-for-value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_key", "zorder_layout"]


def _interleave2(x: Column, y: Column, bits: int) -> Column:
    """Morton-interleave the low ``bits`` of two non-negative ints:
    x's bit b lands at position 2b, y's at 2b+1."""
    terms = []
    for b in range(bits):
        terms.append(
            F.shiftleft(F.shiftrightunsigned(x, b).bitwiseAND(F.lit(1)), 2 * b)
        )
        terms.append(
            F.shiftleft(F.shiftrightunsigned(y, b).bitwiseAND(F.lit(1)), 2 * b + 1)
        )
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out


def zorder_key(
    df: DataFrame,
    cols: list[str],
    *,
    bits: int = 16,
    out_col: str = "zkey",
) -> DataFrame:
    """Append ``out_col``: the Morton key over exactly two numeric
    columns, each first normalized to ``[0, 2^bits)`` rank buckets by a
    broadcast min/max scale (nulls map to bucket 0).  Higher dimensions
    compose by re-interleaving, at the usual locality decay; two columns
    is the sweet spot the lakehouse engines default to.

    The computation is map-only; run ``repartitionByRange(out_col)``
    (see :func:`zorder_layout`) to realize the layout.
    """
    if len(cols) != 2:
        raise ValueError(f"zorder_key interleaves exactly 2 columns, got {len(cols)}")
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    cx, cy = (F.col(c).cast("double") for c in cols)
    stats = df.agg(
        F.min(cx).alias("__nx"), F.max(cx).alias("__xx"),
        F.min(cy).alias("__ny"), F.max(cy).alias("__xy"),
    ).first()
    span = (1 << bits) - 1

    def bucket(c: Column, lo, hi) -> Column:
        if lo is None or hi is None or hi == lo:
            return F.lit(0).cast("long")
        scaled = F.floor((c - float(lo)) / (float(hi) - float(lo)) * span)
        return F.coalesce(
            F.greatest(F.lit(0), F.least(F.lit(span), scaled)), F.lit(0)
        ).cast("long")

    bx = bucket(cx, stats["__nx"], stats["__xx"])
    by = bucket(cy, stats["__ny"], stats["__xy"])
    return df.withColumn(out_col, _interleave2(bx, by, bits))


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    *,
    bits: int = 16,
    num_partitions: int | None = None,
) -> DataFrame:
    """The full layout pass: compute the Z-key, range-partition on it
    (ONE total-order shuffle — the cost every OPTIMIZE pays), and drop
    the key.  Writing the result gives files whose per-column min/max
    stats are tight in both keyed dimensions."""
    keyed = zorder_key(df, cols, bits=bits, out_col="__zkey")
    parts = num_partitions or keyed.sparkSession.conf.get(
        "spark.sql.shuffle.partitions"
    )
    return keyed.repartitionByRange(int(parts), F.col("__zkey")).drop("__zkey")
