"""Hypertable-style time-bucket rollups (TimescaleDB continuous
aggregates re-expressed): maintain per-(fine-bucket, key) PARTIAL
aggregates and answer coarser-granularity queries by re-aggregating the
partials — never re-reading raw events.  The backbone of event
dashboards at 100 TB: the raw table is touched once per ingest window,
and every zoom level (hour → day → month) folds the tier below.

Spark shape (100 TB):

- ``rollup_partials`` is ONE map-side-combined aggregation keyed by
  ``(bucket, keys...)`` — the classic pre-aggregation contract: a
  billion raw events collapse to (n_buckets × n_keys) partial rows.
- ``rollup_reaggregate`` folds partials to any coarser bucket width
  (which must be an integer multiple of the fine width — validated, or
  buckets would straddle) with another bounded aggregation over the
  ALREADY-TINY partial table.  Associative partial forms only: count
  and sum re-add, min/min and max/max fold, avg derives as sum/n at
  read time (the decomposition that makes re-aggregation exact — an
  avg-of-avgs would be wrong under uneven buckets, so avg is never
  stored).
- Buckets are integer-micro floors (``us div width``) — exact, engine-
  portable, and aligned across tiers by the multiple check.

The correctness law (pinned by tests and the harness oracle): rollup
from partials == direct aggregation over raw events, for every coarser
granularity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cuml_spark.tsa.sessions import _ts_micros

__all__ = ["rollup_partials", "rollup_reaggregate"]


def rollup_partials(
    events: DataFrame,
    *,
    bucket_s: int,
    keys: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """→ (bucket_us, keys..., n, sum_value, min_value, max_value): the
    fine-granularity partial-aggregate tier.  ``bucket_us`` is the
    bucket's inclusive start in epoch micros.  Null values are ignored
    for sum/min/max but still counted in ``n`` (SQL aggregate
    convention for count(*))."""
    if bucket_s <= 0:
        raise ValueError(f"bucket_s must be > 0, got {bucket_s}")
    width = int(bucket_s) * 1_000_000
    # exact-integer FLOOR bucketing: `a - pmod(a, w)` == floor(a/w)*w
    # for any sign of `a` (plain `div` truncates toward zero, which
    # would put pre-epoch events in a bucket STARTING AFTER them and
    # break rollup_reaggregate's nesting law); identical to div for
    # the nonnegative-micros common case
    base = events.select(
        _ts_micros(events, ts_col).alias("__tus"), *keys,
        F.col(value_col).alias("__v"))
    bucket = F.expr(f"__tus - pmod(__tus, {width})").cast("long")
    return (
        base.select(bucket.alias("bucket_us"), *keys, "__v")
        .groupBy("bucket_us", *keys)
        .agg(
            F.count("*").alias("n"),
            F.sum("__v").alias("sum_value"),
            F.min("__v").alias("min_value"),
            F.max("__v").alias("max_value"),
        )
    )


def rollup_reaggregate(
    partials: DataFrame,
    *,
    fine_bucket_s: int,
    coarse_bucket_s: int,
    keys: list[str],
) -> DataFrame:
    """Fold a :func:`rollup_partials` tier into coarser buckets —
    ``coarse_bucket_s`` must be a positive integer multiple of
    ``fine_bucket_s`` so every fine bucket nests in exactly one coarse
    bucket.  Exact: counts/sums re-add, min/max fold; derive
    ``avg = sum_value / n`` at read time."""
    if fine_bucket_s <= 0 or coarse_bucket_s <= 0:
        raise ValueError("bucket widths must be > 0")
    if coarse_bucket_s % fine_bucket_s:
        raise ValueError(
            f"coarse bucket ({coarse_bucket_s}s) must be an integer multiple "
            f"of the fine bucket ({fine_bucket_s}s) — otherwise fine buckets "
            "straddle coarse boundaries and the rollup is not exact")
    width = int(coarse_bucket_s) * 1_000_000
    # same floor-bucketing as rollup_partials (sign-safe pmod form)
    bucket = F.expr(f"bucket_us - pmod(bucket_us, {width})").cast("long")
    return (
        partials.groupBy(bucket.alias("bucket_us"), *keys)
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
    )
