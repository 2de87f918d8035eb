"""Statistical primitives (cuML ``src_prims/stats``) as DataFrame aggregations.

Reference mapping (SURVEY.md §2.4):
- ``Stats::mean``   src_prims/stats/mean.h:82          → ``avg``
- ``Stats::stddev`` src_prims/stats/stddev.h:106       → ``stddev_samp``/``_pop``
- ``Stats::sum``    src_prims/stats/sum.h:79           → ``sum``
- ``Stats::minmax`` src_prims/stats/minmax.h:178       → ``min``/``max``
- ``Stats::cov``    src_prims/stats/cov.h:48           → pairwise ``covar_samp``
- ``histogram``     src_prims/stats/histogram.h:494    → width-bucket + count
- ``weighted_mean`` src_prims/stats/weighted_mean.h    → sum(w*x)/sum(w)
- ``meanCenter``    src_prims/stats/mean_center.h:41   → x - mean (broadcast join)

Scale notes: every function here is ONE whole-stage-codegen aggregate over the
input — a single scan, map-side partial aggregation, tiny shuffle (one row per
group), no Python in the hot path.  The covariance matrix is d² aggregates in
one pass; at d≲100 that is still a single cheap reduce (the reference holds the
same d×d on one GPU).  Outputs come back "long" (stat, column, value) so the
oracle harness can hash them deterministically.
"""

from __future__ import annotations

from itertools import combinations_with_replacement

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _long(df: DataFrame, agg_cols, stat: str) -> DataFrame:
    """Aggregate then unpivot to (col, <stat>) long form, ordered by col name."""
    row = df.agg(*agg_cols)
    stack_expr = ", ".join(f"'{c}', `{c}`" for c in row.columns)
    return row.selectExpr(
        f"stack({len(row.columns)}, {stack_expr}) as (col, {stat})"
    )


def col_means(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column mean → DataFrame[col: string, mean: double]."""
    return _long(df, [F.avg(c).alias(c) for c in cols], "mean")


def col_sum(df: DataFrame, cols: list[str]) -> DataFrame:
    return _long(df, [F.sum(c).alias(c) for c in cols], "sum")


def col_stddev(df: DataFrame, cols: list[str], sample: bool = True) -> DataFrame:
    fn = F.stddev_samp if sample else F.stddev_pop
    return _long(df, [fn(c).alias(c) for c in cols], "stddev")


def col_minmax(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column min & max in one scan → (col, min, max)."""
    row = df.agg(
        *[F.min(c).alias(f"min_{c}") for c in cols],
        *[F.max(c).alias(f"max_{c}") for c in cols],
    )
    stack_expr = ", ".join(f"'{c}', `min_{c}`, `max_{c}`" for c in cols)
    return row.selectExpr(f"stack({len(cols)}, {stack_expr}) as (col, min, max)")


def covariance_matrix(df: DataFrame, cols: list[str], sample: bool = True) -> DataFrame:
    """Full covariance matrix in ONE aggregate pass.

    Returns the upper triangle (col_x ≤ col_y lexicographically is NOT assumed;
    we emit the (i, j) i≤j triangle in input order) as
    DataFrame[col_x, col_y, cov].  Equivalent of cuML's GEMM-on-centered-data
    (src_prims/stats/cov.h:48) — Spark's covar_samp is the same single-pass
    E[xy]-E[x]E[y] with Welford-style merging, map-side combined.
    """
    fn = F.covar_samp if sample else F.covar_pop
    aggs = []
    pairs = list(combinations_with_replacement(cols, 2))
    for i, (a, b) in enumerate(pairs):
        aggs.append(fn(a, b).alias(f"c{i}"))
    row = df.agg(*aggs)
    stack_expr = ", ".join(f"'{a}', '{b}', `c{i}`" for i, (a, b) in enumerate(pairs))
    return row.selectExpr(f"stack({len(pairs)}, {stack_expr}) as (col_x, col_y, cov)")


def correlation_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pearson correlation matrix, same shape as covariance_matrix."""
    aggs = []
    pairs = list(combinations_with_replacement(cols, 2))
    for i, (a, b) in enumerate(pairs):
        aggs.append(F.corr(a, b).alias(f"c{i}"))
    row = df.agg(*aggs)
    stack_expr = ", ".join(f"'{a}', '{b}', `c{i}`" for i, (a, b) in enumerate(pairs))
    return row.selectExpr(f"stack({len(pairs)}, {stack_expr}) as (col_x, col_y, corr)")


def histogram(df: DataFrame, col: str, lo: float, hi: float, n_bins: int) -> DataFrame:
    """Fixed-width histogram → (bin: int, count: long), bins clamped to [0, n_bins-1].

    cuML's 8 histogram strategies (stats/histogram.h:39-67) are pure perf
    variants of the same semantics; here it is a width-bucket expression feeding
    a hash aggregate — partial counts map-side, one row per bin shuffled.
    """
    w = (hi - lo) / n_bins
    bin_col = F.least(
        F.lit(n_bins - 1),
        F.greatest(F.lit(0), F.floor((F.col(col) - lo) / w).cast("int")),
    ).alias("bin")
    return df.select(bin_col).groupBy("bin").agg(F.count("*").alias("count"))


def weighted_mean(df: DataFrame, col: str, weight: str) -> DataFrame:
    """sum(w*x)/sum(w) → DataFrame[wmean: double].

    Reference: src_prims/stats/weighted_mean.h:37-63.
    """
    return df.agg(
        (F.sum(F.col(col) * F.col(weight)) / F.sum(weight)).alias("wmean")
    )


def mean_center(df: DataFrame, cols: list[str], add: bool = False,
                means: dict[str, float] | None = None) -> DataFrame:
    """Subtract (or add back) per-column means; passthrough of other columns.

    Reference: src_prims/stats/mean_center.h:41 (meanCenter) / :64 (meanAdd).
    Implemented as a broadcast join against the 1-row means aggregate — NOT a
    window over the whole frame (``avg(c) over ()`` forces a single-partition
    window at scale; the tiny-aggregate + broadcast keeps the big side intact).

    ``means``: optional precomputed per-column means (the reference's ``mu``
    argument).  Required for a meanAdd round-trip: ``add=True`` on an
    already-centered frame must add back the ORIGINAL means, which cannot be
    recomputed from the centered data (they are ~0 there).
    """
    if means is not None:
        missing = [c for c in cols if c not in means]
        if missing:
            raise ValueError(f"means missing for columns {missing}")
        sess = df.sparkSession
        means_df = sess.createDataFrame(
            [tuple(float(means[c]) for c in cols)],
            ", ".join(f"__mean_{c} double" for c in cols),
        )
    else:
        means_df = df.agg(*[F.avg(c).alias(f"__mean_{c}") for c in cols])
    op = (lambda c: F.col(c) + F.col(f"__mean_{c}")) if add else (
        lambda c: F.col(c) - F.col(f"__mean_{c}")
    )
    out = df.crossJoin(F.broadcast(means_df))
    return out.select(
        *[c for c in df.columns if c not in cols],
        *[op(c).alias(c) for c in cols],
    )


def describe_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """One-pass (count, mean, stddev, min, max, sum) per column, long form.

    The fused "everything in one scan" convenience the reference gets from
    running several prims on one resident device matrix.
    """
    row = df.agg(
        *[F.count(c).alias(f"n_{c}") for c in cols],
        *[F.avg(c).alias(f"avg_{c}") for c in cols],
        *[F.stddev_samp(c).alias(f"std_{c}") for c in cols],
        *[F.min(c).alias(f"min_{c}") for c in cols],
        *[F.max(c).alias(f"max_{c}") for c in cols],
        *[F.sum(c).alias(f"sum_{c}") for c in cols],
    )
    stack_expr = ", ".join(
        f"'{c}', `n_{c}`, `avg_{c}`, `std_{c}`, `min_{c}`, `max_{c}`, `sum_{c}`"
        for c in cols
    )
    return row.selectExpr(
        f"stack({len(cols)}, {stack_expr}) as (col, n, mean, stddev, min, max, sum)"
    )
