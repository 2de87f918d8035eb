"""Scalable EXACT quantiles by iterative histogram refinement — the
distributed-selection algorithm (Blum et al.'s selection problem at
cluster scale; the same refinement loop Spark's own
``approxQuantile`` forgoes for a Greenwald-Khanna sketch).  Unlike
``percentile_approx`` this returns the EXACT order statistic, and
unlike SQL ``percentile_disc`` it never globally sorts: each pass is
ONE map-side-combined conditional-count aggregation, so a 100 TB
column costs a handful of full scans and zero shuffles of data rows —
only tiny count frames ever move.

Algorithm, per target rank k (1-based, ``ceil(p * n)`` — the SQL
``percentile_disc`` / DuckDB ``quantile_disc`` convention, so the
oracle can twin it):

1. one stats pass: n (non-null), min, max;
2. refinement passes: split each rank's live interval ``[lo, hi]``
   into ``n_buckets`` equal-width cells, count every cell for every
   rank in ONE aggregation (conditional sums — the counts for all
   ranks ride the same scan), then step the interval to the cell
   containing the rank and add the cells below to ``count_below``;
3. once a rank's live interval holds ≤ ``collect_threshold`` rows (or
   collapses to a point / stops splitting at double resolution), the
   remaining selection is ``orderBy(col).limit(needed)`` over the
   interval — Spark plans it as TakeOrderedAndProject (per-partition
   top-k, never a global sort), and the needed-th smallest is the max
   of that bounded prefix.

Determinism: counts are exact integers; bucket edges are pure driver
arithmetic on (lo, hi); the final order statistic is an element OF the
data, identical on any partitioning.  NULLs are excluded (SQL
aggregate convention); NaNs are rejected up front (they poison value
comparisons in any engine).

Worst case: values concentrated so a cell never shrinks below the
threshold (massive duplicate mass) — then the interval collapses to a
single point in ≤ 1 extra pass (duplicates ARE the answer) since equal
values all land in one cell of zero width.  ``max_passes`` guards the
loop; on exhaustion the final TakeOrdered runs with whatever interval
remains (still exact, just a bigger limit).

No cuML counterpart (dense-matrix data model); first-class here like
the sketch tier (ops/hll.py, ops/cms.py).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["exact_quantiles"]


def exact_quantiles(
    df: DataFrame,
    col: str,
    probs: list[float],
    *,
    n_buckets: int = 64,
    collect_threshold: int = 100_000,
    max_passes: int = 16,
) -> list[tuple[float, float | None]]:
    """→ ``[(p, value), ...]`` where ``value`` is the EXACT
    ``percentile_disc(p)`` order statistic of ``df[col]`` (the element
    at 1-based rank ``ceil(p * n)`` over non-null values), or None for
    an all-null/empty column.  See the module docstring for the scan
    shape; total cost ≈ ``2 + passes`` full scans regardless of data
    size, with only O(n_buckets × len(probs)) counts ever leaving the
    executors."""
    if not probs:
        raise ValueError("probs must be non-empty")
    for p in probs:
        if not (0.0 < p <= 1.0):
            raise ValueError(f"each prob must be in (0, 1], got {p}")
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    c = F.col(col)
    base = df.select(c.alias("__v")).where(F.col("__v").isNotNull())
    stats = base.agg(
        F.count("*").alias("n"),
        F.min("__v").alias("mn"),
        F.max("__v").alias("mx"),
        F.max(F.isnan(F.col("__v").cast("double")).cast("int")).alias("has_nan"),
    ).first()
    n = stats["n"]
    if n == 0:
        return [(p, None) for p in probs]
    if stats["has_nan"]:
        raise ValueError(f"column {col!r} contains NaN — filter it first")
    # state per rank: (k, lo, hi, below) — k-th smallest overall lies in
    # [lo, hi] with exactly `below` values strictly below lo
    state = {}
    for p in probs:
        k = max(1, math.ceil(p * n))
        state[p] = (k, float(stats["mn"]), float(stats["mx"]), 0, n)
    for _ in range(max_passes):
        live = {
            p: (k, lo, hi, below, cnt)
            for p, (k, lo, hi, below, cnt) in state.items()
            if lo < hi and cnt > collect_threshold
        }
        if not live:
            break
        # ONE aggregation carrying every live rank's bucket histogram:
        # bucket edges are driver literals, so the pass is a pure
        # conditional-count scan (map-side combined, no shuffle of
        # rows).  The bucket index is STAGED in its own projection so
        # the floor/CASE evaluates once per (row, rank), not once per
        # count expression (the Catalyst re-inline trap — CollapseProject
        # would otherwise duplicate it into all n_buckets sums).
        bucket_cols = []
        edges = {}
        for j, (p, (k, lo, hi, below, cnt)) in enumerate(live.items()):
            w = (hi - lo) / n_buckets
            if w <= 0 or lo + w == lo:  # double resolution exhausted
                edges[p] = None
                continue
            edges[p] = [lo + i * w for i in range(n_buckets)] + [hi]
            bucket_cols.append(
                F.when(
                    (F.col("__v") >= lo) & (F.col("__v") <= hi),
                    F.least(
                        F.lit(n_buckets - 1),
                        F.floor((F.col("__v") - F.lit(lo)) / F.lit(w)).cast("int"),
                    ),
                ).alias(f"b_{j}")
            )
        if not bucket_cols:
            break
        # Aggregate-over-Project: the projection stays the agg's child
        # (CollapseProject only fuses Project-over-Project), so each
        # b_j is one local in the codegen'd scan stage.  The counts go
        # LONG-FORM — stack to (rank_j, bucket) then ONE map-side-
        # combined groupBy over <= live x n_buckets keys — instead of
        # live x n_buckets sum() columns, whose codegen COMPILE time
        # (~seconds for hundreds of aggregates) would dwarf the scan.
        staged = base.select(*bucket_cols)
        live_js = [j for j, p in enumerate(live) if edges[p] is not None]
        stack_expr = "stack({}, {}) AS (j, b)".format(
            len(live_js), ", ".join(f"{j}, b_{j}" for j in live_js)
        )
        counts = {
            (r["j"], r["b"]): r["c"]
            for r in staged.select(F.expr(stack_expr))
            .where(F.col("b").isNotNull())
            .groupBy("j", "b")
            .agg(F.count("*").alias("c"))
            .collect()
        }
        for j, (p, (k, lo, hi, below, cnt)) in enumerate(live.items()):
            if edges[p] is None:
                state[p] = (k, lo, lo, below, cnt)  # collapse: lo == hi
                continue
            cum = below
            for i in range(n_buckets):
                ci = counts.get((j, i), 0)
                if cum + ci >= k:
                    state[p] = (k, edges[p][i], edges[p][i + 1], cum, ci)
                    break
                cum += ci
            else:  # pragma: no cover — counts must reach k by construction
                raise AssertionError("rank fell outside its interval")
    out = []
    for p in probs:
        k, lo, hi, below, cnt = state[p]
        if lo == hi:
            out.append((p, lo))
            continue
        needed = k - below
        # needed-th smallest inside [lo, hi] = max of the first `needed`
        # ascending values — TakeOrderedAndProject over a bounded prefix
        v = (
            base.where((F.col("__v") >= lo) & (F.col("__v") <= hi))
            .orderBy(F.col("__v").asc())
            .limit(int(needed))
            .agg(F.max("__v").alias("q"))
            .first()["q"]
        )
        out.append((p, float(v)))
    return out
