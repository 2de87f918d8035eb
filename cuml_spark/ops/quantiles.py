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
    vd = F.col("__v").cast("double")
    stats = base.agg(
        F.count("*").alias("n"),
        F.min("__v").alias("mn"),
        F.max("__v").alias("mx"),
        F.max((F.isnan(vd) | (F.abs(vd) == float("inf"))).cast("int")).alias(
            "has_nonfinite"
        ),
    ).first()
    n = stats["n"]
    if n == 0:
        return [(p, None) for p in probs]
    if stats["has_nonfinite"]:
        # NaN poisons comparisons; +/-inf makes every bucket width
        # degenerate (the interval [lo, inf] never shrinks) — both are
        # data bugs at the quantile layer, so refuse loudly
        raise ValueError(f"column {col!r} contains NaN/inf — filter it first")
    if float(stats["mx"]) - float(stats["mn"]) == float("inf"):
        # finite sentinels like +/-1e308 make every bucket width overflow
        # to inf (edges would be NaN) — refuse with a real error instead
        # of a downstream crash
        raise ValueError(
            f"column {col!r} spans a range wider than a double "
            f"({stats['mn']} .. {stats['mx']}) — rescale or filter first"
        )
    # state per rank: (k, lo, hi, below, cnt, frozen) — the k-th smallest
    # overall lies in [lo, hi] with exactly `below` values strictly below
    # lo and `cnt` values inside; `frozen` marks double-resolution
    # exhaustion (the interval is a few ulps wide but may still hold a
    # huge duplicate mass — resolved exactly by the final selection,
    # NEVER by returning a computed edge that need not be a data value)
    state = {}
    for p in probs:
        k = max(1, math.ceil(p * n))
        state[p] = (k, float(stats["mn"]), float(stats["mx"]), 0, n, False)
    for _ in range(max_passes):
        live = {
            p: s
            for p, s in state.items()
            if s[1] < s[2] and s[4] > collect_threshold and not s[5]
        }
        if not live:
            break
        # ONE aggregation carrying every live rank's bucket histogram:
        # bucket edges are driver literals, and membership is decided by
        # EDGE COMPARISONS (count of edges <= v), never by a floor
        # division — floor((v - lo)/w) disagrees with the driver-side
        # edges lo + i*w within ~1 ulp of a boundary, which double-counts
        # or loses edge-straddling values from the rank bookkeeping (a
        # replayed failure, not a theory).  Comparisons make bucket i
        # EXACTLY the half-open [edges[i], edges[i+1]) (last bucket
        # closed at hi), identical on executors and driver.  The index
        # is STAGED in its own projection so it evaluates once per
        # (row, rank) (Aggregate-over-Project keeps it one local in the
        # codegen'd scan; CollapseProject only fuses Project pairs).
        bucket_cols = []
        edges = {}
        for j, (p, (k, lo, hi, below, cnt, _f)) in enumerate(live.items()):
            w = (hi - lo) / n_buckets
            if w <= 0 or lo + w == lo:  # double resolution exhausted
                edges[p] = None
                state[p] = (k, lo, hi, below, cnt, True)  # freeze, stay exact
                continue
            e = [lo + i * w for i in range(1, n_buckets)]
            # edges must be strictly inside (lo, hi) and increasing;
            # fp rounding at extreme magnitudes can violate either — fall
            # back to freezing (the final selection is always exact)
            if e != sorted(set(e)) or e[0] <= lo or e[-1] >= hi:
                edges[p] = None
                state[p] = (k, lo, hi, below, cnt, True)
                continue
            edges[p] = [lo] + e + [hi]
            inner = F.lit(e)
            bucket_cols.append(
                F.when(
                    (F.col("__v") >= lo) & (F.col("__v") <= hi),
                    F.size(F.filter(inner, lambda x: F.col("__v") >= x)),
                ).alias(f"b_{j}")
            )
        if not bucket_cols:
            break
        # counts go LONG-FORM — stack to (rank_j, bucket) then ONE
        # map-side-combined groupBy over <= live x n_buckets keys —
        # instead of live x n_buckets sum() columns, whose codegen
        # COMPILE time (~seconds for hundreds of aggregates) would dwarf
        # the scan.
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
        for j, (p, (k, lo, hi, below, cnt, frz)) in enumerate(live.items()):
            if edges[p] is None:
                continue  # frozen above
            cum = below
            for i in range(n_buckets):
                ci = counts.get((j, i), 0)
                if cum + ci >= k:
                    state[p] = (k, edges[p][i], edges[p][i + 1], cum, ci, False)
                    break
                cum += ci
            else:  # pragma: no cover — counts must reach k by construction
                raise AssertionError("rank fell outside its interval")
    out = []
    for p in probs:
        k, lo, hi, below, cnt, frozen = state[p]
        needed = k - below
        rng = (F.col("__v") >= lo) & (F.col("__v") <= hi)
        if needed > collect_threshold:
            # only reachable frozen (or at max_passes on pathological
            # data): the interval is a few ulps wide, so its DISTINCT
            # value set is tiny (<= n_buckets + 1 representable doubles
            # when frozen) — resolve by a bounded value histogram
            # instead of a needed-sized TakeOrdered
            rows = sorted(
                (r["__v"], r["c"])
                for r in base.where(rng)
                .groupBy("__v")
                .agg(F.count("*").alias("c"))
                .collect()
            )
            cum = below
            v = None
            for val, c2 in rows:
                if cum + c2 >= k:
                    v = val
                    break
                cum += c2
            out.append((p, float(v)))
            continue
        # needed-th smallest inside [lo, hi] = max of the first `needed`
        # ascending values — TakeOrderedAndProject over a bounded prefix
        v = (
            base.where(rng)
            .orderBy(F.col("__v").asc())
            .limit(int(needed))
            .agg(F.max("__v").alias("q"))
            .first()["q"]
        )
        out.append((p, float(v)))
    return out
