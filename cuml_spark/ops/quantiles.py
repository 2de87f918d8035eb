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

Integral columns beyond 2^53: classification stays EXACT even though
the interval edges live in double space, because the long→double cast
is monotone non-decreasing — v1 <= v2 implies double(v1) <=
double(v2), so every "values strictly below edge" set counted on the
executors is prefix-closed in NATIVE order, and the final selection
orders native values inside the surviving interval.  The returned
value is therefore the native element itself (int for integral
columns, float otherwise) — an earlier ``float(v)`` conversion was the
one place a >2^53 long lost exactness (ADVICE r10).

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

__all__ = ["exact_quantiles", "grouped_exact_quantiles"]


def _edges_for(lo: float, hi: float, n_buckets: int) -> list[float] | None:
    """Equal-width refinement edges for [lo, hi], or None when double
    resolution is exhausted (the freeze signal): edges must be strictly
    increasing and strictly inside (lo, hi) — fp rounding at extreme
    magnitudes can violate either, and the caller then resolves the
    interval exactly via the final selection instead of splitting."""
    w = (hi - lo) / n_buckets
    if w <= 0 or lo + w == lo:
        return None
    e = [lo + i * w for i in range(1, n_buckets)]
    if e != sorted(set(e)) or e[0] <= lo or e[-1] >= hi:
        return None
    return [lo] + e + [hi]


def exact_quantiles(
    df: DataFrame,
    col: str,
    probs: list[float],
    *,
    n_buckets: int = 64,
    collect_threshold: int = 100_000,
    max_passes: int = 16,
) -> list[tuple[float, float | int | None]]:
    """→ ``[(p, value), ...]`` where ``value`` is the EXACT
    ``percentile_disc(p)`` order statistic of ``df[col]`` (the element
    at 1-based rank ``ceil(p * n)`` over non-null values) in the
    column's NATIVE python type (int for integral columns — exact past
    2^53 — float otherwise), or None for an all-null/empty column.  See
    the module docstring for the scan shape; total cost ≈ ``2 +
    passes`` full scans regardless of data size, with only
    O(n_buckets × len(probs)) counts ever leaving the executors."""
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
            full = _edges_for(lo, hi, n_buckets)
            if full is None:  # double resolution exhausted — freeze,
                edges[p] = None  # stay exact via the final selection
                state[p] = (k, lo, hi, below, cnt, True)
                continue
            edges[p] = full
            inner = F.lit(full[1:-1])
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
            # value set is tiny — <= n_buckets + 1 representable doubles
            # when frozen (for integral columns a few double-ulps still
            # bound it: <= ~n_buckets × ulp(lo) longs, e.g. ~64k at
            # magnitude 2^62) — resolve by a bounded value histogram
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
            out.append((p, v))
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
        out.append((p, v))
    return out


def grouped_exact_quantiles(
    df: DataFrame,
    col: str,
    probs: list[float],
    group_cols: list[str],
    *,
    n_buckets: int = 64,
    collect_threshold: int = 100_000,
    max_passes: int = 16,
    max_groups: int = 100_000,
) -> DataFrame:
    """Per-group EXACT ``percentile_disc`` quantiles — the grouped twin
    of :func:`exact_quantiles` for per-domain / per-language percentile
    cuts (CCNet perplexity buckets, per-stratum length caps): →
    DataFrame(group_cols…, p, value) with one row per (group, prob),
    ``value`` in the column's native type (NULL for all-null groups,
    matching SQL ``GROUP BY`` aggregate semantics).

    Same refinement loop as the global version, with every group's
    live ranks riding ONE scan per pass: a broadcast edges table
    (group → interval edges, driver-built, ≤ groups × ranks rows)
    equi-joins the data null-safely, bucket membership is decided by
    edge COMPARISONS against the joined edges array, and the pass
    aggregates long-form (group, rank, bucket) counts — map-side
    combined, bounded at groups × ranks × n_buckets rows.  The final
    selection broadcast-joins the surviving intervals and takes each
    (group, rank)'s needed-th smallest via ``row_number`` over a
    window partitioned by (group, rank) — only interval-resident rows
    (≤ groups × ranks × collect_threshold) ever shuffle, hash-
    partitioned, never range-partitioned (no global sort).  Frozen
    duplicate masses larger than ``collect_threshold`` resolve through
    the bounded distinct-value histogram exactly like the global path.

    Driver-bounded contract: per-group states live on the driver —
    ``max_groups`` guards the collect (the text/dsir.py bounded-fit
    convention).  Designed for stratum-grade cardinality (languages,
    domains, quality buckets), not data-grade keys.
    """
    if not probs:
        raise ValueError("probs must be non-empty")
    for p in probs:
        if not (0.0 < p <= 1.0):
            raise ValueError(f"each prob must be in (0, 1], got {p}")
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    gcols = list(group_cols)
    if not gcols:
        raise ValueError("group_cols must be non-empty (use exact_quantiles)")
    if col in gcols:
        raise ValueError(f"col {col!r} cannot also be a group column")
    from pyspark.sql.types import (ArrayType, DoubleType, IntegerType,
                                   LongType, StructField, StructType)
    from pyspark.sql.window import Window

    spark = df.sparkSession
    probs = sorted(set(probs))
    c = F.col(col)
    base = df.select(*gcols, c.alias("__v")).where(F.col("__v").isNotNull())
    vd = F.col("__v").cast("double")
    stats_rows = (
        df.select(*gcols, c.alias("__v"))
        .groupBy(*gcols)
        .agg(
            F.count("__v").alias("n"),  # count(col): nulls excluded
            F.min("__v").alias("mn"),
            F.max("__v").alias("mx"),
            # NULL __v rows propagate null into the flag and max skips
            # them, so an all-null group reports has_nonfinite = null
            F.max(
                (F.isnan(vd) | (F.abs(vd) == float("inf"))).cast("int")
            ).alias("has_nonfinite"),
        )
        .collect()
    )
    if len(stats_rows) > max_groups:
        raise ValueError(
            f"{len(stats_rows)} groups exceeds max_groups={max_groups} — "
            "grouped quantiles keep per-group state on the driver; raise "
            "max_groups only if that state genuinely fits"
        )
    group_fields = [
        StructField(f.name, f.dataType, True)
        for f in df.select(*gcols).schema.fields
    ]
    value_type = df.select(c.alias("__v")).schema.fields[0].dataType
    out_schema = StructType(
        group_fields
        + [StructField("p", DoubleType(), False),
           StructField("value", value_type, True)]
    )
    # state per (group, prob): (k, lo, hi, below, cnt, frozen) — the
    # global version's invariant, one instance per group
    state: dict = {}
    static_out: list[tuple] = []
    for r in stats_rows:
        gk = tuple(r[g] for g in gcols)
        if r["n"] == 0:
            static_out.extend((*gk, p, None) for p in probs)
            continue
        if r["has_nonfinite"]:
            raise ValueError(
                f"column {col!r} contains NaN/inf in group {gk!r} — "
                "filter it first"
            )
        if float(r["mx"]) - float(r["mn"]) == float("inf"):
            raise ValueError(
                f"column {col!r} spans a range wider than a double in "
                f"group {gk!r} ({r['mn']} .. {r['mx']}) — rescale first"
            )
        for p in probs:
            k = max(1, math.ceil(p * r["n"]))
            state[(gk, p)] = (k, float(r["mn"]), float(r["mx"]), 0,
                              r["n"], False)
    edge_schema = StructType(
        group_fields
        + [StructField("__j", IntegerType(), False),
           StructField("__lo", DoubleType(), False),
           StructField("__hi", DoubleType(), False),
           StructField("__e", ArrayType(DoubleType(), False), False)]
    )
    for _ in range(max_passes):
        live = {
            key: s for key, s in state.items()
            if s[1] < s[2] and s[4] > collect_threshold and not s[5]
        }
        if not live:
            break
        edge_rows = []
        jmap = {}
        for j, (key, (k, lo, hi, below, cnt, _f)) in enumerate(live.items()):
            full = _edges_for(lo, hi, n_buckets)
            if full is None:  # double resolution exhausted — freeze
                state[key] = (k, lo, hi, below, cnt, True)
                continue
            jmap[key] = (j, full)
            edge_rows.append((*key[0], j, lo, hi, full[1:-1]))
        if not edge_rows:
            break
        ed = F.broadcast(spark.createDataFrame(edge_rows, edge_schema))
        cond = [base[g].eqNullSafe(ed[g]) for g in gcols]
        joined = base.join(ed, cond)
        # membership by edge COMPARISON against the joined edges array —
        # the same 1-ulp-boundary discipline as the global version; the
        # bucket index is already long-form (one row per data row ×
        # live rank of its group), so the aggregate has few keys and no
        # wide-codegen hazard
        staged = joined.select(
            F.col("__j"),
            F.when(
                (F.col("__v") >= F.col("__lo"))
                & (F.col("__v") <= F.col("__hi")),
                F.size(F.filter(F.col("__e"),
                                lambda x: F.col("__v") >= x)),
            ).alias("__b"),
        )
        counts = {
            (r["__j"], r["__b"]): r["c"]
            for r in staged.where(F.col("__b").isNotNull())
            .groupBy("__j", "__b")
            .agg(F.count("*").alias("c"))
            .collect()
        }
        for key, (j, full) in jmap.items():
            k, lo, hi, below, cnt, _f = state[key]
            cum = below
            for i in range(n_buckets):
                ci = counts.get((j, i), 0)
                if cum + ci >= k:
                    state[key] = (k, full[i], full[i + 1], cum, ci, False)
                    break
                cum += ci
            else:  # pragma: no cover — counts must reach k
                raise AssertionError("rank fell outside its interval")
    # final selection: distributed needed-th-smallest for every
    # (group, rank) in ONE job; frozen over-threshold masses resolve
    # via the bounded distinct-value histogram (a second small job)
    iv_schema = StructType(
        group_fields
        + [StructField("__j", IntegerType(), False),
           StructField("__lo", DoubleType(), False),
           StructField("__hi", DoubleType(), False),
           StructField("__needed", LongType(), False),
           StructField("__p", DoubleType(), False)]
    )
    sel_rows, frozen_rows = [], []
    fmeta = {}
    for j, (key, (k, lo, hi, below, cnt, frozen)) in enumerate(state.items()):
        needed = k - below
        if needed > collect_threshold:
            frozen_rows.append((*key[0], j, lo, hi, needed, key[1]))
            fmeta[j] = key
        else:
            sel_rows.append((*key[0], j, lo, hi, needed, key[1]))
    if frozen_rows:
        fv = F.broadcast(spark.createDataFrame(frozen_rows, iv_schema))
        cond = [base[g].eqNullSafe(fv[g]) for g in gcols]
        hist = (
            base.join(fv, cond)
            .where((F.col("__v") >= F.col("__lo"))
                   & (F.col("__v") <= F.col("__hi")))
            .groupBy("__j", "__v")
            .agg(F.count("*").alias("c"))
            .collect()
        )
        per_j: dict = {}
        for r in hist:
            per_j.setdefault(r["__j"], []).append((r["__v"], r["c"]))
        for j, key in fmeta.items():
            k, lo, hi, below, cnt, frozen = state[key]
            cum = below
            v = None
            for val, c2 in sorted(per_j.get(j, [])):
                if cum + c2 >= k:
                    v = val
                    break
                cum += c2
            static_out.append((*key[0], key[1], v))
    if sel_rows:
        iv = F.broadcast(spark.createDataFrame(sel_rows, iv_schema))
        cond = [base[g].eqNullSafe(iv[g]) for g in gcols]
        w = Window.partitionBy("__j").orderBy(F.col("__v").asc())
        hits = (
            base.join(iv, cond)
            .where((F.col("__v") >= F.col("__lo"))
                   & (F.col("__v") <= F.col("__hi")))
            .select(*[iv[g].alias(g) for g in gcols], "__j", "__p", "__v",
                    "__needed")
            .withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == F.col("__needed"))
            .select(*gcols, F.col("__p").alias("p"),
                    F.col("__v").alias("value"))
        )
    else:
        hits = spark.createDataFrame([], out_schema)
    static = spark.createDataFrame(static_out, out_schema)
    return hits.unionByName(static)
