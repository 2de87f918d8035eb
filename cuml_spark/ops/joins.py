"""Time-aware joins Spark's API lacks as primitives: backward AS-OF
join (each left row picks the most recent right row at-or-before its
timestamp — the price/quote, feature-store point-in-time-correct, and
"state at event time" join) and bucketed RANGE join (points into
intervals without a cartesian blowup).

Spark shape (100 TB):

- **as-of** uses the UNION-SORT formulation, not a join: tag both
  sides, union, and per key run ONE ordered window whose
  ``last(value, ignorenulls=True)`` carries the right side's latest
  values forward onto each left row.  One shuffle on the key, linear
  per-key work, no range condition anywhere — the plan shape that
  survives a billion rows per side, where the naive
  ``left.ts >= right.ts`` join is O(|L|·|R|) per key.  Ordering is
  ``(ts, side, right-id)`` with the right side FIRST at equal
  timestamps (a same-instant right row is visible) and the largest
  right id winning same-instant ties — pinned, so results are
  partitioning- and engine-identical.
- **range join** buckets intervals to fixed-width cells: each interval
  replicates to ⌈span/width⌉ bucket rows (pick ``bucket_width`` ≈ the
  typical span so replication is O(1)), points join on
  ``(key, bucket)`` — an equi-join AQE can handle — and the exact
  containment predicate filters after.  Never point × interval.

Engine portability: pure integer timestamp arithmetic (the
tsa/sessions.py micros convention); the DuckDB oracle replays as-of
with a correlated latest-row subquery and the range join with its
native interval predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_join_points"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    right_id: str,
    tolerance_us: int | None = None,
) -> DataFrame:
    """Backward as-of join: append to each ``left`` row the
    ``value_cols`` of the most recent ``right`` row with ``right_ts <=
    left_ts`` and the same ``on`` key (plus ``asof_ts`` = that row's
    timestamp), or nulls when none exists (or the match is older than
    ``tolerance_us``).  Timestamps are integer microseconds (long or
    int) or native TimestampType — the staleness gap is computed in
    microseconds either way; ``asof_ts`` carries ``right_ts``'s native
    type on every path.
    Same-instant right rows are visible; ties break to the largest
    ``right_id``.  A NULL ``on`` key never matches (SQL equality
    semantics, matching the DuckDB correlated-subquery oracle):
    NULL-keyed left rows come back with null asof_ts/values.
    """
    if tolerance_us is not None and tolerance_us <= 0:
        raise ValueError(f"tolerance_us must be > 0, got {tolerance_us}")
    for c in value_cols:
        if c in left.columns:
            raise ValueError(f"value column {c!r} collides with a left column")
    lcols = left.columns
    rtypes = dict(right.dtypes)
    ltstype = dict(left.dtypes)[left_ts]
    # a timestamp axis on one side and a numeric one on the other has
    # no coherent microsecond semantics (the union below would refuse
    # the mix anyway, with a less helpful analysis error)
    if ltstype.startswith("timestamp") != rtypes[right_ts].startswith(
            "timestamp"):
        raise ValueError(
            f"ts columns must be both timestamp-typed or both numeric, "
            f"got left={ltstype!r} right={rtypes[right_ts]!r}"
        )
    # SQL join semantics: a NULL key never matches (not even another
    # NULL).  Window.partitionBy would group all NULL keys into one
    # partition and happily match them, so NULL-keyed left rows take
    # the no-match path up front and NULL-keyed right rows are dropped.
    null_left = left.where(F.col(on).isNull()).select(
        *lcols,
        # asof_ts keeps right_ts's NATIVE type in every branch (matched,
        # NULL-key, tolerance-staled) — a hardcoded long here would
        # widen/fail the closing unionByName for int right_ts columns
        F.lit(None).cast(rtypes[right_ts]).alias("asof_ts"),
        *[F.lit(None).cast(rtypes[c]).alias(c) for c in value_cols],
    )
    left = left.where(F.col(on).isNotNull())
    right = right.where(F.col(on).isNotNull())
    l_tagged = left.select(
        *lcols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_l"),
        F.lit(None).cast("long").alias("__rid"),
        F.lit(None).cast(rtypes[right_ts]).alias("__rts"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__v_{c}") for c in value_cols],
    )
    r_tagged = (
        # null right timestamps have no position on the time axis: drop
        # them here, or NULLS-FIRST ordering would leak their values
        # into every left row while asof_ts stayed null
        right.where(F.col(right_ts).isNotNull())
        .select(
            *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols if c != on],
            F.col(on),
            F.col(right_ts).alias("__ts"),
            F.lit(0).alias("__is_l"),
            F.col(right_id).cast("long").alias("__rid"),
            F.col(right_ts).alias("__rts"),
            *[F.col(c).alias(f"__v_{c}") for c in value_cols],
        )
        .select(*l_tagged.columns)
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts").asc(), F.col("__is_l").asc(), F.col("__rid").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # carry the most recent right row ATOMICALLY as one struct: a
    # per-column last(ignorenulls) would skip a genuinely-NULL right
    # value and resurrect an older row's value, splitting asof_ts and
    # the values across different matches.  The struct is non-null for
    # every right row (even when its members are null), null for left
    # rows — exactly the carry-forward marker last(ignorenulls) needs.
    payload = F.when(
        F.col("__is_l") == 0,
        F.struct(
            F.col("__rts").alias("rts"),
            *[F.col(f"__v_{c}").alias(c) for c in value_cols],
        ),
    )
    filled = unioned.select(
        *lcols,
        "__is_l",
        F.last(payload, ignorenulls=True).over(w).alias("__m"),
        F.col("__ts").alias("__lts"),
    )
    out = filled.where(F.col("__is_l") == 1).select(
        *lcols,
        F.col("__m.rts").alias("asof_ts"),
        *[F.col(f"__m.{c}").alias(c) for c in value_cols],
        "__lts",
    )
    if tolerance_us is not None:
        # the gap is computed in LONG regardless of the ts columns'
        # native type: int - int would wrap silently for gaps past
        # 2^31 µs (~36 min) now that asof_ts keeps its native width.
        # Timestamp-family columns diff via timestampdiff(MICROSECOND),
        # which is instant-based for TIMESTAMP and calendar-exact for
        # TIMESTAMP_NTZ — the previous cast("timestamp") round trip
        # interpreted ntz wall-clocks in the session zone, making the
        # gap session-timezone-dependent (and wrong by the offset delta
        # across a DST transition).  Mixed timestamp/numeric pairs have
        # no coherent µs semantics and are refused.
        if ltstype.startswith("timestamp"):
            gap = F.expr("timestampdiff(MICROSECOND, asof_ts, __lts)")
        else:
            gap = (F.col("__lts").cast("long")
                   - F.col("asof_ts").cast("long"))
        stale = F.col("asof_ts").isNull() | (gap > int(tolerance_us))
        out = out.select(
            *lcols,
            F.when(stale, F.lit(None)).otherwise(F.col("asof_ts")).alias("asof_ts"),
            *[
                F.when(stale, F.lit(None)).otherwise(F.col(c)).alias(c)
                for c in value_cols
            ],
        )
    else:
        out = out.select(*lcols, "asof_ts", *value_cols)
    return out.unionByName(null_left)


def range_join_points(
    points: DataFrame,
    intervals: DataFrame,
    *,
    on: str,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_width_us: int,
) -> DataFrame:
    """Inner range join: each point row matched to every interval row
    (same ``on`` key) with ``start_col <= point_ts <= end_col``
    (integer micros, inclusive ends).  Intervals replicate to
    ``(key, bucket)`` cells of ``bucket_width_us``; points equi-join
    their cell; the exact predicate filters after — never a cartesian
    pair space."""
    if bucket_width_us <= 0:
        raise ValueError(f"bucket_width_us must be > 0, got {bucket_width_us}")
    bw = int(bucket_width_us)
    # an inverted interval (end < start, a data bug) would make
    # F.sequence count DOWN, replicating the bad row into buckets
    # outside its span; it can never satisfy the exact predicate, so
    # give it an empty bucket list and let explode drop it here
    ivals = intervals.withColumn(
        "__b",
        F.explode(
            F.when(
                F.col(end_col) >= F.col(start_col),
                F.sequence(
                    F.expr(f"{start_col} div {bw}"), F.expr(f"{end_col} div {bw}")
                ),
            ).otherwise(F.array().cast("array<long>"))
        ),
    )
    pts = points.withColumn("__b", F.expr(f"{point_ts} div {bw}"))
    return (
        pts.join(ivals, [on, "__b"])
        .where(
            (F.col(point_ts) >= F.col(start_col))
            & (F.col(point_ts) <= F.col(end_col))
        )
        .drop("__b")
    )
