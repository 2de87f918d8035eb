"""Gap-based sessionization: group each user's event stream into
sessions separated by inactivity longer than ``gap`` — the fundamental
event-analytics operator (funnel, retention, and engagement metrics all
start from sessions), and in training-data work the way interaction
logs become per-session training sequences.

Spark shape (100 TB): ONE shuffle keyed by the user — the lag/
cumulative-sum windows and the per-session aggregate all share the
``partitionBy(user)`` clustering, so Catalyst plans a single exchange
feeding chained window + aggregate operators.  A pathologically heavy
user serializes only their OWN events (windows are per-user sequential
by definition — Lee-et-al-style salting cannot apply to an order-
dependent scan); AQE's skew handling splits the rest.  Timestamps are
normalized to integer MICROSECONDS before any arithmetic, so gap
comparisons and durations are exact-integer and engine-portable (the
harness_streaming nanos-vs-micros lesson).

Determinism: events order by ``(ts, event_id)`` — the id tie-break pins
simultaneous events, so session boundaries are identical on any
partitioning and in the DuckDB replay.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["session_stats", "sessionize"]


def _ts_micros(df: DataFrame, ts_col: str) -> Column:
    """Event time as integer epoch-micros: TIMESTAMP columns via
    unix_micros; raw int64 columns are treated as NANOS (the testdata
    generator's encoding) and integer-divided — never a double round
    trip (ULP 256 ns at 2024 epochs)."""
    if dict(df.dtypes)[ts_col] in ("bigint", "long"):
        return F.expr(f"{ts_col} div 1000")
    return F.unix_micros(F.col(ts_col).cast("timestamp"))


def sessionize(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_s: float = 1800.0,
) -> DataFrame:
    """Append ``ts_us`` (epoch micros), ``is_new_session`` and the
    1-based per-user ``session_idx``: a new session starts at each
    event whose gap from the user's previous event exceeds ``gap_s``
    seconds (strictly), and at each user's first event."""
    if gap_s <= 0:
        raise ValueError(f"gap_s must be > 0, got {gap_s}")
    # ts_col == 'ts_us' is allowed because withColumn below replaces it
    # in place; any other collision (including ts_col named after one of
    # the two appended flags) would shadow or duplicate a column
    for c in ("ts_us", "is_new_session", "session_idx"):
        if c in events.columns and not (c == ts_col == "ts_us"):
            raise ValueError(
                f"input already has a {c!r} column — rename it; sessionize "
                "appends ts_us/is_new_session/session_idx")
    gap_us = int(round(gap_s * 1_000_000))
    base = events.withColumn("ts_us", _ts_micros(events, ts_col))
    w = Window.partitionBy(user_col).orderBy("ts_us", id_col)
    prev = F.lag("ts_us").over(w)
    new = (prev.isNull() | (F.col("ts_us") - prev > gap_us)).cast("int")
    run = Window.partitionBy(user_col).orderBy("ts_us", id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return base.withColumn("is_new_session", new == 1).withColumn(
        "session_idx", F.sum(new).over(run).cast("long")
    )


def session_stats(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_s: float = 1800.0,
) -> DataFrame:
    """→ (user_col, session_idx, n_events, start_us, duration_us): one
    row per session.  Durations are exact integer micros (0 for
    single-event sessions)."""
    s = sessionize(
        events, user_col=user_col, ts_col=ts_col, id_col=id_col, gap_s=gap_s
    )
    return s.groupBy(user_col, "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min("ts_us").alias("start_us"),
        (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
    )
