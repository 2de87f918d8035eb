"""As-of and range join tests (ops/joins.py)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F


def _left(spark):
    rows = [(1, 10, 100), (2, 10, 205), (3, 10, 300), (4, 20, 150), (5, 30, 99)]
    return spark.createDataFrame(rows, "event_id long, user long, ts long")


def _right(spark):
    # user 10: quotes at 100 (two same-instant), 250; user 20: at 160 (after)
    rows = [(71, 10, 100, 1.5), (72, 10, 100, 2.5), (73, 10, 250, 9.0),
            (74, 20, 160, 4.0)]
    return spark.createDataFrame(rows, "qid long, user long, qts long, px double")


def test_asof_join_semantics(spark):
    from cuml_spark.ops.joins import asof_join

    out = {r["event_id"]: (r["asof_ts"], r["px"]) for r in asof_join(
        _left(spark), _right(spark), on="user", left_ts="ts",
        right_ts="qts", value_cols=["px"], right_id="qid").collect()}
    assert out[1] == (100, 2.5)   # same-instant visible, tie -> larger qid
    assert out[2] == (100, 2.5)   # 205 < 250: still the 100 quote
    assert out[3] == (250, 9.0)   # picks the newer quote
    assert out[4] == (None, None) # user 20's only quote is in the future
    assert out[5] == (None, None) # user 30 has no quotes


def test_asof_join_tolerance_and_validation(spark):
    from cuml_spark.ops.joins import asof_join

    out = {r["event_id"]: r["px"] for r in asof_join(
        _left(spark), _right(spark), on="user", left_ts="ts",
        right_ts="qts", value_cols=["px"], right_id="qid",
        tolerance_us=50).collect()}
    assert out[1] == 2.5    # gap 0 <= 50
    assert out[2] is None   # gap 105 > 50 -> stale
    assert out[3] == 9.0    # gap 50 <= 50 (inclusive)
    with pytest.raises(ValueError, match="tolerance_us"):
        asof_join(_left(spark), _right(spark), on="user", left_ts="ts",
                  right_ts="qts", value_cols=["px"], right_id="qid",
                  tolerance_us=0)
    with pytest.raises(ValueError, match="collides"):
        asof_join(_left(spark), _right(spark).withColumnRenamed("px", "ts"),
                  on="user", left_ts="ts", right_ts="qts",
                  value_cols=["ts"], right_id="qid")


def test_asof_join_single_shuffle_plan(spark):
    from cuml_spark.ops.joins import asof_join

    out = asof_join(_left(spark), _right(spark), on="user", left_ts="ts",
                    right_ts="qts", value_cols=["px"], right_id="qid")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "Join" not in plan  # the union-sort formulation joins nothing


def test_range_join_matches_python_reference(spark):
    import random

    from cuml_spark.ops.joins import range_join_points

    rng = random.Random(21)
    ivals = []
    for i in range(30):
        k = rng.randint(0, 3)
        s = rng.randint(0, 1000)
        ivals.append((i, k, s, s + rng.randint(0, 400)))
    pts = [(j, rng.randint(0, 3), rng.randint(0, 1400)) for j in range(80)]
    idf = spark.createDataFrame(ivals, "iid long, k long, s long, e long")
    pdf = spark.createDataFrame(pts, "pid long, k long, t long")
    got = {(r["pid"], r["iid"]) for r in range_join_points(
        pdf, idf, on="k", point_ts="t", start_col="s", end_col="e",
        bucket_width_us=128).collect()}
    expect = {(pid, iid) for pid, pk, t in pts
              for iid, ik, s, e in ivals if pk == ik and s <= t <= e}
    assert got == expect
    with pytest.raises(ValueError, match="bucket_width_us"):
        range_join_points(pdf, idf, on="k", point_ts="t", start_col="s",
                          end_col="e", bucket_width_us=0)


def test_range_join_no_cartesian_plan(spark):
    from cuml_spark.ops.joins import range_join_points

    idf = spark.createDataFrame([(1, 1, 0, 100)], "iid long, k long, s long, e long")
    pdf = spark.createDataFrame([(1, 1, 50)], "pid long, k long, t long")
    out = range_join_points(pdf, idf, on="k", point_ts="t", start_col="s",
                            end_col="e", bucket_width_us=64)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_join_null_right_value_is_not_resurrected(spark):
    """A genuinely-NULL value on the most recent right row must surface
    as NULL (matching the oracle), not fall back to an older row."""
    from cuml_spark.ops.joins import asof_join

    left = spark.createDataFrame([(1, 10, 300)], "event_id long, user long, ts long")
    right = spark.createDataFrame(
        [(71, 10, 100, 1.5), (72, 10, 200, None)],
        "qid long, user long, qts long, px double")
    r = asof_join(left, right, on="user", left_ts="ts", right_ts="qts",
                  value_cols=["px"], right_id="qid").collect()[0]
    assert r["asof_ts"] == 200
    assert r["px"] is None


def test_asof_join_null_right_ts_dropped(spark):
    """Right rows with NULL timestamps have no time-axis position: they
    must not leak values into left rows."""
    from cuml_spark.ops.joins import asof_join

    left = spark.createDataFrame([(1, 10, 50)], "event_id long, user long, ts long")
    right = spark.createDataFrame(
        [(71, 10, None, 7.0)], "qid long, user long, qts long, px double")
    r = asof_join(left, right, on="user", left_ts="ts", right_ts="qts",
                  value_cols=["px"], right_id="qid").collect()[0]
    assert r["asof_ts"] is None and r["px"] is None


def test_asof_join_null_key_never_matches(spark):
    """SQL equality semantics: a NULL join key matches nothing — not
    even a NULL-keyed right row (Window.partitionBy would have grouped
    them together)."""
    from cuml_spark.ops.joins import asof_join

    left = spark.createDataFrame(
        [(1, None, 300), (2, 10, 300)], "event_id long, user long, ts long")
    right = spark.createDataFrame(
        [(71, None, 100, 1.5), (72, 10, 100, 2.5)],
        "qid long, user long, qts long, px double")
    out = {r["event_id"]: (r["asof_ts"], r["px"]) for r in asof_join(
        left, right, on="user", left_ts="ts", right_ts="qts",
        value_cols=["px"], right_id="qid").collect()}
    assert out[1] == (None, None)   # NULL key: no match, row preserved
    assert out[2] == (100, 2.5)     # real keys unaffected


def test_range_join_inverted_interval_dropped(spark):
    """An inverted interval (end < start, a data bug) must not replicate
    into buckets outside its span — it matches nothing and is dropped by
    the empty bucket sequence, not exploded DESCENDING."""
    from cuml_spark.ops.joins import range_join_points

    points = spark.createDataFrame(
        [(1, 10, 500)], "pid long, user long, ts long")
    intervals = spark.createDataFrame(
        [(81, 10, 400, 600), (82, 10, 900, 100)],  # 82 is inverted
        "iid long, user long, start long, end long")
    got = range_join_points(
        points, intervals, on="user", point_ts="ts",
        start_col="start", end_col="end", bucket_width_us=100,
    ).select("pid", "iid").collect()
    assert [(r["pid"], r["iid"]) for r in got] == [(1, 81)]


def test_asof_join_int_right_ts_native_type(spark):
    """Regression (ADVICE r10): asof_ts must carry right_ts's NATIVE
    type on every branch — with an int right_ts, the NULL-key no-match
    branch used to cast long and widen the union."""
    from cuml_spark.ops.joins import asof_join

    left = spark.createDataFrame(
        [(1, 10, 100), (2, None, 100)], "event_id int, user int, ts int")
    right = spark.createDataFrame(
        [(71, 10, 90, 1.5)], "qid int, user int, qts int, px double")
    out = asof_join(left, right, on="user", left_ts="ts", right_ts="qts",
                    value_cols=["px"], right_id="qid")
    assert dict(out.dtypes)["asof_ts"] == "int"
    got = {r["event_id"]: (r["asof_ts"], r["px"]) for r in out.collect()}
    assert got[1] == (90, 1.5)
    assert got[2] == (None, None)  # NULL key: no-match branch, same type


def test_asof_join_int_ts_tolerance_no_overflow(spark):
    """Regression (r11 review): with int ts columns the tolerance gap
    must compute in LONG — an int subtraction wraps for gaps past
    2^31 µs and would resurrect a stale match."""
    from cuml_spark.ops.joins import asof_join

    left = spark.createDataFrame(
        [(1, 10, 2_000_000_000)], "event_id int, user int, ts int")
    right = spark.createDataFrame(
        [(71, 10, -1_000_000_000, 1.5)], "qid int, user int, qts int, px double")
    out = asof_join(left, right, on="user", left_ts="ts", right_ts="qts",
                    value_cols=["px"], right_id="qid",
                    tolerance_us=1_000_000)
    r = out.collect()[0]
    # true gap 3e9 µs > 1e6: stale — int wraparound would return 1.5
    assert r["asof_ts"] is None and r["px"] is None


def test_asof_tolerance_ntz_is_timezone_independent(spark):
    """timestamp_ntz gaps are CALENDAR microseconds, not session-zone
    instants: wall-clocks straddling a DST transition must measure the
    same gap under any spark.sql.session.timeZone (r12 review fix — the
    old cast('timestamp') path read 30 real minutes across the US
    spring-forward for a 90-minute wall-clock gap)."""
    import datetime

    from cuml_spark.ops.joins import asof_join

    # 2026-03-08 01:30 → 03:00 wall clock: 90 calendar minutes, but only
    # 30 instant minutes in America/Los_Angeles (02:00-03:00 skipped)
    t_right = datetime.datetime(2026, 3, 8, 1, 30, 0)
    t_left = datetime.datetime(2026, 3, 8, 3, 0, 0)
    left = spark.createDataFrame([(1, 7, t_left)],
                                 "event_id long, user long, ts timestamp_ntz")
    right = spark.createDataFrame(
        [(100, 7, t_right, 5.0)],
        "qid long, user long, qts timestamp_ntz, px double")
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in ("UTC", "America/Los_Angeles"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            # 90 min fits an exactly-90-minute tolerance...
            r = asof_join(left, right, on="user", left_ts="ts",
                          right_ts="qts", value_cols=["px"],
                          right_id="qid",
                          tolerance_us=90 * 60 * 1_000_000).collect()[0]
            assert r["px"] == 5.0, tz
            # ...and exceeds an 89-minute one — in EVERY session zone
            r = asof_join(left, right, on="user", left_ts="ts",
                          right_ts="qts", value_cols=["px"],
                          right_id="qid",
                          tolerance_us=89 * 60 * 1_000_000).collect()[0]
            assert r["px"] is None, tz
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_asof_tolerance_mixed_ts_types_refused(spark):
    from cuml_spark.ops.joins import asof_join

    left = spark.createDataFrame([(1, 7, 100)],
                                 "event_id long, user long, ts long")
    right = spark.createDataFrame(
        [(100, 7, __import__('datetime').datetime(2020, 1, 1), 5.0)],
        "qid long, user long, qts timestamp, px double")
    with pytest.raises(ValueError, match="both timestamp-typed or both numeric"):
        asof_join(left, right, on="user", left_ts="ts", right_ts="qts",
                  value_cols=["px"], right_id="qid")
