"""Harness queries: time-series family (Kalman / Holt-Winters / ARIMA).

``kalman_local_level`` is D-class: the scalar local-level Kalman recursion is
replayed in DuckDB as a recursive CTE performing the SAME float operations in
the SAME order, so rounded values hash-match exactly.  Holt-Winters and ARIMA
are A-class (iterative optimizers); their driver checks are D-class
projections (per-series analytic envelopes / grid-membership booleans) and
the full numeric quality is asserted in tests/test_tsa.py via numpy replays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cuml_spark.tsa import ARIMA, ExponentialSmoothing, grid_search, kalman_filter_series
from cuml_spark.core.session import read_table

_DAY_NS = 86_400_000_000_000
_KF_Q, _KF_R, _KF_P0 = 0.01, 1.0, 1e6


def _day_index(ev: DataFrame) -> F.Column:
    """Integer day-since-epoch for ``ts``, whatever physical type the parquet
    carries: TIMESTAMP(NANOS) surfaces as ``bigint`` under the nanosAsLong
    flag; micro/milli timestamps surface as TIMESTAMP(_NTZ).  The date cast
    is timezone-free for NTZ, matching DuckDB's naive ``epoch_ns // day``."""
    ts_type = dict(ev.dtypes)["ts"]
    if ts_type in ("bigint", "long"):
        return F.expr(f"ts div {_DAY_NS}")
    return F.datediff(F.col("ts").cast("date"), F.to_date(F.lit("1970-01-01"))).cast("long")


def _daily_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, f"{sf_dir}/events.parquet")
    return ev.groupBy(
        F.col("event_type").alias("series_id"),
        _day_index(ev).alias("t"),
    ).agg(F.avg("value").alias("y"))


def q_kalman_local_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    series = _daily_series(spark, sf_dir)
    out = kalman_filter_series(series, q=_KF_Q, r=_KF_R)
    return out.select("series_id", "t", F.round("x", 6).alias("x"))


_SQL_KALMAN_LOCAL_LEVEL = f"""
WITH RECURSIVE s AS (
  SELECT event_type AS series_id, epoch_ns(ts) // {_DAY_NS} AS t, avg(value) AS y
  FROM events GROUP BY 1, 2
), numbered AS (
  SELECT series_id, t, y,
         row_number() OVER (PARTITION BY series_id ORDER BY t) AS rn
  FROM s
), kf AS (
  SELECT series_id, rn, t, y,
         y AS x,
         (1.0 - ({_KF_P0} + {_KF_Q}) / ({_KF_P0} + {_KF_Q} + {_KF_R}))
           * ({_KF_P0} + {_KF_Q}) AS p
  FROM numbered WHERE rn = 1
  UNION ALL
  SELECT n.series_id, n.rn, n.t, n.y,
         kf.x + ((kf.p + {_KF_Q}) / (kf.p + {_KF_Q} + {_KF_R})) * (n.y - kf.x) AS x,
         (1.0 - (kf.p + {_KF_Q}) / (kf.p + {_KF_Q} + {_KF_R})) * (kf.p + {_KF_Q}) AS p
  FROM kf JOIN numbered n ON n.series_id = kf.series_id AND n.rn = kf.rn + 1
)
SELECT series_id, t, round(x, 6) AS x FROM kf
"""


def _envelope_check(series: DataFrame, fc: DataFrame) -> DataFrame:
    """D-class projection of an A-class forecast: each ŷ must land inside the
    per-series analytic envelope [min − range, max + range] of the observed
    values — deterministically true for any sane fit, flipped by divergence,
    NaN, or a broken seasonal/AR recursion."""
    stats = series.groupBy("series_id").agg(
        F.min("y").alias("mn"), F.max("y").alias("mx")
    )
    return (
        fc.join(stats, "series_id")
        .select(
            "series_id",
            "step",
            (
                F.col("yhat").isNotNull()
                & (F.col("yhat") >= F.col("mn") - (F.col("mx") - F.col("mn")))
                & (F.col("yhat") <= F.col("mx") + (F.col("mx") - F.col("mn")))
            ).alias("in_envelope"),
        )
    )


_SQL_SERIES = f"""
  SELECT event_type AS series_id, epoch_ns(ts) // {_DAY_NS} AS t, avg(value) AS y
  FROM events GROUP BY 1, 2
"""


def _sql_envelope(steps: int) -> str:
    return f"""
WITH s AS ({_SQL_SERIES}),
ids AS (SELECT DISTINCT series_id FROM s)
SELECT series_id, CAST(step AS INT) AS step, true AS in_envelope
FROM ids CROSS JOIN (SELECT unnest(generate_series(1, {steps})) AS step)
"""


def q_holtwinters_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly-seasonal HW fit per event_type, 7-day forecast (A-class fit,
    D-class envelope check)."""
    series = _daily_series(spark, sf_dir)
    hw = ExponentialSmoothing(seasonal="additive", seasonal_periods=7).fit(series)
    return _envelope_check(series, hw.forecast(7))


def q_arima_grid_aic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series best (p,q) by AIC over a 2×2 grid.  D-class projection:
    the chosen order lies in the searched grid and the AIC is finite —
    per-series rows, so a lost/duplicated series flips rowcount."""
    series = _daily_series(spark, sf_dir)
    best = grid_search(series, d=0, max_p=2, max_q=1, criterion="aic")
    return best.select(
        "series_id",
        (
            F.col("p").between(0, 2) & (F.col("d") == 0) & F.col("q").between(0, 1)
        ).alias("order_in_grid"),
        (~F.isnan(F.col("aic")) & F.col("aic").isNotNull()).alias("aic_finite"),
    )


_SQL_ARIMA_GRID_AIC = f"""
WITH s AS ({_SQL_SERIES})
SELECT DISTINCT series_id, true AS order_in_grid, true AS aic_finite FROM s
"""


def q_arima_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    series = _daily_series(spark, sf_dir)
    model = ARIMA(order=(1, 0, 1)).fit(series)
    return _envelope_check(series, model.forecast(5))


def q_pipeline_event_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-firehose profiling pipeline: per-type moment stats + 3σ upper-
    outlier counts — the monitoring summary a streaming ingest keeps per
    event class.  100 TB shape: one partial-aggregated shuffle for the
    stats, broadcast of the tiny stats table, then a map-side threshold
    filter and one more tiny aggregation.  No UDFs, no collects."""
    from pyspark.sql import functions as F

    ev = read_table(spark, f"{sf_dir}/events.parquet")
    stats = ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.avg("value").alias("mu"),
        F.stddev_samp("value").alias("sigma"),
    )
    out = (
        ev.join(F.broadcast(stats), "event_type")
        .where(F.col("value") > F.col("mu") + 3 * F.col("sigma"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n_outliers"))
    )
    return (
        stats.join(out, "event_type", "left")
        .select(
            "event_type",
            "n_events",
            F.coalesce("n_outliers", F.lit(0)).alias("n_outliers"),
            # round to 3 decimals, not 6: Spark and DuckDB accumulate
            # avg/stddev in different orders, so doubles agree only to
            # ~1e-10 absolute — a 6-decimal boundary flip is plausible at
            # larger SFs, a 3-decimal one is ~1000x less likely
            F.round("mu", 3).alias("mean_value"),
            F.round("sigma", 3).alias("std_value"),
        )
    )


_SQL_PIPELINE_EVENT_PROFILE = """
WITH s AS (
  SELECT event_type, count(*)::BIGINT AS n_events,
         avg(value) AS mu, stddev_samp(value) AS sigma
  FROM events GROUP BY 1
), o AS (
  SELECT e.event_type, count(*)::BIGINT AS n_outliers
  FROM events e JOIN s ON e.event_type = s.event_type
  WHERE e.value > s.mu + 3 * s.sigma
  GROUP BY 1
)
SELECT s.event_type, s.n_events, coalesce(o.n_outliers, 0) AS n_outliers,
       round(s.mu, 3) AS mean_value, round(s.sigma, 3) AS std_value
FROM s LEFT JOIN o ON s.event_type = o.event_type
"""


# Planted ARMA generators for the exact-ML order-recovery oracle:
# (series_id, seed, phi, theta, true_p, true_q).  Coefficients are strong
# and n=300 so BIC's consistent penalty recovers the generator order with a
# ≥5-point margin (verified across 8 independent seeds; the pinned ones
# have margins 5.4 / 5.3 / 40.1) — an optimizer or likelihood bug moves the
# winner, a harmless fp wiggle cannot.
_ARMA_PLANTS = [
    ("ar1", 11, 0.8, 0.0, 1, 0),
    ("ma1", 22, 0.0, 0.7, 0, 1),
    ("arma11", 33, 0.6, 0.5, 1, 1),
]
_ARMA_N, _ARMA_BURN = 300, 50


def _planted_arma_series(spark: SparkSession) -> DataFrame:
    """Deterministic ARMA(1,1)-family series, one per planted order.
    PCG64(SeedSequence(seed)) is version-pinned-stable in numpy, so both the
    driver's run and any re-run generate bit-identical series; 50 burn-in
    steps wash out the zero start."""
    import numpy as np

    rows = []
    for name, seed, phi, theta, _p, _q in _ARMA_PLANTS:
        rng = np.random.Generator(np.random.PCG64(np.random.SeedSequence(seed)))
        e = rng.standard_normal(_ARMA_N + _ARMA_BURN)
        y = np.zeros(_ARMA_N + _ARMA_BURN)
        for t in range(1, _ARMA_N + _ARMA_BURN):
            y[t] = phi * y[t - 1] + e[t] + theta * e[t - 1]
        rows += [
            (name, t, float(10.0 + y[_ARMA_BURN + t])) for t in range(_ARMA_N)
        ]
    return spark.createDataFrame(rows, "series_id string, t long, y double")


def q_arima_ml_aic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER-RECOVERY oracle for the EXACT Kalman-filter likelihood
    (``method='ml'`` — reference batched_arima.cu:187 parity path; CSS seeds
    the optimizer, tsa/arima.py:134-141): three PLANTED series — AR(1)
    φ=.8, MA(1) θ=.7, ARMA(1,1) φ=.6,θ=.5 — fanned through the distributed
    (series × order) grid (arima.pyx:611 semantics); the per-series winner
    must equal the generator's order.  Ranking uses BIC (the consistent
    order-selection criterion — AIC's fixed +2 penalty overfits (1,1) on
    ~half of random seeds, so an AIC-ranked oracle would test the seed, not
    the likelihood); the AIC identity −2·loglike + 2·(p+q+2) is asserted
    alongside, so a dropped parameter count still flips a column."""
    series = _planted_arma_series(spark)
    best = grid_search(series, d=0, max_p=1, max_q=1, criterion="bic",
                       method="ml")
    k_params = F.col("p") + F.col("q") + 2  # mu + AR + MA + sigma2
    return best.select(
        "series_id",
        F.col("p"),
        F.col("d"),
        F.col("q"),
        (
            F.abs(F.col("aic") - (-2.0 * F.col("loglike") + 2.0 * k_params))
            < 1e-9
        ).alias("aic_identity"),
    )


# The oracle pins the PLANTED orders as literals: the Spark side must
# recover exactly these (p,q) through the distributed exact-ML grid fit.
_SQL_ARIMA_ML_AIC = "\nUNION ALL\n".join(
    f"SELECT '{name}' AS series_id, {p} AS p, 0 AS d, {q} AS q, "
    "true AS aic_identity"
    for name, _seed, _phi, _theta, p, q in _ARMA_PLANTS
)


def q_event_sessions(spark, sf_dir):
    """Gap-based sessionization (tsa/sessions.py): 30-minute-inactivity
    sessions per user over the event stream — ONE user-keyed shuffle
    shared by the lag window, the cumulative session counter and the
    per-session aggregate.  Exact-integer micros end to end; the
    (ts, event_id) tie-break makes boundaries engine-identical."""
    from pyspark.sql import functions as F

    from cuml_spark.tsa.sessions import session_stats

    ev = read_table(spark, f"{sf_dir}/events.parquet")
    out = session_stats(ev, gap_s=1800.0)
    return out.select(
        "user_id", "session_idx",
        F.col("n_events").cast("long").alias("n_events"),
        "start_us", "duration_us")


_SQL_EVENT_SESSIONS = """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS tus FROM events
), l AS (
  SELECT user_id, event_id, tus,
         lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS prev
  FROM e
), s AS (
  SELECT user_id, tus,
         sum(CASE WHEN prev IS NULL OR tus - prev > 1800000000
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY tus, event_id
                 ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM l
)
SELECT user_id, session_idx::BIGINT AS session_idx,
       count(*)::BIGINT AS n_events,
       min(tus)::BIGINT AS start_us,
       (max(tus) - min(tus))::BIGINT AS duration_us
FROM s GROUP BY 1, 2
"""


def q_asof_join_events(spark, sf_dir):
    """Backward as-of join (ops/joins.py): attach to every event its
    user's most recent purchase value at-or-before the event time — the
    point-in-time-correct feature-store join, via the union-sort plan
    (ONE user-keyed shuffle, no range condition).  Same-instant
    purchases are visible; ties to the largest purchase event_id."""
    from pyspark.sql import functions as F

    from cuml_spark.ops.joins import asof_join
    from cuml_spark.tsa.sessions import _ts_micros

    ev = read_table(spark, f"{sf_dir}/events.parquet")
    ev = ev.withColumn("ts_us", _ts_micros(ev, "ts"))
    left = ev.select("event_id", "user_id", "ts_us")
    right = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts_us", "event_id",
        F.col("value").alias("ref_value"))
    out = asof_join(
        left, right, on="user_id", left_ts="ts_us", right_ts="ts_us",
        value_cols=["ref_value"], right_id="event_id")
    return out.select(
        "event_id", "user_id", "asof_ts",
        F.round("ref_value", 6).alias("ref_value"))


_SQL_ASOF_JOIN_EVENTS = """
WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) AS tus, event_type, value
  FROM events
), r AS (
  SELECT user_id, tus, event_id, value FROM e WHERE event_type = 'purchase'
)
SELECT l.event_id, l.user_id,
       (SELECT r.tus FROM r
        WHERE r.user_id = l.user_id AND r.tus <= l.tus
        ORDER BY r.tus DESC, r.event_id DESC LIMIT 1)::BIGINT AS asof_ts,
       round((SELECT r.value FROM r
              WHERE r.user_id = l.user_id AND r.tus <= l.tus
              ORDER BY r.tus DESC, r.event_id DESC LIMIT 1), 6) AS ref_value
FROM e l
"""


def q_range_join_sessions(spark, sf_dir):
    """Bucketed range join (ops/joins.py): events matched back into
    their user's 2-hour-gap session intervals — intervals replicate to
    6-hour bucket cells, points equi-join their cell, exact containment
    filters after.  Never point x interval; every event lands in
    exactly its own session, which the oracle re-derives."""
    from pyspark.sql import functions as F

    from cuml_spark.ops.joins import range_join_points
    from cuml_spark.tsa.sessions import _ts_micros, session_stats

    ev = read_table(spark, f"{sf_dir}/events.parquet")
    ivals = session_stats(ev, gap_s=7200.0).select(
        "user_id", "session_idx", "start_us",
        (F.col("start_us") + F.col("duration_us")).alias("end_us"))
    pts = ev.withColumn("ts_us", _ts_micros(ev, "ts")).select(
        "event_id", "user_id", "ts_us")
    out = range_join_points(
        pts, ivals, on="user_id", point_ts="ts_us",
        start_col="start_us", end_col="end_us",
        bucket_width_us=21_600_000_000)
    return out.select("event_id", "user_id", "session_idx")


_SQL_RANGE_JOIN_SESSIONS = """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS tus FROM events
), l AS (
  SELECT user_id, event_id, tus,
         lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS prev
  FROM e
), s AS (
  SELECT user_id, event_id, tus,
         sum(CASE WHEN prev IS NULL OR tus - prev > 7200000000
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY tus, event_id
                 ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM l
), iv AS (
  SELECT user_id, session_idx, min(tus) AS start_us, max(tus) AS end_us
  FROM s GROUP BY 1, 2
)
SELECT p.event_id, p.user_id, iv.session_idx::BIGINT AS session_idx
FROM e p JOIN iv ON iv.user_id = p.user_id
              AND p.tus BETWEEN iv.start_us AND iv.end_us
"""


def q_hypertable_rollup(spark, sf_dir):
    """Hypertable continuous-aggregate rollup (tsa/rollup.py): hourly
    (bucket, event_type) partials — ONE map-side-combined aggregation
    collapsing the raw events — re-aggregated to daily stats WITHOUT
    re-reading raw data (counts/sums re-add, min/max fold, avg derives
    at read time).  The oracle aggregates raw events directly at daily
    granularity, so the correctness law under test is
    rollup-from-partials == direct."""
    from pyspark.sql import functions as F

    from cuml_spark.tsa.rollup import rollup_partials, rollup_reaggregate

    ev = read_table(spark, f"{sf_dir}/events.parquet")
    hourly = rollup_partials(ev, bucket_s=3600, keys=["event_type"])
    daily = rollup_reaggregate(
        hourly, fine_bucket_s=3600, coarse_bucket_s=86400,
        keys=["event_type"])
    return daily.select(
        "bucket_us", "event_type",
        F.col("n").cast("long").alias("n"),
        F.round("sum_value", 4).alias("sum_value"),
        F.round("min_value", 4).alias("min_value"),
        F.round("max_value", 4).alias("max_value"),
        # avg derives from the ROUNDED sum: the two-stage partial sum can
        # differ from the oracle's direct sum by 1 ulp, and an avg landing
        # exactly on the 6dp rounding boundary (seen: 56.4009375) would
        # flake — dividing the 4dp-rounded sum makes both engines' inputs
        # bit-identical before the division
        F.round(F.round("sum_value", 4) / F.col("n"), 6).alias("avg_value"),
    )


_SQL_HYPERTABLE_ROLLUP = """
SELECT (epoch_us(ts) // 86400000000) * 86400000000 AS bucket_us,
       event_type,
       count(*)::BIGINT AS n,
       round(sum(value), 4) AS sum_value,
       round(min(value), 4) AS min_value,
       round(max(value), 4) AS max_value,
       round(round(sum(value), 4) / count(*), 6) AS avg_value
FROM events
GROUP BY 1, 2
"""


QUERIES_TSA = {
    "pipeline_event_profile": q_pipeline_event_profile,
    "kalman_local_level": q_kalman_local_level,
    "holtwinters_forecast": q_holtwinters_forecast,
    "arima_grid_aic": q_arima_grid_aic,
    "arima_ml_aic": q_arima_ml_aic,
    "arima_forecast": q_arima_forecast,
    "event_sessions": q_event_sessions,
    "asof_join_events": q_asof_join_events,
    "range_join_sessions": q_range_join_sessions,
    "hypertable_rollup": q_hypertable_rollup,
}

ORACLES_TSA = {
    "pipeline_event_profile": _SQL_PIPELINE_EVENT_PROFILE,
    "kalman_local_level": _SQL_KALMAN_LOCAL_LEVEL,
    "holtwinters_forecast": _sql_envelope(7),
    "arima_grid_aic": _SQL_ARIMA_GRID_AIC,
    "arima_ml_aic": _SQL_ARIMA_ML_AIC,
    "arima_forecast": _sql_envelope(5),
    "event_sessions": _SQL_EVENT_SESSIONS,
    "asof_join_events": _SQL_ASOF_JOIN_EVENTS,
    "range_join_sessions": _SQL_RANGE_JOIN_SESSIONS,
    "hypertable_rollup": _SQL_HYPERTABLE_ROLLUP,
}
