"""Streaming Kalman filter — stateful per-series filtering over a stream.

Reference: ``cuml.KalmanFilter`` (python/cuml/filter/kalman_filter.pyx:115)
is the reference's only stateful-iterative operator; SURVEY.md §2.6 flags it
as the one legitimately streaming-shaped piece of the port.  The batch twin
lives in cuml_spark.tsa.kalman; this module is the Structured Streaming
variant: ``applyInPandasWithState`` keeps (x, P) per series across
micro-batches, so the same scalar local-level recursion runs incrementally
as events arrive.

Semantics: rows within a micro-batch are processed in ``t`` order per
series; state carries across batches.  Late (out-of-order ACROSS batches)
data is the caller's problem — bound it upstream with a watermark and
window, as any streaming stateful op requires.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_local_level_filter(
    stream_df: DataFrame,
    series_col: str = "series_id",
    t_col: str = "t",
    y_col: str = "y",
    q: float = 1e-3,
    r: float = 1.0,
    p0: float = 1e6,
) -> DataFrame:
    """readStream frame → filtered stream (series_id, t, y, x, p).

    One shuffle per micro-batch on series_id; state is two doubles per
    series — at 100 TB/day of events the state store holds n_series rows,
    not n_events.
    """
    long_df = stream_df.select(
        F.col(series_col).cast("string").alias("series_id"),
        F.col(t_col).cast("long").alias("t"),
        F.col(y_col).cast("double").alias("y"),
    )

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            xt, pt, initialized = state.get
        else:
            xt, pt, initialized = 0.0, p0, False
        for pdf in pdfs:
            pdf = pdf.sort_values("t")
            xs, ps = [], []
            for y in pdf["y"].to_numpy():
                if not initialized:
                    xt, initialized = float(y), True
                pt = pt + q
                k = pt / (pt + r)
                xt = xt + k * (float(y) - xt)
                pt = (1.0 - k) * pt
                xs.append(xt)
                ps.append(pt)
            out = pdf.assign(x=xs, p=ps)
            yield out[["series_id", "t", "y", "x", "p"]]
        state.update((float(xt), float(pt), initialized))

    return long_df.groupBy("series_id").applyInPandasWithState(
        update,
        outputStructType="series_id string, t long, y double, x double, p double",
        stateStructType="x double, p double, initialized boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
