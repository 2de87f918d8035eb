"""KPSS stationarity vs a direct numpy transcription of Kwiatkowski eq. 10
(mirrors src_prims/timeSeries/stationarity.h:345 semantics)."""

from __future__ import annotations

import numpy as np
import pytest

from cuml_spark.tsa import kpss_statistic, stationarity


def _np_kpss(y: np.ndarray, lags: int) -> float:
    n = len(y)
    e = y - y.mean()
    s = np.cumsum(e)
    eta = (s ** 2).sum() / n ** 2
    s2 = (e ** 2).sum() / n
    for l in range(1, lags + 1):
        w = 1 - l / (lags + 1)
        s2 += 2 * w * (e[l:] * e[:-l]).sum() / n
    return eta / s2


@pytest.fixture(scope="module")
def series_df(spark):
    rng = np.random.RandomState(7)
    rows = []
    # series 0: white noise (stationary); series 1: random walk (not)
    y0 = rng.standard_normal(200)
    y1 = np.cumsum(rng.standard_normal(200)) + 50
    for t in range(200):
        rows.append((0, t, float(y0[t])))
        rows.append((1, t, float(y1[t])))
    return spark.createDataFrame(rows, "series_id int, t int, y double"), y0, y1


@pytest.mark.parametrize("lags", [0, 4])
def test_kpss_matches_numpy(series_df, lags):
    df, y0, y1 = series_df
    got = {r["series_id"]: r["kpss_stat"] for r in kpss_statistic(df, lags=lags).collect()}
    assert got[0] == pytest.approx(_np_kpss(y0, lags), rel=1e-9)
    assert got[1] == pytest.approx(_np_kpss(y1, lags), rel=1e-9)


def test_stationarity_decision(series_df):
    df, *_ = series_df
    got = {r["series_id"]: r["d"] for r in stationarity(df, lags=4).collect()}
    assert got[0] == 0  # white noise: stationary, no differencing
    assert got[1] == 1  # random walk: difference once
