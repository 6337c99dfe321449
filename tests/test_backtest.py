"""Forecast backtesting baselines (operators/backtest.py)."""

from __future__ import annotations

from datetime import datetime, timedelta

import numpy as np
import pytest

from mq_to_db_spark.operators.backtest import backtest_naive


def _series(spark, values_by_key, start=datetime(2024, 1, 1)):
    rows = [
        (k, start + timedelta(hours=i), int(v))
        for k, vals in values_by_key.items()
        for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(
        rows, "k string, bucket_start timestamp, v long"
    )


def test_perfectly_seasonal_series_has_zero_seasonal_error(spark):
    # 4-hour season repeated: seasonal-naive is exact, persistence is not
    pattern = [10, 50, 90, 30]
    df = _series(spark, {"a": pattern * 12})  # 48 hours = 2 days
    out = backtest_naive(df, ["k"], season=4, period="day").collect()
    assert len(out) == 2
    for r in out:
        assert r["abs_err_seasonal"] == 0
        assert r["mae_seasonal"] == 0.0
        assert r["bias_seasonal"] == 0.0
        assert r["wmape_seasonal"] == 0.0
        assert r["mase"] == 0.0          # beats persistence outright
        assert r["abs_err_naive"] > 0


def test_metrics_match_numpy_replay(spark):
    rng = np.random.RandomState(9)
    vals = rng.poisson(30, size=72)
    df = _series(spark, {"a": list(vals)})
    out = {r["period_start"].day: r for r in backtest_naive(df, ["k"], season=24).collect()}
    y = vals.astype(np.int64)
    fn, fs = np.roll(y, 1), np.roll(y, 24)
    # valid eval rows: index >= 24 (both lags defined)
    for day, lo, hi in [(2, 24, 48), (3, 48, 72)]:
        sel = slice(lo, hi)
        e_n = np.abs(y[sel] - fn[sel]).sum()
        e_s = np.abs(y[sel] - fs[sel]).sum()
        r = out[day]
        assert r["n_eval"] == hi - lo
        assert r["abs_err_naive"] == e_n
        assert r["abs_err_seasonal"] == e_s
        assert r["mae_seasonal"] == pytest.approx(e_s / (hi - lo), abs=1e-6)
        assert r["wmape_seasonal"] == pytest.approx(
            e_s / np.abs(y[sel]).sum(), abs=1e-6
        )
        assert r["mase"] == pytest.approx(e_s / e_n, abs=1e-6)
    # day 1 rows (indices 0..23) have no seasonal lag -> no day-1 output
    assert 1 not in out


def test_guards_and_key_isolation(spark):
    # constant series: both forecasters perfect -> naive error 0 -> mase NULL
    df = _series(spark, {"c": [7] * 50, "z": [0] * 50})
    out = {(r["k"], r["period_start"].day): r for r in backtest_naive(df, ["k"], season=4).collect()}
    for (k, _), r in out.items():
        assert r["abs_err_seasonal"] == 0 and r["abs_err_naive"] == 0
        assert r["mase"] is None                       # 0/0 guarded
        if k == "z":
            assert r["wmape_seasonal"] is None         # sum|y| = 0 guarded
        else:
            assert r["wmape_seasonal"] == 0.0


def test_season_validation(spark):
    df = _series(spark, {"a": [1, 2, 3]})
    with pytest.raises(ValueError):
        backtest_naive(df, ["k"], season=0)
