"""Additive Holt-Winters (operators/ewma.py holt_winters_seasonal):
recurrence vs a python replay, seasonal tracking on a planted cycle,
short-series NULLs, and Arrow-batched plan."""

from __future__ import annotations

import math

import pandas as pd

from mq_to_db_spark.operators.ewma import holt_winters_seasonal

BASE = pd.Timestamp("2024-03-01 00:00:00")


def _series(spark, ys, key="k"):
    rows = [(key, BASE + pd.Timedelta(hours=i), int(y)) for i, y in enumerate(ys)]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["g", "ts", "y"]))


def _brute(ys, m, a, b, g):
    n = len(ys)
    out = [(None,) * 4] * n
    if n < 2 * m:
        return out
    s1, s2 = sum(ys[0:m]), sum(ys[m : 2 * m])
    lev, tr = s1 / m, (s2 / m - s1 / m) / m
    seas = [ys[i] - lev for i in range(m)]
    oma, omb, omg = 1.0 - a, 1.0 - b, 1.0 - g
    for t in range(m, n):
        sh = seas[0]
        fitted = lev + tr + sh
        ln = a * (ys[t] - sh) + oma * (lev + tr)
        bn = b * (ln - lev) + omb * tr
        sn = g * (ys[t] - ln) + omg * sh
        seas = seas[1:] + [sn]
        lev, tr = ln, bn
        out[t] = tuple(round(v, 6) for v in (lev, tr, sn, fitted))
    return out


def test_matches_naive(spark):
    m = 4
    ys = [10, 14, 9, 5, 12, 17, 11, 6, 15, 20, 13, 8, 18, 23, 16, 10]
    got = (
        holt_winters_seasonal(
            _series(spark, ys), ["g"], value_col="y", period=m,
            alpha=0.3, beta=0.1, gamma=0.2,
        )
        .orderBy("ts")
        .collect()
    )
    want = _brute([float(y) for y in ys], m, 0.3, 0.1, 0.2)
    for r, w in zip(got, want):
        assert (r.level, r.trend, r.seasonal, r.fitted) == w


def test_tracks_planted_cycle(spark):
    # strong 6-sample cycle + slope: the one-step forecast should sit
    # close to the actual once warmed up
    m, n = 6, 60
    cyc = [30, 10, -5, -30, -12, 7]
    ys = [100 + 2 * t + cyc[t % m] for t in range(n)]
    got = (
        holt_winters_seasonal(
            _series(spark, ys), ["g"], value_col="y", period=m,
            alpha=0.4, beta=0.2, gamma=0.3,
        )
        .orderBy("ts")
        .collect()
    )
    tail = got[-12:]
    mape = sum(
        abs(r.fitted - float(y)) / float(y)
        for r, y in zip(tail, ys[-12:])
    ) / 12
    assert mape < 0.02, mape
    # trend estimate converges to the planted slope 2
    assert abs(got[-1].trend - 2.0) < 0.3


def test_short_series_all_null(spark):
    ys = [5, 7, 6, 8, 9, 10, 11]  # n=7 < 2m=8
    got = holt_winters_seasonal(
        _series(spark, ys), ["g"], value_col="y", period=4
    ).collect()
    assert all(r.level is None and r.fitted is None for r in got)


def test_param_validation(spark):
    import pytest

    df = _series(spark, [1, 2, 3, 4])
    with pytest.raises(ValueError):
        holt_winters_seasonal(df, ["g"], value_col="y", alpha=1.5)
    with pytest.raises(ValueError):
        holt_winters_seasonal(df, ["g"], value_col="y", period=1)
    with pytest.raises(ValueError):
        holt_winters_seasonal(df, [], value_col="y")


def test_plan_one_arrow_crossing(spark):
    plan = (
        holt_winters_seasonal(
            _series(spark, list(range(48))), ["g"], value_col="y", period=4
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("FlatMapGroupsInPandas") == 1, plan
    assert plan.count("Exchange") == 1, plan
