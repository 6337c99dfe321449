"""Theil-Sen robust slope (operators/derivatives.py theil_sen):
median-of-pairwise-slopes vs a numpy replay, outlier robustness vs
least squares, vertical-pair exclusion, and the one-agg plan."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from mq_to_db_spark.operators.derivatives import regression_fit, theil_sen

BASE = pd.Timestamp("2024-04-01 00:00:00")


def _series(spark, ys, key="k"):
    rows = [
        (key, BASE + pd.Timedelta(hours=i), int(y)) for i, y in enumerate(ys)
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["g", "ts", "y"]))


def _brute(ys):
    xs = np.arange(len(ys))
    slopes = sorted(
        (ys[j] - ys[i]) / (xs[j] - xs[i])
        for i in range(len(ys))
        for j in range(i + 1, len(ys))
    )
    m = slopes[(len(slopes) + 1) // 2 - 1]  # lower median
    resid = sorted(y - m * x for x, y in zip(xs, ys))
    b = resid[(len(resid) + 1) // 2 - 1]
    return round(m, 6), round(b, 6)


def test_matches_naive(spark):
    ys = [3, 7, 4, 11, 9, 15, 12, 20]
    got = theil_sen(_series(spark, ys), ["g"], y_col="y", tier="1d").first()
    m, b = _brute(ys)
    assert (got.slope, got.intercept) == (m, b)
    assert got.n_samples == 8 and got.n_pairs == 28


def test_robust_to_one_spike(spark):
    # clean slope-2 line with one huge spike: LS slope drags, TS holds
    ys = [2 * i for i in range(24)]
    ys[10] = 10_000
    df = _series(spark, ys)
    ts_fit = theil_sen(df, ["g"], y_col="y", tier="1d").first()
    ls_fit = regression_fit(
        df, ["g"], y_col="y", tier="1d", x_unit_seconds=3600
    ).first()
    assert abs(ts_fit.slope - 2.0) < 0.15
    assert abs(ls_fit.slope - 2.0) > 1.0


def test_single_sample_null(spark):
    got = theil_sen(_series(spark, [5]), ["g"], y_col="y", tier="1d").first()
    assert got.n_pairs == 0 and got.slope is None and got.intercept is None


def test_duplicate_x_pairs_dropped(spark):
    rows = [
        ("g", BASE, 1),
        ("g", BASE, 9),           # same hour -> same x: vertical pair
        ("g", BASE + pd.Timedelta(hours=1), 3),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["g", "ts", "y"]))
    got = theil_sen(df, ["g"], y_col="y", tier="1d").first()
    assert got.n_samples == 3 and got.n_pairs == 2  # (1,3) and (9,3) only


def test_plan_one_exchange_no_udf(spark):
    ys = list(range(24))
    plan = (
        theil_sen(_series(spark, ys), ["g"], y_col="y", tier="1d")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1, plan
    assert "PythonUDF" not in plan, plan
