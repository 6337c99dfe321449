"""Semantics of the PromQL derivative family (operators/derivatives.py):
changes / idelta / regression_fit / predict_linear — hand-computable
fixtures, exact expectations (the contract queries add the DuckDB
hash-exactness; these pin the semantics)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from mq_to_db_spark.operators.derivatives import (
    discrete_changes,
    idelta,
    predict_linear,
    regression_fit,
)


def _series(spark, rows):
    return spark.createDataFrame(
        [(k, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), float(v), i)
         for i, (k, s, v) in enumerate(rows)],
        "k string, ts timestamp, value double, rid long",
    )


def test_changes_counts_transitions_not_samples(spark):
    # k=a: 1,1,2,2,3 → changes at samples 3 and 5 → 2 (same hour)
    # first-ever sample never counts; equal consecutive values don't
    df = _series(spark, [("a", 0, 1), ("a", 10, 1), ("a", 20, 2),
                         ("a", 30, 2), ("a", 40, 3)])
    out = discrete_changes(df, ["k"], tier="1h", tiebreak=("rid",)).collect()
    assert len(out) == 1
    assert out[0]["n_changes"] == 2


def test_changes_crosses_bucket_boundary(spark):
    # last sample of hour 0 is 5; first of hour 1 is 6 → that change is
    # attributed to hour 1 (the later sample's bucket)
    df = _series(spark, [("a", 3590, 5), ("a", 3610, 6), ("a", 3620, 6)])
    out = {r["bucket_start"].hour: r["n_changes"]
           for r in discrete_changes(df, ["k"], tier="1h", tiebreak=("rid",)).collect()}
    assert out == {0: 0, 1: 1}


def test_idelta_last_two_and_null_when_single(spark):
    # hour 0: samples 10, 30, 25 → idelta = 25 - 30 = -5
    # hour 1: one sample → NULL
    df = _series(spark, [("a", 0, 10), ("a", 60, 30), ("a", 120, 25),
                         ("a", 3700, 99)])
    rows = {r["bucket_start"].hour: r["idelta"]
            for r in idelta(df, ["k"], tier="1h", tiebreak=("rid",)).collect()}
    assert rows[0] == -5.0
    assert rows[1] is None


def test_regression_fit_recovers_exact_line(spark):
    # y = 3x + 7 at minutes 0..9 → slope exactly 3, intercept exactly 7
    df = spark.createDataFrame(
        [("a", dt.datetime(2024, 1, 1, 0, m), 3 * m + 7) for m in range(10)],
        "k string, ts timestamp, y long",
    )
    row = regression_fit(df, ["k"], y_col="y", tier="1d", x_unit_seconds=60).first()
    assert row["slope"] == 3.0
    assert row["intercept"] == 7.0
    assert row["n_samples"] == 10


def test_regression_fit_null_slope_on_vertical(spark):
    # two samples in the same minute → zero x-variance → NULL fit
    df = spark.createDataFrame(
        [("a", dt.datetime(2024, 1, 1, 0, 0, 1), 1),
         ("a", dt.datetime(2024, 1, 1, 0, 0, 2), 9)],
        "k string, ts timestamp, y long",
    )
    row = regression_fit(df, ["k"], y_col="y", tier="1d", x_unit_seconds=60).first()
    assert row["slope"] is None and row["intercept"] is None


def test_predict_linear_extrapolates_bucket_end_plus_horizon(spark):
    # exact line y = 2x + 1 → prediction at x = 1440 + 60 is 2*1500 + 1
    df = spark.createDataFrame(
        [("a", dt.datetime(2024, 1, 1, 0, m), 2 * m + 1) for m in range(5)],
        "k string, ts timestamp, y long",
    )
    row = predict_linear(
        df, ["k"], y_col="y", tier="1d", x_unit_seconds=60, horizon_units=60
    ).first()
    assert row["predicted"] == 2 * 1500.0 + 1


def test_changes_single_exchange_plan(spark):
    """Window-on-keys then agg-on-(keys,bucket) must reuse one hash
    exchange (the counters.py plan shape)."""
    df = _series(spark, [("a", 0, 1), ("b", 10, 2)])
    plan = discrete_changes(df, ["k"], tier="1h", tiebreak=("rid",))._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_offset_delta_wow_semantics(spark):
    from mq_to_db_spark.operators.derivatives import offset_delta

    rows = [("a", dt.datetime(2024, 1, 1) + dt.timedelta(hours=h), v)
            for h, v in enumerate([10, 0, 4, 20, 5, 8])]
    df = spark.createDataFrame(rows, "k string, bucket_start timestamp, v long")
    got = {r.bucket_start.hour: (r.v_prev, r.delta, r.ratio)
           for r in offset_delta(df, ["k"], offset_buckets=3).collect()}
    assert got[0] == (None, None, None)   # leading buckets: no baseline
    assert got[3] == (10, 10, 2.0)
    assert got[4] == (0, 5, None)         # prev=0 → ratio NULL, delta exact
    assert got[5] == (4, 4, 2.0)


def test_gauge_delta_last_minus_first(spark):
    from mq_to_db_spark.operators.derivatives import gauge_delta

    # k=a hour 0: 5 → 2 → 9: delta = 9 - 5 = 4 (interior ignored, no
    # reset folding — a gauge may dip below its start legitimately)
    # k=b hour 0: single sample → 0
    # k=c hour 0: descending 8 → 3 → negative delta
    df = _series(spark, [
        ("a", 0, 5), ("a", 600, 2), ("a", 1200, 9),
        ("b", 30, 42),
        ("c", 0, 8), ("c", 60, 3),
    ])
    got = {r.k: r.delta for r in
           gauge_delta(df, ["k"], tier="1h", tiebreak=("rid",)).collect()}
    assert got == {"a": 4.0, "b": 0.0, "c": -5.0}


def test_gauge_delta_tiebreak_and_plan(spark):
    from mq_to_db_spark.operators.derivatives import gauge_delta

    # two samples share ts=0: rid orders them (5 first, 7 second);
    # last sample is at 10s → delta = 1 - 5
    df = _series(spark, [("a", 0, 5), ("a", 0, 7), ("a", 10, 1)])
    assert gauge_delta(df, ["k"], tier="1h", tiebreak=("rid",)).collect()[0]["delta"] == -4.0
    # fresh plan: a collected DF's plan string carries BOTH the AQE
    # final and initial plans, double-counting every Exchange
    plan = (
        gauge_delta(df, ["k"], tier="1h", tiebreak=("rid",))
        ._jdf.queryExecution().executedPlan().toString()
    )
    # ONE hash agg, no window sort
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Window" not in plan
