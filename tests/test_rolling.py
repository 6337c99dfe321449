"""Rolling stats / anomaly flags (operators/rolling.py) vs a pandas
replay, injected-spike detection, and the one-exchange keyed plan."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from mq_to_db_spark.operators.rolling import rolling_stats


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _fixture(spark):
    base = pd.Timestamp("2024-06-01 00:00:00")
    rows = []
    for s in ("a", "b"):
        for h in range(72):
            v = 100 + (h % 7) * 3 + (5 if s == "b" else 0)
            if s == "a" and h == 50:
                v = 400  # injected spike
            rows.append((s, base + pd.Timedelta(hours=h), float(v)))
    pdf = pd.DataFrame(rows, columns=["series", "bucket_start", "value"])
    return spark.createDataFrame(pdf), pdf


def test_rolling_matches_pandas(spark):
    df, pdf = _fixture(spark)
    out = rolling_stats(df, ["series"], window=24).collect()
    got = {
        (r.series, r.bucket_start): (r.roll_avg, r.roll_std, r.zscore, r.is_anomaly)
        for r in out
    }
    for s, g in pdf.groupby("series"):
        g = g.sort_values("bucket_start", ignore_index=True)
        avg = g.value.rolling(24, min_periods=1).mean()
        std = g.value.rolling(24, min_periods=1).std()
        pavg = g.value.rolling(24, min_periods=1).mean().shift(1)
        # pandas cannot express "trailing 24 excluding current" directly
        # with rolling(...).shift when the window is saturated — replay
        # manually
        for i, r in g.iterrows():
            key = (s, r.bucket_start)
            a, sd, z, fl = got[key]
            assert a == round(avg[i], 6)
            assert (sd is None and pd.isna(std[i])) or sd == round(std[i], 6)
            lo = max(0, i - 24)
            baseline = g.value.iloc[lo:i]
            if len(baseline) >= 2 and baseline.std() > 0:
                want_z = round((r.value - baseline.mean()) / baseline.std(), 6)
                assert z == want_z, (key, z, want_z)
                assert fl == (abs(want_z) > 3.0)
            else:
                assert z is None and fl is False, key


def test_spike_is_flagged(spark):
    df, _ = _fixture(spark)
    out = rolling_stats(df, ["series"], window=24).collect()
    flagged = {(r.series, r.bucket_start.day, r.bucket_start.hour) for r in out if r.is_anomaly}
    assert ("a", 3, 2) in flagged  # hour 50 = day 3, 02:00
    assert all(s == "a" for s, *_ in flagged)


def test_window_validation(spark):
    import pytest

    df, _ = _fixture(spark)
    with pytest.raises(ValueError):
        rolling_stats(df, ["series"], window=1)


def test_keyed_plan_single_exchange(spark):
    df, _ = _fixture(spark)
    plan = _plan(rolling_stats(df, ["series"], window=24))
    assert plan.count("Exchange") == 1, plan
