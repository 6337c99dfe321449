"""OHLC downsampling (operators/downsample.py): open/high/low/close vs a
pandas replay, duplicate-timestamp determinism via tiebreak, tier-cascade
mergeability (1h → 1d equals raw → 1d), and the single-agg/no-window
plan."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from mq_to_db_spark.operators.downsample import downsample_ohlc


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _fixture(spark):
    # integer values (exact float sums); deterministic pseudo-walk over
    # 2 series × 50 hours, 4 samples/hour, plus a duplicate-ts pair
    rows = []
    base = pd.Timestamp("2024-03-01 00:00:00")
    for s in ("x", "y"):
        v = 100 if s == "x" else 17
        i = 0
        for h in range(50):
            for q in range(4):
                v = (v * 31 + 7 + h + q) % 1000
                rows.append((s, base + pd.Timedelta(hours=h, minutes=15 * q), i, v))
                i += 1
    # duplicate timestamp: two samples at the same instant, tiebreak sid
    rows.append(("x", base, 9001, 555))
    pdf = pd.DataFrame(rows, columns=["series", "ts", "sid", "value"])
    df = spark.createDataFrame(pdf).withColumn("value", F.col("value").cast("double"))
    return df, pdf


def test_ohlc_matches_naive(spark):
    df, pdf = _fixture(spark)
    got = {
        (r.series, r.bucket_start): (
            r.open, r.high, r.low, r.close, r.n_samples, r.value_sum
        )
        for r in downsample_ohlc(
            df, ["series"], tier="1h", tiebreak=("sid",)
        ).collect()
    }
    want = {}
    for (s, b), g in pdf.groupby(["series", pdf.ts.dt.floor("h")], sort=False):
        g = g.sort_values(["ts", "sid"])
        want[(s, b)] = (
            float(g.value.iloc[0]),
            float(g.value.max()),
            float(g.value.min()),
            float(g.value.iloc[-1]),
            len(g),
            round(float(g.value.sum()), 6),
        )
    assert got == want


def test_ohlc_cascade_mergeable(spark):
    """1d OHLC merged from the 1h output (open/close carried via
    min_by/max_by over bucket_start) equals 1d straight from raw — the
    tier-cascade invariant rollup.py relies on."""
    df, _ = _fixture(spark)
    hourly = downsample_ohlc(df, ["series"], tier="1h", tiebreak=("sid",))
    merged = (
        hourly.groupBy(
            "series", F.date_trunc("day", "bucket_start").alias("bucket_start")
        )
        .agg(
            F.min_by("open", "bucket_start").alias("open"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.max_by("close", "bucket_start").alias("close"),
            F.sum("n_samples").alias("n_samples"),
            F.round(F.sum("value_sum"), 6).alias("value_sum"),
        )
    )
    direct = downsample_ohlc(df, ["series"], tier="1d", tiebreak=("sid",))
    key = lambda r: (r.series, r.bucket_start)
    assert sorted(map(tuple, merged.collect()), key=lambda t: (t[0], t[1])) == sorted(
        map(tuple, direct.collect()), key=lambda t: (t[0], t[1])
    )


def test_ohlc_plan_single_agg_no_window(spark):
    df, _ = _fixture(spark)
    plan = _plan(downsample_ohlc(df, ["series"], tier="1h", tiebreak=("sid",)))
    assert plan.count("Exchange") == 1, plan
    assert "Window" not in plan, plan
