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


# ------------------------------------------------------------------ LTOB


def _brute_ltob(pdf: pd.DataFrame, freq: str = "h"):
    """Per (series, bucket) keep the max-area point; endpoints area=inf;
    ties → latest (ts, sid)."""
    want = {}
    for s, g in pdf.groupby("series", sort=False):
        g = g.sort_values(["ts", "sid"]).reset_index(drop=True)
        x = g.ts.astype("int64") // 1_000
        y = g.value.astype(float)
        areas = []
        for i in range(len(g)):
            if i == 0 or i == len(g) - 1:
                areas.append(float("inf"))
            else:
                dx1, dy1 = x[i] - x[i - 1], y[i] - y[i - 1]
                dx2, dy2 = x[i + 1] - x[i - 1], y[i + 1] - y[i - 1]
                areas.append(abs(dx1 * dy2 - dx2 * dy1))
        g = g.assign(area=areas, x=x)
        for b, gb in g.groupby(g.ts.dt.floor(freq), sort=False):
            top = gb.sort_values(["area", "x", "sid"], ascending=False).iloc[0]
            want[(s, b)] = (top.ts, float(top.value), len(gb))
    return want


def test_lttb_matches_naive(spark):
    from mq_to_db_spark.operators.downsample import downsample_lttb

    df, pdf = _fixture(spark)
    got = {
        (r.series, r.bucket_start): (r.ts, r.value, r.n_samples)
        for r in downsample_lttb(
            df, ["series"], tier="1h", tiebreak=("sid",)
        ).collect()
    }
    assert got == _brute_ltob(pdf)


def test_lttb_keeps_endpoints_and_extremes(spark):
    from mq_to_db_spark.operators.downsample import downsample_lttb

    # flat series with one spike: the spike's bucket must select the spike
    base = pd.Timestamp("2024-03-01 00:00:00")
    rows = [("z", base + pd.Timedelta(minutes=10 * i), i, 5.0) for i in range(30)]
    rows[14] = ("z", rows[14][1], 14, 500.0)  # spike mid-series
    pdf = pd.DataFrame(rows, columns=["series", "ts", "sid", "value"])
    df = spark.createDataFrame(pdf)
    sel = {
        r.bucket_start: (r.ts, r.value)
        for r in downsample_lttb(df, ["series"], tier="1h", tiebreak=("sid",)).collect()
    }
    # endpoints always kept in their buckets
    assert sel[base.to_pydatetime()][0] == base.to_pydatetime()
    last = rows[-1][1]
    assert sel[last.floor("h").to_pydatetime()][0] == last.to_pydatetime()
    spike_ts = rows[14][1]
    assert sel[spike_ts.floor("h").to_pydatetime()] == (
        spike_ts.to_pydatetime(),
        500.0,
    )


def test_lttb_plan_one_window_one_agg(spark):
    from mq_to_db_spark.operators.downsample import downsample_lttb

    df, _ = _fixture(spark)
    plan = _plan(downsample_lttb(df, ["series"], tier="1h", tiebreak=("sid",)))
    # window shuffle on series; agg reuses it (keys ⊂ group keys)
    assert plan.count("Exchange") <= 2, plan
    assert "PythonUDF" not in plan, plan


# ------------------------------------------------------------------ M4


def _brute_m4(pdf: pd.DataFrame, freq: str = "h"):
    """Per (series, bucket) the DISTINCT {first, last, min, max} points:
    first/last by (ts, sid); min by (value, ts, sid) asc; max desc."""
    want = {}
    for (s, b), g in pdf.groupby(["series", pdf.ts.dt.floor(freq)], sort=False):
        by_ts = g.sort_values(["ts", "sid"])
        by_val = g.sort_values(["value", "ts", "sid"])
        picks = {
            (r.ts, float(r.value))
            for r in (
                by_ts.iloc[0], by_ts.iloc[-1], by_val.iloc[0], by_val.iloc[-1]
            )
        }
        want[(s, b)] = picks
    return want


def test_m4_matches_naive(spark):
    from mq_to_db_spark.operators.downsample import downsample_m4

    df, pdf = _fixture(spark)
    got: dict = {}
    for r in downsample_m4(df, ["series"], tier="1h", tiebreak=("sid",)).collect():
        got.setdefault((r.series, r.bucket_start), set()).add((r.ts, r.value))
    assert got == _brute_m4(pdf)


def test_m4_collapses_coincident_picks(spark):
    # monotone series: first IS the min and last IS the max -> 2 rows
    base = pd.Timestamp("2024-03-01 00:00:00")
    rows = [("m", base + pd.Timedelta(minutes=5 * i), i, float(i)) for i in range(6)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["series", "ts", "sid", "value"]))
    from mq_to_db_spark.operators.downsample import downsample_m4

    out = downsample_m4(df, ["series"], tier="1h", tiebreak=("sid",)).collect()
    assert len(out) == 2
    assert {(r.ts, r.value) for r in out} == {
        (base.to_pydatetime(), 0.0),
        ((base + pd.Timedelta(minutes=25)).to_pydatetime(), 5.0),
    }


def test_m4_plan_single_agg_no_window(spark):
    from mq_to_db_spark.operators.downsample import downsample_m4

    df, _ = _fixture(spark)
    plan = _plan(downsample_m4(df, ["series"], tier="1h", tiebreak=("sid",)))
    assert plan.count("Exchange") == 1, plan
    assert "Window" not in plan, plan
