"""Winsorization (operators/normalize.py) and burstiness/entropy
(operators/burstiness.py): nearest-rank clamps vs a pandas replay,
Fano separation of bursty vs paced streams, entropy extremes, plans."""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import functions as F

from mq_to_db_spark.operators.burstiness import dispersion_1d, entropy_mix
from mq_to_db_spark.operators.normalize import winsorize

BASE = pd.Timestamp("2024-05-01 00:00:00")


def _vals(spark, ys, key="k"):
    rows = [
        (key, BASE + pd.Timedelta(minutes=3 * i), i, float(y))
        for i, y in enumerate(ys)
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["g", "ts", "sid", "value"])
    )


def test_winsorize_matches_nearest_rank(spark):
    ys = [50, 3, 9, 1000, 7, 2, 12, 40, 5, 8, 6, 11, 4, 90, 10, 13, 1, 14, 15, 16]
    df = _vals(spark, ys)
    out = winsorize(
        df, ["g"], tier="1d", p_lo=0.10, p_hi=0.90, tiebreak=("sid",)
    )
    s = sorted(ys)
    n = len(ys)
    lo = s[max(min(math.ceil(0.10 * n), n), 1) - 1]
    hi = s[max(min(math.ceil(0.90 * n), n), 1) - 1]
    got = {r.sid: (r.value_wins, r.lo, r.hi) for r in out.collect()}
    for i, y in enumerate(ys):
        assert got[i] == (float(min(max(y, lo), hi)), lo, hi), (i, y, got[i])


def test_winsorize_null_passthrough_and_tiny_group(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "g": ["a", "a", "a"],
                "ts": [BASE, BASE, BASE],
                "sid": [0, 1, 2],
                "value": [5.0, None, 7.0],
            }
        )
    )
    out = {r.sid: r.value_wins for r in winsorize(df, ["g"], tiebreak=("sid",)).collect()}
    assert out[1] is None
    # n=2: lo rank = ceil(.05*2)=1, hi rank = ceil(.95*2)=2 -> identity
    assert out[0] == 5.0 and out[2] == 7.0


def test_winsorize_plan_one_raw_shuffle(spark):
    df = _vals(spark, list(range(40)))
    plan = (
        winsorize(df, ["g"], tiebreak=("sid",))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "PythonUDF" not in plan, plan


def test_fano_separates_bursty_from_paced(spark):
    rows = []
    # paced: one event exactly every minute for 12h -> var 0 within minutes
    for i in range(720):
        rows.append(("paced", BASE + pd.Timedelta(minutes=i)))
    # bursty: same 720 events crammed into 6 one-minute storms
    for i in range(720):
        rows.append(("bursty", BASE + pd.Timedelta(hours=2 * (i % 6), seconds=i // 6)))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["g", "ts"]))
    got = {r.g: r for r in dispersion_1d(df, ["g"]).collect()}
    assert got["paced"].fano < 1.0
    assert got["bursty"].fano > 50.0
    assert got["paced"].n_events == got["bursty"].n_events == 720
    # exact dense-grid moments for the paced stream: 720 ones in 1440
    assert got["paced"].mean_per_min == 0.5
    assert got["paced"].var_per_min == 0.25
    assert got["paced"].fano == 0.5


def test_entropy_extremes(spark):
    rows = []
    for i in range(100):
        rows.append(("mono", BASE + pd.Timedelta(seconds=i), "a"))
        rows.append(("mix", BASE + pd.Timedelta(seconds=i), "abcd"[i % 4]))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["g", "ts", "cat"]))
    got = {
        r.g: r
        for r in entropy_mix(
            df, ["a", "b", "c", "d"], category_col="cat", tier="1h", keys=["g"]
        ).collect()
    }
    assert got["mono"].entropy == 0.0 and got["mono"].evenness == 0.0
    assert got["mono"].k_observed == 1
    # uniform over 4: entropy = ln 4, evenness = 1
    assert got["mix"].entropy == round(math.log(4), 6)
    assert got["mix"].evenness == 1.0


def test_entropy_ignores_foreign_categories(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {"ts": [BASE] * 4, "cat": ["a", "b", "zz", "zz"]}
        )
    )
    got = entropy_mix(df, ["a", "b"], category_col="cat").first()
    assert got.n_events == 2 and got.k_observed == 2
    assert got.entropy == round(math.log(2), 6)


def test_single_agg_plans(spark):
    rows = [("g", BASE + pd.Timedelta(minutes=i), "a") for i in range(10)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["g", "ts", "cat"]))
    for q in (
        dispersion_1d(df, ["g"]),
        entropy_mix(df, ["a"], category_col="cat", keys=["g"]),
    ):
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "PythonUDF" not in plan, plan
        assert plan.count("Exchange") <= 2, plan
