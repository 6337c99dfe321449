"""Kaplan-Meier survival (operators/survival.py): lifetimes + censoring
rule, the KM curve vs a hand-rolled replay, censored-at-risk semantics,
and the S=0 terminal row."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from mq_to_db_spark.operators.survival import conv_lifetimes, kaplan_meier

BASE = pd.Timestamp("2024-07-01 00:00:00")


def _lifetimes_df(spark, durs_obs: list[tuple[int, int]]):
    """Build a lifetimes frame directly: (duration_us, observed)."""
    return spark.createDataFrame(
        pd.DataFrame(
            [(f"c{i}", d, o) for i, (d, o) in enumerate(durs_obs)],
            columns=["conv_id", "duration_us", "observed"],
        )
    )


def _brute_km(durs_obs: list[tuple[int, int]]):
    times = sorted({d for d, o in durs_obs if o == 1})
    out = {}
    s = 1.0
    import math

    lns = 0.0
    for t in times:
        n = sum(1 for d, _o in durs_obs if d >= t)
        dd = sum(1 for d, o in durs_obs if d == t and o == 1)
        cc = sum(1 for d, o in durs_obs if d == t and o == 0)
        if dd >= n:
            s = 0.0
        else:
            lns += math.log(1.0 - dd / n)
            s = math.exp(lns)
        out[t] = (n, dd, cc, round(s, 6))
    return out


def test_km_matches_naive_with_censoring(spark):
    durs = [
        (10, 1), (10, 1), (10, 0),   # two deaths + one censored tie at 10
        (20, 1), (25, 0), (30, 1),
        (40, 0), (50, 1),
    ]
    got = {
        r.duration_us: (r.n_at_risk, r.n_deaths, r.n_censored, r.survival)
        for r in kaplan_meier(_lifetimes_df(spark, durs)).collect()
    }
    assert got == _brute_km(durs)


def test_terminal_death_survival_zero(spark):
    durs = [(5, 1), (9, 1), (12, 1)]  # everyone observed -> S ends at 0
    rows = sorted(
        kaplan_meier(_lifetimes_df(spark, durs)).collect(),
        key=lambda r: r.duration_us,
    )
    assert rows[-1].survival == 0.0
    assert rows[0].survival == round(2 / 3, 6)
    assert got_monotone([r.survival for r in rows])


def got_monotone(xs):
    return all(a >= b for a, b in zip(xs, xs[1:]))


def test_censored_hold_the_at_risk_set(spark):
    # one death at 10 with 9 censored later: S(10) = 1 - 1/10, not 0
    durs = [(10, 1)] + [(100 + i, 0) for i in range(9)]
    rows = kaplan_meier(_lifetimes_df(spark, durs)).collect()
    assert len(rows) == 1
    assert rows[0].n_at_risk == 10 and rows[0].survival == 0.9


def test_conv_lifetimes_censor_rule(spark):
    rows = []
    # conv A: ends long before corpus max -> observed
    rows += [("A", BASE), ("A", BASE + pd.Timedelta(minutes=5))]
    # conv B: last turn inside the horizon of corpus max -> censored
    rows += [("B", BASE), ("B", BASE + pd.Timedelta(hours=23, minutes=40))]
    # conv C: single turn, defines corpus max -> censored, duration 0
    rows += [("C", BASE + pd.Timedelta(hours=24))]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["conv_id", "ts"]))
    got = {
        r.conv_id: (r.duration_us, r.observed)
        for r in conv_lifetimes(df, censor_horizon="1 hour").collect()
    }
    assert got == {
        "A": (5 * 60 * 1_000_000, 1),
        "B": ((23 * 60 + 40) * 60 * 1_000_000, 0),
        "C": (0, 0),
    }


def test_plan_no_single_partition_window(spark):
    durs = [(i * 7 % 97, i % 3 != 0) for i in range(60)]
    df = _lifetimes_df(spark, [(d, int(o)) for d, o in durs])
    plan = (
        kaplan_meier(df)._jdf.queryExecution().executedPlan().toString()
    )
    # the range-partitioned prefix sums must not plan a global
    # partition-by-constant window over the data (the spine carry's tiny
    # n_buckets-row window is fine: it windows on _rb from a range())
    assert "PythonUDF" not in plan, plan
