"""Benford first-digit audit (operators/benford.py): digit extraction,
shares vs a python replay, chi2 on conforming vs fabricated data, and
the single-agg plan."""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import functions as F

from mq_to_db_spark.operators.benford import (
    BENFORD_P,
    benford_chi2,
    benford_digits,
    first_digit,
)


def _benford_sample(n=2000):
    """Deterministic log-uniform sample (golden-ratio low-discrepancy
    mantissa): equidistributed log10 -> near-exact Benford digits."""
    phi = 0.618_033_988_749
    return [int(10 ** ((i * phi % 1.0) * 8)) + 1 for i in range(n)]


def test_first_digit_extraction(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"v": [123, -9007, 1, 0, None, 500]})
    )
    got = [r[0] for r in df.select(first_digit("v")).collect()]
    assert got == [1, 9, 1, None, None, 5]


def test_shares_match_naive(spark):
    vals = _benford_sample(500)
    df = spark.createDataFrame(pd.DataFrame({"v": vals}))
    got = {
        r.digit: (r.n_obs, r.n_total, r.obs_share, r.benford_share)
        for r in benford_digits(df, "v").collect()
    }
    from collections import Counter

    c = Counter(int(str(abs(v))[0]) for v in vals if v)
    for d, n in c.items():
        assert got[d][0] == n
        assert got[d][1] == len(vals)
        assert got[d][2] == round(n / len(vals), 6)
        assert got[d][3] == round(math.log10(1 + 1 / d), 6)


def test_chi2_separates_conforming_from_flat(spark):
    conforming = _benford_sample(2000)
    flat = [d * 1000 + i for i in range(220) for d in range(1, 10)]  # uniform digits
    df = spark.createDataFrame(
        pd.DataFrame(
            {"g": ["ok"] * len(conforming) + ["bad"] * len(flat),
             "v": conforming + flat}
        )
    )
    got = {r.g: r.chi2 for r in benford_chi2(df, "v", ["g"]).collect()}
    # chi2 95% critical value at 8 dof is 15.51
    assert got["ok"] < 16.0, got
    assert got["bad"] > 100.0, got


def test_chi2_matches_naive(spark):
    vals = _benford_sample(300)
    from collections import Counter

    c = Counter(int(str(v)[0]) for v in vals)
    n = len(vals)
    want = 0.0
    for d in range(1, 10):
        exp = n * BENFORD_P[d - 1]
        want = want + (c.get(d, 0) - exp) ** 2 / exp
    df = spark.createDataFrame(pd.DataFrame({"v": vals}))
    got = benford_chi2(df, "v").first()
    assert got.n_total == n and got.chi2 == round(want, 6)


def test_plan_single_agg(spark):
    df = spark.createDataFrame(pd.DataFrame({"g": ["a"] * 50, "v": range(1, 51)}))
    plan = (
        benford_chi2(df, "v", ["g"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1, plan
    assert "PythonUDF" not in plan, plan
