"""Skew audit vs a pure-Python Gini replay; salt-plan arithmetic."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mq_to_db_spark.operators.skewaudit import key_counts, salt_plan, skew_audit


@pytest.fixture(scope="module")
def skewed(spark):
    # zipf-ish: key i gets ~ 1000/(i+1) rows
    rows = []
    for i in range(50):
        rows.extend((f"k{i:03d}", j) for j in range(1000 // (i + 1)))
    return spark.createDataFrame(rows, "k string, j int")


def _gini(counts):
    cs = sorted(counts)
    n, t = len(cs), sum(cs)
    s1 = sum((i + 1) * c for i, c in enumerate(cs))
    return 2.0 * s1 / (n * t) - (n + 1) / n


def test_audit_matches_python(spark, skewed):
    r = skew_audit(skewed, ["k"]).collect()[0]
    counts = sorted(
        1000 // (i + 1) for i in range(50)
    )
    n, t = len(counts), sum(counts)
    assert (r["n_keys"], r["total_rows"]) == (n, t)
    assert r["max_key_rows"] == 1000
    assert r["p50_key_rows"] == counts[(n + 1) // 2 - 1]
    k1, k10 = max(1, n // 100), max(1, n // 10)
    assert r["top1_share"] == pytest.approx(sum(counts[-k1:]) / t, rel=1e-12)
    assert r["top10_share"] == pytest.approx(sum(counts[-k10:]) / t, rel=1e-12)
    assert r["gini"] == pytest.approx(_gini(counts), rel=1e-12)


def test_uniform_gini_near_zero(spark):
    df = spark.createDataFrame(
        [(f"k{i}", j) for i in range(20) for j in range(10)], "k string, j int"
    )
    r = skew_audit(df, ["k"]).collect()[0]
    assert abs(r["gini"]) < 1e-12 and r["top10_share"] == pytest.approx(0.1)


def test_salt_plan_ceil_and_cap(spark, skewed):
    plan = {r["k"]: (r["n_rows"], r["n_salts"]) for r in salt_plan(
        skewed, ["k"], target_rows=100, max_salts=8
    ).collect()}
    assert plan["k000"] == (1000, 8)  # ceil(1000/100)=10, capped at 8
    assert plan["k001"] == (500, 5)
    assert plan["k049"] == (20, 1)
    with pytest.raises(ValueError):
        salt_plan(skewed, ["k"], target_rows=0)


def test_counts_tier_single_agg_no_python(spark, skewed):
    plan = key_counts(skewed, ["k"])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1
    audit_plan = skew_audit(skewed, ["k"])._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython"):
        assert marker not in audit_plan
