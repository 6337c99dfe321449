"""Table-level expectation audit (operators/expectations.py)."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from mq_to_db_spark.operators.expectations import (
    accepted_values,
    expect,
    expectations_report,
    in_range,
    monotonic,
    not_null,
    unique,
)

T0 = dt.datetime(2024, 1, 1)


@pytest.fixture()
def table(spark):
    rows = [
        (1, "a", 5.0, T0),
        (2, "a", 3.0, T0 + dt.timedelta(hours=1)),   # value drops: mono violation
        (3, "b", None, T0 + dt.timedelta(hours=2)),  # null value
        (3, "zz", 7.0, T0 + dt.timedelta(hours=3)),  # dup id + bad category
        (4, "b", 150.0, T0 + dt.timedelta(hours=4)), # out of range
    ]
    return spark.createDataFrame(rows, "id long, cat string, v double, ts timestamp")


def test_report_counts(table):
    rep = expectations_report(
        table,
        [
            not_null("v"),
            unique("id"),
            accepted_values("cat", ["a", "b"]),
            in_range("v", 0.0, 100.0),
            expect("no_eve_rows", F.col("cat") == "eve"),
            monotonic("v", keys=["cat"], order_by=["ts"]),
        ],
    ).collect()
    got = {r["expectation"]: (r["n_violations"], r["pass"]) for r in rep}
    assert got["not_null(v)"] == (1, False)
    assert got["unique(id)"] == (1, False)
    assert got["accepted_values(cat in ['a', 'b'])"] == (1, False)
    # in_range counts NULL and the 150.0 row
    assert got["in_range(v in [0.0, 100.0])"] == (2, False)
    assert got["no_eve_rows"] == (0, True)
    # cat a: 5 -> 3 drops once; cat b: NULL then 7 then 150 (NULL prev
    # rows never count)
    assert got["monotonic(v per cat)"] == (1, False)
    assert all(r["n_rows"] == 5 for r in rep)
    # declaration order preserved
    assert [r["expectation"] for r in rep][0] == "not_null(v)"


def test_monotonic_strict_and_global(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, 10.0), (3, 9.0)], "id long, v double"
    )
    loose = expectations_report(df, [monotonic("v", order_by=["id"])]).first()
    strict = expectations_report(
        df, [monotonic("v", order_by=["id"], strict=True)]
    ).first()
    assert loose["n_violations"] == 1  # only the 10 -> 9 drop
    assert strict["n_violations"] == 2  # the plateau also violates


def test_validation_errors(table):
    with pytest.raises(ValueError, match="at least one"):
        expectations_report(table, [])
    with pytest.raises(ValueError, match="duplicate"):
        expectations_report(table, [not_null("v"), not_null("v")])
    with pytest.raises(TypeError, match="not expectations"):
        expectations_report(table, ["not_null(v)"])


def test_foldable_checks_share_one_scan(table):
    rep = expectations_report(
        table, [not_null("v"), in_range("v", 0, 1), accepted_values("cat", ["a"])]
    )
    plan = rep._jdf.queryExecution().optimizedPlan().toString()
    # no monotonic declared -> exactly one relation scan, no window
    assert plan.count("LogicalRDD") == 1
    assert "Window" not in plan
