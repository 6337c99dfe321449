"""PSI vs a numpy fixed-order replay; drift sensitivity sanity."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from mq_to_db_spark.operators.drift import bucket_index, psi

EDGES = [20, 40, 60, 80]


@pytest.fixture(scope="module")
def vals(spark):
    rng = np.random.default_rng(9)
    rows = []
    for d in range(4):
        # day 3 drifts upward
        lo, hi = (0, 100) if d < 3 else (40, 140)
        rows.extend((d, int(v)) for v in rng.integers(lo, hi, size=300))
    return spark.createDataFrame(rows, "day int, v long")


def _replay(pdf):
    nb = len(EDGES) + 1
    def b(v):
        return sum(v >= e for e in EDGES)
    per = {}
    for d, v in pdf:
        per.setdefault(d, [0] * nb)
        per[d][b(v)] += 1
    q = [sum(per[d][i] for d in per) for i in range(nb)]
    nq = sum(q)
    out = {}
    for d, cs in per.items():
        n = sum(cs)
        acc = 0.0
        for i in range(nb):
            p_ = (cs[i] + 1) / (n + nb)
            q_ = (q[i] + 1) / (nq + nb)
            acc += (p_ - q_) * math.log(p_ / q_)
        out[d] = (n, acc)
    return out


def test_matches_replay_and_flags_drift(spark, vals):
    got = {r["period"]: (r["n"], r["psi"]) for r in psi(
        vals, F.col("day"), F.col("v"), EDGES
    ).collect()}
    want = _replay([(r["day"], r["v"]) for r in vals.collect()])
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0]
        assert got[d][1] == pytest.approx(want[d][1], rel=1e-12)
    # the drifted day stands out
    assert got[3][1] > 3 * max(got[d][1] for d in (0, 1, 2))


def test_identical_periods_near_zero(spark):
    df = spark.createDataFrame(
        [(d, v) for d in range(3) for v in range(100)], "day int, v long"
    )
    for r in psi(df, F.col("day"), F.col("v"), EDGES).collect():
        assert abs(r["psi"]) < 1e-12


def test_bucket_index_edges(spark):
    df = spark.createDataFrame([(0,), (19,), (20,), (79,), (80,), (500,)], "v long")
    got = [r["b"] for r in df.select(bucket_index(F.col("v"), EDGES).alias("b")).collect()]
    assert got == [0, 0, 1, 3, 4, 4]


def test_plan_no_python_one_raw_scan_agg(spark, vals):
    plan = (
        psi(vals, F.col("day"), F.col("v"), EDGES)
        ._jdf.queryExecution().executedPlan().toString()
    )
    for marker in ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas"):
        assert marker not in plan
