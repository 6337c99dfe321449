"""Welch t vs scipy-free numpy replay."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mq_to_db_spark.operators.abtest import welch_t


@pytest.fixture(scope="module")
def ab(spark):
    rng = np.random.default_rng(5)
    rows = []
    for d in range(5):
        for _ in range(40):
            rows.append((d, "a", int(rng.integers(90, 140))))
        for _ in range(30):
            rows.append((d, "b", int(rng.integers(80, 120))))
        rows.append((d, "noise", 999))
    return spark.createDataFrame(rows, "day int, grp string, v long")


def test_matches_numpy_welch(spark, ab):
    got = {
        r["day"]: r
        for r in welch_t(ab, ["day"], "grp", "a", "b", "v").collect()
    }
    pdf = ab.toPandas()
    for d, sub in pdf.groupby("day"):
        xa = sub[sub.grp == "a"]["v"].to_numpy(dtype=np.float64)
        xb = sub[sub.grp == "b"]["v"].to_numpy(dtype=np.float64)
        na, nb = len(xa), len(xb)
        ma, mb = xa.sum() / na, xb.sum() / nb
        va = (np.sum(xa * xa) - xa.sum() * ma) / (na - 1)
        vb = (np.sum(xb * xb) - xb.sum() * mb) / (nb - 1)
        se2 = va / na + vb / nb
        t = (ma - mb) / np.sqrt(se2)
        dof = se2**2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
        r = got[d]
        assert r["n_a"] == na and r["n_b"] == nb
        assert r["t_stat"] == pytest.approx(t, rel=1e-12)
        assert r["dof"] == pytest.approx(dof, rel=1e-12)
        # sanity: A drawn higher than B -> positive t, plausible dof
        assert r["t_stat"] > 0 and min(na, nb) - 1 <= r["dof"] <= na + nb - 2


def test_degenerate_groups_null(spark):
    df = spark.createDataFrame(
        [(0, "a", 5), (0, "b", 7), (0, "b", 9), (1, "a", 3), (1, "a", 3), (1, "b", 3), (1, "b", 3)],
        "day int, grp string, v long",
    )
    out = {r["day"]: r for r in welch_t(df, ["day"], "grp", "a", "b", "v").collect()}
    assert out[0]["t_stat"] is None  # n_a == 1
    assert out[1]["t_stat"] is None  # both variances zero
    assert out[1]["mean_a"] == 3.0 and out[1]["mean_b"] == 3.0


def test_single_shuffle_no_python(spark, ab):
    plan = (
        welch_t(ab, ["day"], "grp", "a", "b", "v")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") <= 2  # partial + final of one hash agg
    for marker in ("BatchEvalPython", "ArrowEvalPython"):
        assert marker not in plan
