"""Decayed scores vs an exact fractions-based replay."""

from __future__ import annotations

from datetime import datetime, timedelta
from fractions import Fraction

import numpy as np
import pytest
from pyspark.sql import functions as F

from mq_to_db_spark.operators.decay import decayed_scores, decayed_topk


@pytest.fixture(scope="module")
def events(spark):
    rng = np.random.default_rng(3)
    t0 = datetime(2024, 5, 1)
    rows = []
    for k in ("a", "b", "c"):
        for d in range(30):
            for _ in range(int(rng.integers(0, 5))):
                rows.append((k, t0 + timedelta(days=d, hours=3), int(rng.integers(1, 100))))
    return spark.createDataFrame(rows, "k string, ts timestamp, v long")


def _replay(pdf, halflife):
    last = max(r[1] for r in pdf).date()
    per = {}
    for k, ts, v in pdf:
        age = (last - ts.date()).days
        per.setdefault(k, {}).setdefault(ts.date(), 0)
        per[k][ts.date()] += v
    out = {}
    for k, days in per.items():
        s = Fraction(0)
        for d in sorted(days):
            kk = (last - d).days // halflife
            s += Fraction(days[d], 2**kk)
        out[k] = float(s)
    return out


def test_scores_match_exact_fraction_replay(spark, events):
    # every decay factor is a power of two and every partial sum fits a
    # double exactly here, so the Fraction replay must match bit-for-bit
    rows = [(r[0], r[1], r[2]) for r in events.collect()]
    want = _replay(rows, 7)
    got = {
        r["k"]: r["score"]
        for r in decayed_scores(events, ["k"], val_col=F.col("v")).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=0.0, rel=1e-12), k


def test_counts_default_and_halflife_one(spark, events):
    got = decayed_scores(
        events, ["k"], halflife_buckets=1
    ).collect()
    assert all(r["score"] > 0 for r in got)


def test_topk_rank_deterministic(spark, events):
    top = decayed_topk(events, ["k"], 2, val_col=F.col("v")).collect()
    assert [r["rank"] for r in top] == [1, 2]
    assert top[0]["score"] >= top[1]["score"]


def test_rejects_bad_halflife(spark, events):
    with pytest.raises(ValueError):
        decayed_scores(events, ["k"], halflife_buckets=0)


def test_plan_no_python(spark, events):
    plan = (
        decayed_scores(events, ["k"], val_col=F.col("v"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    for marker in ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas"):
        assert marker not in plan
    assert "BroadcastExchange" in plan  # the asof scalar broadcasts
