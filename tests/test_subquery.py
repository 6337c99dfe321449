"""PromQL subquery evaluation, irate, and HA replica dedup."""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd
import pytest


from mq_to_db_spark.operators.replicas import dedup_replicas, elect_replicas
from mq_to_db_spark.operators.subquery import irate, subquery_eval


def _series(spark, rows):
    pdf = pd.DataFrame(rows, columns=["k", "ts", "value"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    return spark.createDataFrame(pdf)


T0 = datetime(2025, 1, 1)


def _ts(minutes, seconds=0):
    return T0 + timedelta(minutes=minutes, seconds=seconds)


# ---------------------------------------------------------------------------
# subquery_eval
# ---------------------------------------------------------------------------


def test_subquery_max_sum(spark):
    # sum per 10m inner bucket, max of those per 30m outer window
    rows = [
        ("a", _ts(1), 1), ("a", _ts(2), 2),        # inner 00:00 → 3
        ("a", _ts(11), 10),                        # inner 00:10 → 10
        ("a", _ts(25), 4),                         # inner 00:20 → 4
        ("a", _ts(41), 7),                         # inner 00:40 → 7 (2nd outer)
    ]
    got = (
        subquery_eval(_series(spark, rows), ["k"], 600, 1800, "sum", "max")
        .orderBy("bucket_start")
        .collect()
    )
    assert [(r["bucket_start"], r["max_sum"], r["n_inner"]) for r in got] == [
        (T0, 10, 3),
        (_ts(30), 7, 1),
    ]


def test_subquery_rate_reset_aware(spark):
    # counter 0,10,4(reset),6 in one 10m inner bucket:
    # contributions: first=0, +10, reset→+4, +2 → increase 16, rate 16/600
    rows = [("a", _ts(0), 0), ("a", _ts(2), 10), ("a", _ts(4), 4), ("a", _ts(6), 6)]
    got = subquery_eval(
        _series(spark, rows), ["k"], 600, 3600, "rate", "max"
    ).collect()
    assert len(got) == 1
    assert got[0]["max_rate"] == pytest.approx(16 / 600)
    inc = subquery_eval(
        _series(spark, rows), ["k"], 600, 3600, "increase", "sum"
    ).collect()
    assert inc[0]["sum_increase"] == 16


def test_subquery_empty_inner_steps_emit_nothing(spark):
    # PromQL: subquery steps with no samples produce no inner point —
    # avg over the outer window divides by OBSERVED steps only
    rows = [("a", _ts(0), 6), ("a", _ts(25), 12)]  # inner 00:00 and 00:20; 00:10 empty
    got = subquery_eval(
        _series(spark, rows), ["k"], 600, 1800, "avg", "avg"
    ).collect()
    assert got[0]["n_inner"] == 2
    assert got[0]["avg_avg"] == pytest.approx(9.0)


def test_subquery_validation(spark):
    df = _series(spark, [("a", _ts(0), 1)])
    with pytest.raises(ValueError, match="multiple"):
        subquery_eval(df, ["k"], 700, 1800)
    with pytest.raises(ValueError, match="inner_fn"):
        subquery_eval(df, ["k"], 600, 1800, inner_fn="median")
    with pytest.raises(ValueError, match="outer_fn"):
        subquery_eval(df, ["k"], 600, 1800, outer_fn="p99")


def test_subquery_single_exchange_plan(spark):
    """Window + inner agg + outer agg must reuse ONE hash partitioning
    on the series keys — no second Exchange after the lag window."""
    df = _series(spark, [("a", _ts(0), 1), ("a", _ts(1), 2)])
    plan = subquery_eval(df, ["k"], 600, 1800, "rate", "max")._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan


# ---------------------------------------------------------------------------
# irate
# ---------------------------------------------------------------------------


def test_irate_last_two_samples(spark):
    # bucket 00:00-10:00 has samples at 1m,2m,9m → last two: (2m,5)→(9m,19):
    # irate = 14 / 420 s
    rows = [("a", _ts(1), 1), ("a", _ts(2), 5), ("a", _ts(9), 19)]
    got = irate(_series(spark, rows), ["k"], 600).collect()
    assert len(got) == 1
    assert got[0]["irate"] == pytest.approx(14 / 420)


def test_irate_reset_and_single_sample(spark):
    rows = [
        ("a", _ts(1), 100), ("a", _ts(6), 3),   # reset: contribution = 3 over 300s
        ("b", _ts(4), 42),                       # single sample → NULL
    ]
    got = {r["k"]: r["irate"] for r in irate(_series(spark, rows), ["k"], 600).collect()}
    assert got["a"] == pytest.approx(3 / 300)
    assert got["b"] is None


# ---------------------------------------------------------------------------
# dedup_replicas
# ---------------------------------------------------------------------------


def _replicated(spark):
    rows = []
    # hour 0: replica a has 3 samples, b has 2 → a wins
    for m, r in [(1, "a"), (2, "a"), (3, "a"), (4, "b"), (5, "b")]:
        rows.append(("s1", r, _ts(m), 1.0))
    # hour 1: a died → only b reports → b wins (failover)
    for m in (61, 62):
        rows.append(("s1", "b", _ts(m), 2.0))
    # hour 2: tie 2-2 → lexicographically smaller replica a wins
    for m, r in [(121, "a"), (122, "a"), (123, "b"), (124, "b")]:
        rows.append(("s1", r, _ts(m), 3.0))
    pdf = pd.DataFrame(rows, columns=["k", "replica", "ts", "v"])
    return spark.createDataFrame(pdf)


def test_elect_replicas(spark):
    got = {
        r["bucket_start"]: (r["replica"], r["n_samples"])
        for r in elect_replicas(_replicated(spark), ["k"]).collect()
    }
    assert got == {
        T0: ("a", 3),
        _ts(60): ("b", 2),
        _ts(120): ("a", 2),
    }


def test_dedup_replicas_rows(spark):
    out = dedup_replicas(_replicated(spark), ["k"]).toPandas()
    # 3 (a, hour0) + 2 (b, hour1) + 2 (a, hour2) survive
    assert len(out) == 7
    assert set(out.columns) == {"k", "replica", "ts", "v"}
    per_hour = out.groupby(out["ts"].dt.floor("h"))["replica"].agg(set)
    assert all(len(s) == 1 for s in per_hour)  # never two replicas in a window
    dropped = dedup_replicas(_replicated(spark), ["k"], keep_replica=False)
    assert "replica" not in dropped.columns


def test_dedup_replicas_idempotent(spark):
    once = dedup_replicas(_replicated(spark), ["k"])
    twice = dedup_replicas(once, ["k"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_dedup_replicas_replica_in_keys_rejected(spark):
    with pytest.raises(ValueError, match="series key"):
        dedup_replicas(_replicated(spark), ["k", "replica"])


def test_dedup_replicas_broadcast_plan(spark):
    """The winner set joins back BROADCAST — the sample table must not
    shuffle (no Exchange hashpartitioning feeding the join)."""
    plan = (
        dedup_replicas(_replicated(spark), ["k"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan
