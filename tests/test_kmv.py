"""KMV distinct sketch (operators/sketch.py): exactness under k,
estimator accuracy over k, the bottom-k(union) merge invariant, and the
two-exchange window-trimmed plan."""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import functions as F

from mq_to_db_spark.operators.sketch import kmv_estimate, kmv_merge, kmv_sketch


def _fixture(spark, n_users: int = 500):
    # two event types × 3 hours; 'a' sees many distinct users, 'b' few
    rows = []
    base = pd.Timestamp("2024-05-01 00:00:00")
    for i in range(n_users):
        rows.append(("a", base + pd.Timedelta(minutes=i % 180), f"u{i}"))
    for i in range(40):
        rows.append(("b", base + pd.Timedelta(minutes=(7 * i) % 180), f"u{i % 12}"))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["etype", "ts", "user"])
    )


def test_exact_when_under_k(spark):
    df = _fixture(spark)
    got = {
        (r.etype, r.bucket_start): r.est_distinct
        for r in kmv_estimate(
            kmv_sketch(df, ["etype"], "user", tier="1h", k=64), k=64
        )
        .where(F.col("etype") == "b")
        .collect()
    }
    want = {
        (r.etype, r.bucket_start): float(r.nd)
        for r in df.where(F.col("etype") == "b")
        .groupBy("etype", F.date_trunc("hour", "ts").alias("bucket_start"))
        .agg(F.count_distinct("user").alias("nd"))
        .collect()
    }
    assert got == want  # < k distinct -> the sketch IS the exact count


def test_estimator_within_theory_bound(spark):
    df = _fixture(spark, n_users=2000)
    k = 64
    est = kmv_estimate(
        kmv_sketch(df, ["etype"], "user", tier="1d", k=k), k=k
    ).where(F.col("etype") == "a").first()
    true = 2000
    # KMV standard error ~ 1/sqrt(k-2); allow 4 sigma
    assert abs(est.est_distinct - true) / true < 4.0 / math.sqrt(k - 2)
    assert est.n_hashes == k and est.kth_hash is not None


def test_merge_equals_direct(spark):
    """bottom-k(union) == bottom-k(union of bottom-ks): the 1h→1d
    cascade is bit-identical to building the 1d sketch from raw."""
    df = _fixture(spark, n_users=800)
    k = 32
    hourly = kmv_sketch(df, ["etype"], "user", tier="1h", k=k)
    cascaded = kmv_merge(
        hourly, ["etype"], F.date_trunc("day", "bucket_start"), k=k
    )
    direct = kmv_sketch(df, ["etype"], "user", tier="1d", k=k)
    got = {(r.etype, r.bucket_start): r.kmv for r in cascaded.collect()}
    want = {(r.etype, r.bucket_start): r.kmv for r in direct.collect()}
    assert got == want


def test_null_values_excluded(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "etype": ["a"] * 4,
                "ts": [pd.Timestamp("2024-05-01 00:00:00")] * 4,
                "user": ["x", None, "y", None],
            }
        )
    )
    est = kmv_estimate(kmv_sketch(df, ["etype"], "user", k=8), k=8).first()
    assert est.n_hashes == 2 and est.est_distinct == 2.0


def test_plan_two_exchanges_no_full_collect(spark):
    df = _fixture(spark)
    plan = (
        kmv_sketch(df, ["etype"], "user", tier="1h", k=64)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # dedup agg + window sort: the assembly groupBy must reuse the
    # window's exchange, and the bottom-k trim must be a Window (sort
    # based, spillable), not a collect-everything-then-slice agg
    assert plan.count("Exchange") == 2, plan
    assert "Window" in plan, plan
    assert "PythonUDF" not in plan, plan
