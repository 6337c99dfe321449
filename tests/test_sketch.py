"""DDSketch quantile rollups (operators/sketch.py): the relative-error
guarantee against exact quantiles, exact cascade mergeability (1h → 1d
equals direct 1d), zero/negative handling, and the no-UDF/no-window
plan."""

from __future__ import annotations

import math
import random

import pandas as pd
from pyspark.sql import functions as F

from mq_to_db_spark.operators.sketch import (
    cascade_quantile_sketch,
    quantile_sketch_rollup,
    sketch_index,
    sketch_quantile,
)

ALPHA = 0.05


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _fixture(spark, n_per_hour=200, hours=30, seed=7):
    rng = random.Random(seed)
    base = pd.Timestamp("2024-05-01 00:00:00")
    rows = []
    for h in range(hours):
        for i in range(n_per_hour):
            # log-uniform positive values spanning 5 decades + some zeros
            v = 0.0 if i % 50 == 0 else 10 ** rng.uniform(-2, 3)
            rows.append(
                ("k1" if i % 3 else "k2", base + pd.Timedelta(hours=h, seconds=i), v)
            )
    pdf = pd.DataFrame(rows, columns=["series", "ts", "value"])
    return spark.createDataFrame(pdf), pdf


def test_quantile_relative_error_guarantee(spark):
    """DDSketch guarantee: for q-quantile x_q > 0, |est - x_q| ≤ alpha·x_q
    (up to the rank-definition half-step, covered by comparing against
    the two neighbouring order statistics)."""
    df, pdf = _fixture(spark)
    sk = quantile_sketch_rollup(df, "1h", ["series"], alpha=ALPHA)
    out = sketch_quantile(
        sketch_quantile(sk, 0.5, ALPHA), 0.95, ALPHA
    ).collect()
    assert len(out) == 60  # 2 series × 30 hours
    checked = 0
    for r in out:
        g = pdf[
            (pdf.series == r.series) & (pdf.ts.dt.floor("h") == r.bucket_start)
        ].value.sort_values(ignore_index=True)
        n = len(g)
        for q, est in ((0.5, r.q50), (0.95, r.q95)):
            rank = math.floor(q * (n - 1))
            true = g.iloc[rank]
            if true == 0:
                assert est == 0.0
            else:
                assert abs(est - true) <= ALPHA * true * 1.0001, (
                    r.series, r.bucket_start, q, est, true
                )
            checked += 1
    assert checked == 120


def test_cascade_merge_is_exact(spark):
    """Merging 1h sketches to 1d equals sketching the raw data at 1d —
    bucket-wise count addition loses nothing (the C8 invariant exact
    quantiles cannot satisfy)."""
    df, _ = _fixture(spark)
    hourly = quantile_sketch_rollup(df, "1h", ["series"], alpha=ALPHA)
    merged = cascade_quantile_sketch(hourly, "1d", ["series"])
    direct = quantile_sketch_rollup(df, "1d", ["series"], alpha=ALPHA)

    def norm(sk):
        return {
            (r.series, r.bucket_start): (
                r.zero_count,
                r.n,
                tuple(sorted(r.sketch.items())),
            )
            for r in sk.collect()
        }

    assert norm(merged) == norm(direct)
    # and the extracted quantiles agree exactly
    mq = sketch_quantile(merged, 0.9, ALPHA).collect()
    dq = {(r.series, r.bucket_start): r.q90 for r in sketch_quantile(direct, 0.9, ALPHA).collect()}
    for r in mq:
        assert r.q90 == dq[(r.series, r.bucket_start)]


def test_zero_and_negative_values(spark):
    df = spark.createDataFrame(
        [("a", pd.Timestamp("2024-01-01 00:00:05").to_pydatetime(), v)
         for v in [0.0, 0.0, 0.0, -1.5, 2.0]],
        "series string, ts timestamp, value double",
    )
    sk = quantile_sketch_rollup(df, "1h", ["series"], alpha=ALPHA)
    row = sk.collect()[0]
    assert row.zero_count == 4 and row.n == 5  # ≤0 all in the zero bucket
    assert len(row.sketch) == 1
    out = sketch_quantile(sketch_quantile(sk, 0.5, ALPHA), 1.0, ALPHA).collect()[0]
    assert out.q50 == 0.0
    g = (1 + ALPHA) / (1 - ALPHA)
    idx = math.ceil(math.log(2.0) / math.log(g))
    assert out.q100 == round(2 * g**idx / (g + 1), 6)


def test_sketch_index_matches_reference_formula(spark):
    g = (1 + ALPHA) / (1 - ALPHA)
    vals = [0.001, 0.5, 1.0, 2.5, 100.0, 99999.0]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = [r.i for r in df.select(sketch_index(F.col("v"), ALPHA).alias("i")).collect()]
    assert got == [math.ceil(math.log(v) / math.log(g)) for v in vals]
    # estimate midpoint is within the guarantee of every value in its bucket
    for v in vals:
        idx = math.ceil(math.log(v) / math.log(g))
        est = 2 * g**idx / (g + 1)
        assert abs(est - v) <= ALPHA * v * 1.0001


def test_sketch_plan_no_udf_no_window(spark):
    df, _ = _fixture(spark)
    out = sketch_quantile(
        quantile_sketch_rollup(df, "1h", ["series"], alpha=ALPHA), 0.5, ALPHA
    )
    plan = _plan(out)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Window" not in plan, plan
    assert plan.count("Exchange") == 2, plan  # (k,b,idx) agg + (k,b) agg


def test_partial_merge_associativity(spark):
    """Streaming-append semantics: sketches built from ARBITRARY row
    splits of the same window (micro-batches) merge via
    cascade_quantile_sketch(to_tier=same tier) into exactly the sketch
    of the union — the property that lets sketch partials flow through
    the append-mode pipeline like count/sum."""
    df, _ = _fixture(spark, n_per_hour=120, hours=6)
    # split by an arbitrary non-temporal predicate (simulates batches)
    h = F.abs(F.xxhash64("series", "ts", "value"))
    part1, part2 = df.filter(h % 3 == 0), df.filter(h % 3 != 0)
    sk1 = quantile_sketch_rollup(part1, "1h", ["series"], alpha=ALPHA)
    sk2 = quantile_sketch_rollup(part2, "1h", ["series"], alpha=ALPHA)
    merged = cascade_quantile_sketch(sk1.unionByName(sk2), "1h", ["series"])
    direct = quantile_sketch_rollup(df, "1h", ["series"], alpha=ALPHA)

    def norm(sk):
        return {
            (r.series, r.bucket_start): (
                r.zero_count, r.n, tuple(sorted(r.sketch.items()))
            )
            for r in sk.collect()
        }

    assert norm(merged) == norm(direct)


def test_sketch_guarantee_hypothesis():
    """Pure-math property (no Spark): for random value sets and alphas,
    the bucket-midpoint estimate of every rank is within ±alpha of the
    true order statistic."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.floats(min_value=1e-6, max_value=1e9, allow_nan=False),
            min_size=1,
            max_size=50,
        ),
        st.floats(min_value=0.005, max_value=0.3),
        st.floats(min_value=0.0, max_value=1.0),
    )
    def check(values, alpha, q):
        g = (1 + alpha) / (1 - alpha)
        counts = {}
        for v in values:
            idx = math.ceil(math.log(v) / math.log(g))
            counts[idx] = counts.get(idx, 0) + 1
        n = len(values)
        r = math.floor(q * (n - 1))
        cum, found = 0, None
        for idx in sorted(counts):
            cum += counts[idx]
            if cum > r:
                found = idx
                break
        est = 2 * g**found / (g + 1)
        true = sorted(values)[r]
        assert abs(est - true) <= alpha * true * (1 + 1e-9), (est, true, alpha)

    check()
