"""Count-Min frequency sketch (operators/freq.py): exactness when wide,
overestimate-only guarantee when deliberately collision-crowded, exact
cascade mergeability 1h→1d, and the two-exchange no-UDF plan."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mq_to_db_spark.operators.freq import cascade_cms, cms_lookup, cms_rollup


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def stream(spark):
    # deterministic skewed item stream over 2 days, 40 distinct items
    rows = []
    base = pd.Timestamp("2024-05-01 00:00:00")
    v = 7
    for i in range(20_000):
        v = (v * 1103515245 + 12345) % (1 << 31)
        item = v % 40 if v % 5 else v % 4  # items 0-3 hot
        rows.append((f"item-{item:02d}", base + pd.Timedelta(seconds=i * 9)))
    pdf = pd.DataFrame(rows, columns=["item", "ts"])
    return spark.createDataFrame(pdf), pdf


def test_cms_exact_when_wide(spark, stream):
    df, pdf = stream
    cms = cms_rollup(df, "1d", "item")
    looked = cms.select(
        "bucket_start",
        "n",
        *[
            cms_lookup(F.col("cms"), F.lit(f"item-{i:02d}")).alias(f"e{i}")
            for i in range(40)
        ],
    )
    got = {r.bucket_start: r.asDict() for r in looked.collect()}
    want = pdf.groupby([pdf.ts.dt.floor("D"), "item"]).size()
    for (day, item), cnt in want.items():
        est = got[day.to_pydatetime()][f"e{int(item[5:])}"]
        # width 1024 >> 40 distinct: no collisions in practice → exact
        assert est == cnt, (day, item)
    for day, g in pdf.groupby(pdf.ts.dt.floor("D")):
        assert got[day.to_pydatetime()]["n"] == len(g)


def test_cms_overestimate_only_when_crowded(spark, stream):
    df, pdf = stream
    cms = cms_rollup(df, "1d", "item", depth=3, width=8)  # forced collisions
    looked = cms.select(
        "bucket_start",
        *[
            cms_lookup(F.col("cms"), F.lit(f"item-{i:02d}"), depth=3, width=8).alias(
                f"e{i}"
            )
            for i in range(40)
        ],
    ).collect()
    got = {r.bucket_start: r.asDict() for r in looked}
    exact = pdf.groupby([pdf.ts.dt.floor("D"), "item"]).size()
    overs = 0
    for (day, item), cnt in exact.items():
        est = got[day.to_pydatetime()][f"e{int(item[5:])}"]
        assert est >= cnt, (day, item, est, cnt)
        overs += est > cnt
    assert overs > 0  # collisions actually happened at width 8


def test_cms_cascade_equals_direct(spark, stream):
    df, _ = stream
    hourly = cms_rollup(df, "1h", "item")
    merged = cascade_cms(hourly, "1d")
    direct = cms_rollup(df, "1d", "item")
    m = {r.bucket_start: (r.n, dict(r.cms)) for r in merged.collect()}
    d = {r.bucket_start: (r.n, dict(r.cms)) for r in direct.collect()}
    assert m == d


def test_cms_plan_two_exchanges_no_udf(spark, stream):
    df, _ = stream
    plan = _plan(cms_rollup(df, "1d", "item"))
    assert plan.count("Exchange") <= 2, plan
    assert "PythonUDF" not in plan and "Window" not in plan, plan
