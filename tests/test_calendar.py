"""Timezone/calendar bucket semantics, including both DST boundaries,
verified against the DuckDB ICU replay (the same round-trip the
contract oracle runs)."""

from __future__ import annotations

from datetime import datetime

import duckdb
import pandas as pd
import pytest

from pyspark.sql import functions as F

from mq_to_db_spark.operators.calendar import bucket_local, rollup_calendar

NY = "America/New_York"


def _dst_pdf() -> pd.DataFrame:
    # UTC instants straddling BOTH 2024 US DST transitions:
    #  * spring forward: 2024-03-10 07:00 UTC (02:00 EST -> 03:00 EDT)
    #  * fall back:      2024-11-03 06:00 UTC (02:00 EDT -> 01:00 EST)
    ts = (
        list(pd.date_range("2024-03-09 00:30", "2024-03-11 23:30", freq="1h"))
        + list(pd.date_range("2024-11-02 00:30", "2024-11-04 23:30", freq="1h"))
    )
    return pd.DataFrame({"ts": ts, "v": range(len(ts))})


def _duck_replay(pdf: pd.DataFrame, unit: str, tz: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("t", pdf)
    return con.sql(
        f"""
        SELECT timezone('UTC', timezone('{tz}',
                   date_trunc('{unit}', timezone('{tz}', timezone('UTC', ts)))))
                   AS bucket_start,
               date_trunc('{unit}', timezone('{tz}', timezone('UTC', ts)))
                   AS local_start,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM t GROUP BY 1, 2 ORDER BY 1
        """
    ).df()


@pytest.mark.parametrize("unit", ["day", "week"])
def test_dst_boundaries_match_icu(spark, unit):
    pdf = _dst_pdf()
    df = spark.createDataFrame(pdf)
    got = (
        rollup_calendar(df, unit, NY)
        .orderBy("bucket_start")
        .toPandas()[["bucket_start", "local_start", "n_rows"]]
    )
    want = _duck_replay(pdf, unit, NY)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True), check_dtype=False
    )


def test_local_day_lengths_across_dst(spark):
    # the spring-forward local day is 23h, the fall-back local day 25h:
    # hourly UTC samples per local day must count 23 / 25 on those dates
    pdf = _dst_pdf()
    df = spark.createDataFrame(pdf)
    out = {
        r["local_start"]: r["n_rows"]
        for r in rollup_calendar(df, "day", NY).collect()
    }
    assert out[datetime(2024, 3, 10)] == 23
    assert out[datetime(2024, 11, 3)] == 25
    assert out[datetime(2024, 3, 9)] == 24  # control: a plain day


def test_fractional_offset_zone(spark):
    # Asia/Kathmandu (+05:45): local midnight is 18:15 UTC of the prior day
    df = spark.createDataFrame(
        pd.DataFrame({"ts": [pd.Timestamp("2024-01-15 18:14:59"),
                             pd.Timestamp("2024-01-15 18:15:00")]})
    )
    days = sorted(
        r[0]
        for r in df.select(
            bucket_local("day", "Asia/Kathmandu").alias("b")
        ).collect()
    )
    assert days[0] == datetime(2024, 1, 14, 18, 15)
    assert days[1] == datetime(2024, 1, 15, 18, 15)


def test_bad_unit_raises(spark):
    with pytest.raises(ValueError, match="unit"):
        bucket_local("fortnight", NY)


def test_plan_is_pure_projection(spark, transcripts):
    # one hash aggregate, no UDF crossing, no extra exchange
    plan = rollup_calendar(
        transcripts, "day", NY
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
    assert plan.count("Exchange") <= 2  # partial agg + final agg exchange
