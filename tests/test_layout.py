"""Z-order keys vs a pure-Python Morton replay."""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from mq_to_db_spark.operators.layout import (
    cluster_by_zorder,
    interleave_bits,
    zorder_keys,
)


def _md5_low(s: str, bits: int) -> int:
    return (int(hashlib.md5(s.encode()).hexdigest()[:15], 16)) & ((1 << bits) - 1)


def _morton(vals: list[int], bits: int) -> int:
    out = 0
    for i, v in enumerate(vals):
        for b in range(bits):
            out |= ((v >> b) & 1) << (b * len(vals) + i)
    return out


@pytest.fixture(scope="module")
def frame(spark):
    t0 = datetime(2024, 2, 1)
    rows = [
        (f"c{i % 7}", t0 + timedelta(minutes=17 * i), i) for i in range(200)
    ]
    return spark.createDataFrame(rows, "conv_id string, ts timestamp, i int")


def test_zkey_matches_python_morton(spark, frame):
    bits = 16
    got = {r["i"]: r["zkey"] for r in zorder_keys(frame, ["conv_id"], bits=bits).collect()}
    rows = frame.collect()
    lo = min(r["ts"] for r in rows)
    hi = max(r["ts"] for r in rows)
    span = int((hi - lo).total_seconds() * 1_000_000)
    for r in rows:
        h = _md5_low(r["conv_id"], bits)
        num = int((r["ts"] - lo).total_seconds() * 1_000_000) * ((1 << bits) - 1)
        t = num // span
        assert got[r["i"]] == _morton([h, t], bits), r["i"]


def test_max_ts_boundary_is_full_lane(spark, frame):
    # the x = max row must land exactly at 2^bits - 1 in the time lane
    # (the case a double floor() can misrank)
    bits = 16
    out = zorder_keys(frame, ["conv_id"], bits=bits)
    last = out.orderBy(F.desc("ts")).first()
    t_lane = 0
    z = last["zkey"]
    for b in range(bits):
        t_lane |= ((z >> (b * 2 + 1)) & 1) << b
    assert t_lane == (1 << bits) - 1


def test_time_lane_monotone_within_conv(spark, frame):
    bits = 8
    out = zorder_keys(frame.where(F.col("conv_id") == "c0"), [], bits=bits)
    rows = out.orderBy("ts").collect()
    lanes = [r["zkey"] for r in rows]  # single lane: zkey IS the time lane
    assert lanes == sorted(lanes)
    assert lanes[-1] == (1 << bits) - 1 and lanes[0] == 0


def test_interleave_rejects_wide(spark):
    with pytest.raises(ValueError):
        interleave_bits([F.lit(1), F.lit(2), F.lit(3), F.lit(4)], bits=16)


def test_cluster_conserves_rows_and_orders_ranges(spark, frame):
    out = cluster_by_zorder(frame, ["conv_id"], n_files=4)
    assert out.count() == 200
    parts = out.withColumn("p", F.spark_partition_id())
    agg = parts.groupBy("p").agg(F.min("zkey").alias("lo"), F.max("zkey").alias("hi")).orderBy("p").collect()
    # range partitioning: partition zkey ranges are disjoint and ordered
    for a, b in zip(agg, agg[1:]):
        assert a["hi"] <= b["lo"]


def test_plan_no_python(spark, frame):
    plan = (
        zorder_keys(frame, ["conv_id"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    for marker in ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas"):
        assert marker not in plan
    assert "BroadcastExchange" in plan  # extent scalar broadcasts
