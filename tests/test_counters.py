"""Reset-aware counter increase / rate (operators/counters.py):
Prometheus reset semantics vs a hand-computed replay, keyed/keyless
parity (range-partitioned lag + boundary carry), duplicate-timestamp
determinism via tiebreak, and the one-exchange keyed plan."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from mq_to_db_spark.operators.counters import counter_increase, counter_rate


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# (series, minute_offset, sid, value) — resets mid-stream, one duplicate
# timestamp in series a (minute 80, sids 4/5) to exercise the tiebreak.
_ROWS = [
    ("a", 0, 0, 0),
    ("a", 20, 1, 10),
    ("a", 40, 2, 25),
    ("a", 60, 3, 3),   # reset (3 < 25): contributes 3
    ("a", 80, 4, 9),
    ("a", 80, 5, 9),
    ("a", 120, 6, 120),
    ("a", 140, 7, 1),  # reset: contributes 1
    ("b", 0, 0, 5),
    ("b", 20, 1, 5),
    ("b", 40, 2, 7),
    ("b", 60, 3, 100),
    ("b", 80, 4, 0),   # reset to zero: contributes 0
    ("b", 100, 5, 50),
]

# per (series, hour-bucket) expected increase / n_samples
_EXPECT = {
    ("a", 0): (25, 3),   # 0 + 10 + 15
    ("a", 1): (9, 3),    # 3 (reset) + 6 + 0
    ("a", 2): (112, 2),  # 111 + 1 (reset)
    ("b", 0): (2, 3),    # 0 + 0 + 2
    ("b", 1): (143, 3),  # 93 + 0 (reset) + 50
}


def _fixture(spark):
    base = pd.Timestamp("2024-01-01 00:00:00")
    pdf = pd.DataFrame(
        [(s, base + pd.Timedelta(minutes=m), i, v) for s, m, i, v in _ROWS],
        columns=["series", "ts", "sid", "value"],
    )
    return spark.createDataFrame(pdf).withColumn(
        "value", F.col("value").cast("long")
    )


def test_counter_increase_keyed(spark):
    out = counter_increase(
        _fixture(spark), ["series"], tier="1h", tiebreak=("sid",)
    ).collect()
    got = {
        (r.series, r.bucket_start.hour): (r.increase, r.n_samples) for r in out
    }
    assert got == _EXPECT
    rates = {
        (r.series, r.bucket_start.hour): r.rate_per_sec for r in out
    }
    for k, (inc, _) in _EXPECT.items():
        assert rates[k] == round(inc / 3600, 6), k


def test_counter_rate_view(spark):
    out = counter_rate(_fixture(spark), ["series"], tier="1h", tiebreak=("sid",))
    assert set(out.columns) == {"series", "bucket_start", "rate_per_sec"}
    assert out.count() == len(_EXPECT)


def test_keyless_matches_keyed_single_series(spark):
    """The range-partitioned keyless lag (per-bucket window + broadcast
    boundary carry) must equal the naive global-window semantics."""
    a = _fixture(spark).filter(F.col("series") == "a").drop("series")
    keyless = counter_increase(
        a, [], tier="1h", tiebreak=("sid",), n_buckets=4
    ).collect()
    got = {(r.bucket_start.hour): (r.increase, r.n_samples) for r in keyless}
    want = {h: v for (s, h), v in _EXPECT.items() if s == "a"}
    assert got == want


def test_keyless_single_sample_and_empty_extent(spark):
    one = spark.createDataFrame(
        [(pd.Timestamp("2024-01-01 00:30:00").to_pydatetime(), 7)],
        "ts timestamp, value long",
    )
    out = counter_increase(one, [], tier="1h").collect()
    assert len(out) == 1 and out[0].increase == 0 and out[0].n_samples == 1


def test_keyed_plan_single_exchange(spark):
    """lag window hash-partitions on the keys and the (keys, bucket) agg
    reuses that partitioning: exactly ONE exchange end to end."""
    out = counter_increase(_fixture(spark), ["series"], tier="1h", tiebreak=("sid",))
    plan = _plan(out)
    assert plan.count("Exchange") == 1, plan


def test_keyless_plan_range_partitioned(spark):
    """The full-data window must partition by the range bucket (_rb),
    never run as one global single-partition window over the samples."""
    a = _fixture(spark).filter(F.col("series") == "a").drop("series")
    out = counter_increase(a, [], tier="1h", tiebreak=("sid",), n_buckets=8)
    plan = _plan(out)
    assert "windowspecdefinition(_rb" in plan, plan


def test_keyless_handles_ntz_timestamps(spark, tmp_path):
    """Parquet timestamps read back as TIMESTAMP_NTZ, which cannot cast
    straight to double — the range extent must go through the epoch cast
    (regression: the keyless path crashed on any parquet source)."""
    path = str(tmp_path / "ntz")
    _fixture(spark).filter(F.col("series") == "a").drop("series").write.parquet(path)
    back = spark.read.parquet(path)
    assert dict(back.dtypes)["ts"].startswith("timestamp")
    out = counter_increase(back, [], tier="1h", tiebreak=("sid",), n_buckets=4)
    got = {(r.bucket_start.hour): (r.increase, r.n_samples) for r in out.collect()}
    assert got == {h: v for (s, h), v in _EXPECT.items() if s == "a"}
