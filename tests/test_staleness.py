"""Semantics of grid-aligned staleness (operators/intervals.py
staleness): silent buckets counted, LOCF carries across them, NULL
before first sample, per-series isolation.  (Contract query
staleness_1h adds DuckDB hash-exactness.)"""

import datetime as dt

from mq_to_db_spark.operators.intervals import staleness


def _rows(spark, rows):
    return spark.createDataFrame(
        [(k, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m))
         for k, m in rows],
        "k string, ts timestamp",
    )


def test_staleness_carries_across_silent_buckets(spark):
    # a: samples at 00:10 and 03:30 → hours 1 and 2 are silent
    df = _rows(spark, [("a", 10), ("a", 210)])
    got = {r.bucket_start.hour: (r.n_samples, r.absent, r.staleness_us)
           for r in staleness(df, ["k"], tier="1h").collect()}
    m = 60_000_000
    assert got[0] == (1, False, 50 * m)    # end 01:00 − 00:10
    assert got[1] == (0, True, 110 * m)    # end 02:00 − 00:10
    assert got[2] == (0, True, 170 * m)
    assert got[3] == (1, False, 30 * m)    # fresh sample at 03:30


def test_staleness_null_before_first_sample_and_key_isolation(spark):
    # b starts at hour 2; a's extent forces the global grid from hour 0
    df = _rows(spark, [("a", 5), ("b", 125), ("a", 185)])
    got = {(r.k, r.bucket_start.hour): (r.absent, r.staleness_us)
           for r in staleness(df, ["k"], tier="1h").collect()}
    assert got[("b", 0)][0] is True and got[("b", 0)][1] is None
    assert got[("b", 1)][1] is None
    assert got[("b", 2)] == (False, 55 * 60_000_000)
    # a's LOCF never contaminates b and vice versa
    assert got[("a", 2)] == (True, 175 * 60_000_000)
