"""Semantics of the drift/episode detectors (operators/changepoint.py):
the window-expressed CUSUM must equal the literal Page recurrence, and
threshold_episodes must match a brute-force run scan — plus a
hypothesis property run over random integer series.  (The contract
queries cusum_alarms_1d / alert_episodes add DuckDB hash-exactness;
these pin the semantics.)"""

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st

from mq_to_db_spark.operators.changepoint import cusum, threshold_episodes


def _series(spark, rows):
    return spark.createDataFrame(
        [(k, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), int(v), i)
         for i, (k, s, v) in enumerate(rows)],
        "k string, ts timestamp, v long, rid long",
    )


def _ref_cusum(values, target, slack):
    """Literal Page (1954) recurrence."""
    hi = lo = 0
    out = []
    for v in values:
        hi = max(0, hi + (v - target - slack))
        lo = max(0, lo + (target - v - slack))
        out.append((hi, lo))
    return out


def test_cusum_matches_recurrence(spark):
    vals = [10, 12, 30, 31, 33, 5, 4, 40, 41, 42, 43, 2]
    df = _series(spark, [("a", i, v) for i, v in enumerate(vals)])
    got = (
        cusum(df, ["k"], value_col="v", target=10, slack=2, h=50,
              tiebreak=("rid",))
        .orderBy("ts")
        .select("cusum_hi", "cusum_lo", "alarm")
        .collect()
    )
    ref = _ref_cusum(vals, 10, 2)
    assert [(r.cusum_hi, r.cusum_lo) for r in got] == ref
    assert [r.alarm for r in got] == [h > 50 or l > 50 for h, l in ref]


def test_cusum_partitions_independent(spark):
    df = _series(spark, [("a", 0, 100), ("b", 0, 0), ("a", 1, 100), ("b", 1, 0)])
    got = {
        (r.k, r.rid): (r.cusum_hi, r.cusum_lo)
        for r in cusum(df, ["k"], value_col="v", target=10, slack=0,
                       tiebreak=("rid",)).collect()
    }
    # series b never drifts high; series a never drifts low
    assert got[("a", 0)] == (90, 0) and got[("a", 2)] == (180, 0)
    assert got[("b", 1)] == (0, 10) and got[("b", 3)] == (0, 20)


@settings(max_examples=15, deadline=None)
@given(st.lists(st.integers(min_value=-1000, max_value=1000),
                min_size=1, max_size=40))
def test_cusum_property_random_series(spark, vals):
    df = _series(spark, [("a", i, v) for i, v in enumerate(vals)])
    got = (
        cusum(df, ["k"], value_col="v", target=7, slack=3, tiebreak=("rid",))
        .orderBy("ts").select("cusum_hi", "cusum_lo").collect()
    )
    assert [(r.cusum_hi, r.cusum_lo) for r in got] == _ref_cusum(vals, 7, 3)


def _ref_episodes(rows, threshold, min_dur_s):
    """Brute-force scan: rows = [(sec, v)] sorted; returns
    (start_s, end_s, n, peak) per qualifying run."""
    out, run = [], []
    for s, v in rows + [(None, threshold)]:  # sentinel closes last run
        if v > threshold:
            run.append((s, v))
        elif run:
            if run[-1][0] - run[0][0] >= min_dur_s:
                out.append((run[0][0], run[-1][0], len(run),
                            max(v for _, v in run)))
            run = []
    return out


def test_threshold_episodes_matches_bruteforce(spark):
    rows = [(0, 5), (60, 20), (120, 25), (200, 30), (260, 4),
            (300, 50), (400, 6), (500, 9), (560, 11), (620, 12)]
    df = _series(spark, [("a", s, v) for s, v in rows])
    got = sorted(
        (r.start_ts.second + 60 * r.start_ts.minute,
         r.end_ts.second + 60 * r.end_ts.minute,
         r.n_samples, r.peak, r.duration_us)
        for r in threshold_episodes(
            df, ["k"], value_col="v", threshold=9,
            min_duration_us=60_000_000, tiebreak=("rid",)
        ).collect()
    )
    ref = _ref_episodes(rows, 9, 60)
    assert got == [(a, b, n, p, (b - a) * 1_000_000) for a, b, n, p in ref]
    # the single-sample run at s=300 (duration 0) must be dropped


def test_threshold_episodes_zero_min_duration_keeps_singletons(spark):
    df = _series(spark, [("a", 0, 10), ("a", 60, 1), ("a", 120, 10)])
    eps = threshold_episodes(df, ["k"], value_col="v", threshold=5,
                             min_duration_us=0, tiebreak=("rid",)).collect()
    assert sorted((e.n_samples, e.duration_us) for e in eps) == [(1, 0), (1, 0)]
