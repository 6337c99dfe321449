"""Semantics of sliding quotas and drawdown (operators/quota.py):
time-based (not row-based) trailing counts with exact boundary
behavior, and prefix-max drawdown on hand-computable fixtures.
(Contract queries quota_violations_1d / max_drawdown_1d add DuckDB
hash-exactness.)"""

import datetime as dt

from mq_to_db_spark.operators.quota import max_drawdown, sliding_quota


def _rows(spark, rows):
    return spark.createDataFrame(
        [(k, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), int(v), i)
         for i, (k, s, v) in enumerate(rows)],
        "k string, ts timestamp, v long, rid long",
    )


def test_sliding_quota_counts_by_time_not_rows(spark):
    # window 60s, samples at 0, 10, 59, 60, 121
    df = _rows(spark, [("a", 0, 0), ("a", 10, 0), ("a", 59, 0),
                       ("a", 60, 0), ("a", 121, 0)])
    got = {r.ts.second + 60 * r.ts.minute: r.win_count
           for r in sliding_quota(df, ["k"], window_us=60_000_000,
                                  limit=3).collect()}
    # at t=59: {0,10,59} → 3; at t=60: (0,60] → {10,59,60} → 3
    #   (the sample at exactly window-length ago falls OUT — frame is
    #    (ts − W, ts], the "no more than N per W" contract)
    # at t=121: (61,121] → {121} → 1
    assert got == {0: 1, 10: 2, 59: 3, 60: 3, 121: 1}


def test_sliding_quota_violation_flag_and_key_isolation(spark):
    df = _rows(spark, [("a", 0, 0), ("a", 1, 0), ("a", 2, 0),
                       ("b", 2, 0)])
    out = sliding_quota(df, ["k"], window_us=10_000_000, limit=2).collect()
    got = {(r.k, r.ts.second): (r.win_count, r.violation) for r in out}
    assert got[("a", 2)] == (3, True)
    assert got[("b", 2)] == (1, False)  # other series never leaks in


def test_max_drawdown_basic_and_monotone_zero(spark):
    # peak 10 then fall to 3 → dd 7; later rally to 8 (dd 2)
    df = _rows(spark, [("a", 0, 5), ("a", 1, 10), ("a", 2, 3),
                       ("a", 3, 8)])
    [r] = max_drawdown(df, ["k"], value_col="v", tier="1d",
                       tiebreak=("rid",)).collect()
    assert (r.max_drawdown, r.peak, r.n_samples) == (7, 10, 4)
    # monotone non-decreasing → drawdown exactly 0
    dfm = _rows(spark, [("a", 0, 1), ("a", 1, 1), ("a", 2, 9)])
    [rm] = max_drawdown(dfm, ["k"], value_col="v", tier="1d",
                        tiebreak=("rid",)).collect()
    assert rm.max_drawdown == 0


def test_max_drawdown_resets_per_bucket(spark):
    # hour 0: peak 100 → 1 (dd 99); hour 1 starts fresh: 50 → 49 (dd 1)
    df = _rows(spark, [("a", 0, 100), ("a", 1, 1),
                       ("a", 3600, 50), ("a", 3601, 49)])
    got = {r.bucket_start.hour: r.max_drawdown
           for r in max_drawdown(df, ["k"], value_col="v", tier="1h",
                                 tiebreak=("rid",)).collect()}
    assert got == {0: 99, 1: 1}


# -- GCRA / token bucket ------------------------------------------------------


def _gcra_ref(ts_us: list[int], period_us: int, burst: int) -> list[int]:
    """Textbook virtual-scheduling recurrence (every arrival consumes —
    the audit/offered-load mode gcra_throttle implements)."""
    tau = (burst - 1) * period_us
    tat = None
    delays = []
    for t in ts_us:
        if tat is None:
            delays.append(0)
        else:
            delays.append(max(0, tat - tau - t))
        tat = (t if tat is None else max(t, tat)) + period_us
    return delays


def _gcra_run(spark, rows, period_us, burst):
    from mq_to_db_spark.operators.quota import gcra_throttle

    df = _rows(spark, [(k, s, 0) for k, s in rows])
    out = gcra_throttle(
        df, ["k"], period_us=period_us, burst=burst, tiebreak=("rid",)
    )
    return [
        (r.k, r.delay_us, r.throttled)
        for r in out.orderBy("k", "ts", "rid").collect()
    ]


def test_gcra_matches_textbook_recurrence(spark):
    # 1 req/s sustained, burst 3; arrivals: burst of 5 at t=0..0.1s,
    # then spaced recovery
    secs = [0, 0.025, 0.05, 0.075, 0.1, 5, 5.5, 6, 20]
    rows = [("a", s) for s in secs]
    got = _gcra_run(spark, rows, period_us=1_000_000, burst=3)
    us = [int(s * 1e6) + 1704067200000000 for s in secs]  # epoch of 2024-01-01
    want = _gcra_ref(us, 1_000_000, 3)
    assert [d for _, d, _ in got] == want
    # burst depth 3 -> first three conform, 4th and 5th throttle
    assert [t for _, _, t in got][:5] == [False, False, False, True, True]


def test_gcra_first_event_and_key_isolation(spark):
    rows = [("a", 0), ("a", 0.1), ("b", 0), ("b", 0.1)]
    got = _gcra_run(spark, rows, period_us=1_000_000, burst=1)
    by_key = {}
    for k, d, t in got:
        by_key.setdefault(k, []).append((d, t))
    # each key's first event conforms; second (100ms after, 1/s rate,
    # no burst) owes 900ms
    for k in ("a", "b"):
        assert by_key[k][0] == (0, False)
        assert by_key[k][1] == (900_000, True)


def test_gcra_conforming_stream_never_throttles(spark):
    rows = [("a", i * 2.0) for i in range(20)]  # 1 per 2s at 1/s limit
    got = _gcra_run(spark, rows, period_us=1_000_000, burst=1)
    assert all(d == 0 and not t for _, d, t in got)


def test_gcra_property_random_streams(spark):
    """Hypothesis: the closed-form prefix-max audit equals the textbook
    recurrence on random arrival streams, periods and burst depths —
    exactly, in integer microseconds."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=12, deadline=None)
    @given(
        gaps=st.lists(
            st.integers(min_value=0, max_value=5_000_000),
            min_size=1,
            max_size=25,
        ),
        period_ms=st.integers(min_value=1, max_value=3000),
        burst=st.integers(min_value=1, max_value=5),
    )
    def check(gaps, period_ms, burst):
        period_us = period_ms * 1000
        secs, t = [], 0
        for g in gaps:
            t += g
            secs.append(t / 1e6)
        got = _gcra_run(
            spark, [("a", s) for s in secs], period_us=period_us, burst=burst
        )
        base = 1704067200000000  # epoch µs of 2024-01-01 (fixture origin)
        want = _gcra_ref(
            [base + int(round(s * 1e6)) for s in secs], period_us, burst
        )
        assert [d for _, d, _ in got] == want

    check()
