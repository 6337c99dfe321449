"""Semantics of lexical diversity (functions/text.py lexical_stats) and
lag-k autocorrelation (operators/correlate.py autocorr) on
hand-computable fixtures.  (Contract queries lexical_stats /
autocorr_1d add DuckDB hash-exactness.)"""

import datetime as dt

from mq_to_db_spark.functions.text import lexical_stats
from mq_to_db_spark.operators.correlate import autocorr


def test_lexical_stats_counts_and_ratios(spark):
    df = spark.createDataFrame(
        [(1, "the cat The CAT sat"),   # tokens: the,cat,the,cat,sat
         (2, "a  b\tc\nd"),            # whitespace variety, all hapax
         (3, "   "),                   # no tokens → no row
         (4, "x")],
        "doc_id int, text string",
    )
    got = {r.doc_id: r for r in lexical_stats(df).collect()}
    assert set(got) == {1, 2, 4}
    r1 = got[1]
    assert (r1.n_tokens, r1.n_types, r1.n_hapax) == (5, 3, 1)
    assert r1.ttr == 0.6 and r1.hapax_ratio == round(1 / 3, 6)
    assert r1.top_token_ratio == 0.4  # 'the' (or 'cat') appears 2/5
    r2 = got[2]
    assert (r2.n_tokens, r2.n_types, r2.n_hapax) == (4, 4, 4)
    assert r2.ttr == 1.0 and r2.hapax_ratio == 1.0 and r2.top_token_ratio == 0.25
    assert (got[4].n_tokens, got[4].ttr) == (1, 1.0)


def _hourly(spark, day_vals):
    """day_vals: {day: [v per hour 0..n]} → (bucket_start, v) rows."""
    rows = []
    for day, vals in day_vals.items():
        for h, v in enumerate(vals):
            rows.append((dt.datetime(2024, 1, day, h), int(v)))
    return spark.createDataFrame(rows, "bucket_start timestamp, v long")


def test_autocorr_perfect_and_anti(spark):
    # day 1: strictly increasing → lag-1 pairs perfectly correlated (+1)
    # day 2: alternating high/low → lag-1 anticorrelated (-1)
    df = _hourly(spark, {1: [1, 2, 3, 4, 5, 6],
                         2: [10, 0, 10, 0, 10, 0]})
    got = {r.group_start.day: (r.n_pairs, round(r.autocorr, 6))
           for r in autocorr(df, lag=1, group_unit="day").collect()}
    assert got[1] == (5, 1.0)
    assert got[2] == (5, -1.0)


def test_autocorr_lag2_and_constant_series_null(spark):
    # alternating series is perfectly correlated at lag 2
    df = _hourly(spark, {1: [10, 0, 10, 0, 10, 0]})
    [r] = autocorr(df, lag=2, group_unit="day").collect()
    assert (r.n_pairs, round(r.autocorr, 6)) == (4, 1.0)
    # constant series → zero variance → NULL (ANSI corr semantics)
    dfc = _hourly(spark, {1: [5, 5, 5, 5]})
    [rc] = autocorr(dfc, lag=1, group_unit="day").collect()
    assert rc.autocorr is None


def test_autocorr_pairs_do_not_cross_group_boundary(spark):
    df = _hourly(spark, {1: [1, 2], 2: [100, 101]})
    got = {r.group_start.day: r.n_pairs
           for r in autocorr(df, lag=1, group_unit="day").collect()}
    assert got == {1: 1, 2: 1}  # never a (day1 23h, day2 0h) pair


def test_xcorr_detects_known_lead(spark):
    """b is a shifted by exactly 2 buckets -> xcorr peaks at lag=+2
    with correlation 1.0 (a leads b)."""
    import datetime as dt

    from mq_to_db_spark.operators.correlate import xcorr_lags

    t0 = dt.datetime(2024, 1, 1)
    a = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8]
    rows = [
        (t0 + dt.timedelta(hours=h), a[h], a[h - 2] if h >= 2 else 0)
        for h in range(len(a))
    ]
    pair = spark.createDataFrame(rows, "bucket_start timestamp, a long, b long")
    out = {r["lag"]: r for r in xcorr_lags(pair, [-2, 0, 2]).collect()}
    assert round(out[2]["xcorr"], 9) == 1.0
    assert out[2]["n_pairs"] == len(a) - 2
    # the unshifted and reverse pairings are strictly weaker
    assert out[0]["xcorr"] < 1.0 and out[-2]["xcorr"] < 1.0


def test_xcorr_validation_and_single_window(spark):
    import datetime as dt

    import pytest

    from mq_to_db_spark.operators.correlate import xcorr_lags

    pair = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1), 1, 2)], "bucket_start timestamp, a long, b long"
    )
    with pytest.raises(ValueError, match="at least one"):
        xcorr_lags(pair, [])
    with pytest.raises(ValueError, match="duplicate"):
        xcorr_lags(pair, [1, 1])
    # all lag columns share one Window node (one sort, no per-lag exchange)
    plan = xcorr_lags(pair, [-1, 0, 1])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") == 1
