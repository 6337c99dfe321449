"""Semantics of series-lifecycle analytics (operators/lifecycle.py):
churn born/died/active on a hand-computable fixture, exemplar
determinism under value ties.  (Contract queries series_churn_1d /
exemplars_1h add DuckDB hash-exactness.)"""

import datetime as dt

from mq_to_db_spark.operators.lifecycle import exemplars, series_churn


def _rows(spark, rows):
    return spark.createDataFrame(
        [(k, dt.datetime(2024, 1, 1 + d, h), int(v), i)
         for i, (k, d, h, v) in enumerate(rows)],
        "k string, ts timestamp, v long, rid long",
    )


def test_series_churn_born_died_active(spark):
    # a: days 0-2 (born d0, dies d2); b: day 1 only; c: days 1-2
    df = _rows(spark, [("a", 0, 1, 0), ("a", 1, 1, 0), ("a", 2, 1, 0),
                       ("b", 1, 2, 0),
                       ("c", 1, 3, 0), ("c", 2, 3, 0)])
    got = {
        r.bucket_start.day: (r.n_active, r.n_born, r.n_died)
        for r in series_churn(df, ["k"], tier="1d").collect()
    }
    assert got == {
        1: (1, 1, 0),   # day 0: a active, a born
        2: (3, 2, 1),   # day 1: a,b,c active; b,c born; b dies
        3: (2, 0, 2),   # day 2: a,c active; a,c die
    }


def test_series_churn_single_bucket_series_born_and_died(spark):
    df = _rows(spark, [("x", 0, 1, 5)])
    [r] = series_churn(df, ["k"], tier="1d").collect()
    assert (r.n_active, r.n_born, r.n_died) == (1, 1, 1)


def test_exemplars_deterministic_under_ties(spark):
    # two samples tie on v=9 in the same hour: the LATER ts wins; if ts
    # also tied, the larger id wins — the (v, ts, id) struct-max order
    df = _rows(spark, [("a", 0, 1, 9), ("a", 0, 1, 9), ("a", 0, 1, 3)])
    # rows 0 and 1 share ts exactly → id (rid) breaks the tie: rid=1
    [r] = exemplars(df, ["k"], value_col="v", id_col="rid",
                    tier="1h").collect()
    assert (r.exemplar_value, r.exemplar_id, r.n_samples) == (9, 1, 3)


def test_exemplars_picks_max_per_bucket(spark):
    df = _rows(spark, [("a", 0, 1, 5), ("a", 0, 1, 7), ("a", 0, 2, 100),
                       ("b", 0, 1, 1)])
    got = {(r.k, r.bucket_start.hour): (r.exemplar_value, r.n_samples)
           for r in exemplars(df, ["k"], value_col="v", id_col="rid",
                              tier="1h").collect()}
    assert got == {("a", 1): (7, 2), ("a", 2): (100, 1), ("b", 1): (1, 1)}


def test_series_limit_admission_and_conservation(spark):
    import datetime as dt

    from mq_to_db_spark.operators.lifecycle import series_limit

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # scope A: series s1 (born h0), s2 (h1), s3 (h2) — limit 2 drops s3
    for h, s in [(0, "s1"), (1, "s2"), (2, "s3"), (3, "s1"), (4, "s3")]:
        rows.append(("A", s, t0 + dt.timedelta(hours=h)))
    # scope B: one series only
    rows.append(("B", "s9", t0))
    df = spark.createDataFrame(rows, "scope string, series string, ts timestamp")
    admitted, audit = series_limit(df, ["series"], scope_keys=["scope"], limit=2)
    a = admitted.collect()
    assert all(r["series"] != "s3" for r in a if r["scope"] == "A")
    assert len(a) + sum(r["n_samples"] for r in audit.collect()) == len(rows)
    aud = audit.collect()
    assert len(aud) == 1 and aud[0]["series"] == "s3" and aud[0]["rank"] == 3
    assert aud[0]["n_samples"] == 2


def test_series_limit_tiebreak_and_validation(spark):
    import datetime as dt

    import pytest

    from mq_to_db_spark.operators.lifecycle import series_limit

    t0 = dt.datetime(2024, 1, 1)
    # same first_ts: lexicographic series key breaks the tie
    df = spark.createDataFrame(
        [("x", t0), ("y", t0), ("z", t0)], "series string, ts timestamp"
    )
    admitted, audit = series_limit(df, ["series"], limit=2)
    assert sorted(r["series"] for r in admitted.collect()) == ["x", "y"]
    assert [r["series"] for r in audit.collect()] == ["z"]
    with pytest.raises(ValueError, match="limit"):
        series_limit(df, ["series"], limit=0)


def test_series_limit_window_runs_on_series_not_samples(spark):
    import datetime as dt

    from mq_to_db_spark.operators.lifecycle import series_limit

    df = spark.createDataFrame(
        [("A", "s", dt.datetime(2024, 1, 1))], "scope string, series string, ts timestamp"
    )
    admitted, _ = series_limit(df, ["series"], scope_keys=["scope"], limit=1)
    plan = admitted._jdf.queryExecution().optimizedPlan().toString()
    # the Window consumes the per-series Aggregate, never the raw scan:
    # in the tree string (parents print first) Window precedes its
    # Aggregate child
    assert "Window" in plan and "Aggregate" in plan
    assert plan.index("Window") < plan.index("Aggregate")
