"""Ordered funnel + cohort retention vs brute-force Python replays."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from mq_to_db_spark.operators.cohort import cohort_retention
from mq_to_db_spark.operators.funnel import funnel_counts, funnel_reach

STEPS = ["signup", "view", "purchase"]


@pytest.fixture(scope="module")
def events_pdf() -> pd.DataFrame:
    rng = np.random.default_rng(7)
    n = 4000
    ts0 = pd.Timestamp("2024-01-01").value // 1000  # µs
    return pd.DataFrame(
        {
            "user_id": rng.integers(0, 120, n),
            "event_type": rng.choice(
                ["click", "error", "purchase", "signup", "view"],
                n,
                p=[0.3, 0.1, 0.1, 0.2, 0.3],
            ),
            "ts": pd.to_datetime(
                ts0 + rng.integers(0, 45 * 86_400 * 1_000_000, n), unit="us"
            ),
        }
    )


@pytest.fixture(scope="module")
def events(spark, events_pdf):
    df = spark.createDataFrame(events_pdf)
    df = df.cache()
    df.count()
    return df


def _brute_chain(g: pd.DataFrame, steps, horizon_us=None):
    """Earliest ordered chain for one user's events; list of ts or None."""
    out = []
    prev = None
    for k, s in enumerate(steps):
        ts = np.sort(g.loc[g.event_type == s, "ts"].values)
        if k == 0:
            cur = ts[0] if len(ts) else None
        elif prev is None:
            cur = None
        else:
            after = ts[ts >= prev]
            cur = after[0] if len(after) else None
        if (
            cur is not None
            and horizon_us is not None
            and k > 0
            and (cur - out[0]) // np.timedelta64(1, "us") > horizon_us
        ):
            cur = None
        out.append(cur)
        prev = cur
    return out


@pytest.mark.parametrize("horizon_sec", [None, 7 * 86_400])
def test_funnel_reach_matches_brute(events, events_pdf, horizon_sec):
    got = (
        funnel_reach(events, STEPS, horizon_sec=horizon_sec)
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    horizon_us = None if horizon_sec is None else horizon_sec * 1_000_000
    want = {}
    for uid, g in events_pdf.groupby("user_id"):
        chain = _brute_chain(g, STEPS, horizon_us)
        if chain[0] is not None:
            want[uid] = chain
    assert set(got.index) == set(want)
    for uid, chain in want.items():
        for k, c in enumerate(chain, start=1):
            gv = got.loc[uid, f"t{k}"]
            if c is None:
                assert pd.isna(gv), (uid, k)
            else:
                assert pd.Timestamp(c) == gv, (uid, k)


def test_funnel_counts_monotone_and_based(events, events_pdf):
    got = funnel_counts(events, STEPS).toPandas().sort_values("step_idx")
    ns = got.n_entities.tolist()
    assert ns == sorted(ns, reverse=True)  # funnel never widens
    assert got.conv_rate.iloc[0] == 1.0
    n_signup = events_pdf[events_pdf.event_type == "signup"].user_id.nunique()
    assert ns[0] == n_signup
    # spot: conv_rate = n/base rounded to 6
    assert got.conv_rate.iloc[2] == round(ns[2] / ns[0], 6)


def test_funnel_horizon_tightens(events):
    free = funnel_counts(events, STEPS).toPandas().set_index("step_idx")
    tight = (
        funnel_counts(events, STEPS, horizon_sec=86_400)
        .toPandas()
        .set_index("step_idx")
    )
    assert tight.loc[1, "n_entities"] == free.loc[1, "n_entities"]
    assert (tight.n_entities <= free.n_entities).all()
    assert tight.loc[3, "n_entities"] < free.loc[3, "n_entities"]


def test_funnel_plan_single_exchange(events):
    plan = (
        funnel_counts(events, STEPS)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # one shuffle for the per-entity agg; final count agg is single-
    # partition (row count == 1), adding its own tiny exchange
    assert plan.count("Exchange hashpartitioning") <= 1


def test_cohort_retention_matches_brute(events, events_pdf):
    got = cohort_retention(events, period="week").toPandas()
    plen_us = 7 * 86_400 * 1_000_000
    p = events_pdf.ts.astype("datetime64[ns]").astype("int64") // 1000 // plen_us
    tier = pd.DataFrame({"user_id": events_pdf.user_id, "p": p}).drop_duplicates()
    p0 = tier.groupby("user_id").p.min().rename("p0")
    tier = tier.join(p0, on="user_id")
    tier["off"] = tier.p - tier.p0
    cells = (
        tier.groupby(["p0", "off"]).user_id.nunique().rename("n").reset_index()
    )
    sizes = cells[cells.off == 0].set_index("p0").n
    assert len(got) == len(cells)
    g = got.set_index(
        [got.cohort_start.astype("datetime64[ns]").astype("int64") // 1000 // plen_us,
         "period_offset"]
    )
    for _, r in cells.iterrows():
        row = g.loc[(r.p0, r.off)]
        assert row.n_active == r.n
        assert row.cohort_size == sizes[r.p0]
        assert row.retention_rate == round(r.n / sizes[r.p0], 6)


def test_cohort_offset0_is_full(events):
    got = cohort_retention(events, period="day", max_offset=3).toPandas()
    z = got[got.period_offset == 0]
    assert (z.retention_rate == 1.0).all()
    assert got.period_offset.max() <= 3
    assert (got.n_active <= got.cohort_size).all()


# -- stickiness ---------------------------------------------------------------


def test_stickiness_hand_fixture(spark):
    import datetime as dt

    from mq_to_db_spark.operators.cohort import stickiness

    d0 = dt.datetime(2024, 1, 1)
    rows = [
        # u1 active day 0 and day 2; u2 active day 0 only
        ("u1", d0), ("u1", d0 + dt.timedelta(hours=2)),        # dup same day
        ("u2", d0),
        ("u1", d0 + dt.timedelta(days=2)),
        # u3 appears day 5
        ("u3", d0 + dt.timedelta(days=5)),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    out = {
        r["day_start"].day: (r["dau"], r["mau"], r["stickiness"])
        for r in stickiness(df, window_days=3).collect()
    }
    # dense grid: days 1..6 all present
    assert sorted(out) == [1, 2, 3, 4, 5, 6]
    # day1: dau {u1,u2}; mau(3d window ending day1) = {u1,u2}
    assert out[1] == (2, 2, 1.0)
    # day2: silent; mau still {u1,u2} (window days 0-2)
    assert out[2] == (0, 2, 0.0)
    # day3: u1 returns; window covers days 1-3 -> {u1,u2}
    assert out[3] == (1, 2, 0.5)
    # day4: silent; window days 2-4 -> {u1} (u2's day-1 aged out)
    assert out[4] == (0, 1, 0.0)
    # day5: silent; window days 3-5 -> {u1}
    assert out[5] == (0, 1, 0.0)
    # day6: u3; window days 4-6 -> {u3}
    assert out[6] == (1, 1, 1.0)


def test_stickiness_mau_zero_is_null(spark):
    import datetime as dt

    from mq_to_db_spark.operators.cohort import stickiness

    d0 = dt.datetime(2024, 1, 1)
    # activity on day 1 and day 10 with a 2-day window: days 4-9 have
    # mau 0 -> stickiness NULL, dau 0
    rows = [("u1", d0), ("u1", d0 + dt.timedelta(days=9))]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    out = {
        r["day_start"].day: (r["mau"], r["stickiness"])
        for r in stickiness(df, window_days=2).collect()
    }
    assert out[5] == (0, None)
    assert out[10] == (1, 1.0)
