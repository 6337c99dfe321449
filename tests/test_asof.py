"""As-of join vs pandas.merge_asof (the reference implementation of
backward as-of semantics)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mq_to_db_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(11)
    keys = [f"k{i}" for i in range(6)]
    n_l, n_r = 400, 150
    base = pd.Timestamp("2025-03-01")
    left = pd.DataFrame(
        {
            "key": rng.choice(keys, n_l),
            "ts": base + pd.to_timedelta(rng.integers(0, 86400, n_l), unit="s"),
            "lval": rng.integers(0, 1000, n_l),
        }
    )
    right = pd.DataFrame(
        {
            "key": rng.choice(keys, n_r),
            "ts": base + pd.to_timedelta(rng.integers(0, 86400, n_r), unit="s"),
            "price": rng.random(n_r).round(6),
        }
    )
    # make ts unique per (key) on the right so merge_asof ties are unambiguous
    right = right.drop_duplicates(["key", "ts"])
    left["ts"] = left["ts"].astype("datetime64[us]")
    right["ts"] = right["ts"].astype("datetime64[us]")
    return left, right


def _expected(left, right, tolerance=None):
    kw = {"tolerance": pd.Timedelta(tolerance)} if tolerance else {}
    exp = pd.merge_asof(
        left.sort_values("ts", kind="stable"),
        right.sort_values("ts", kind="stable").rename(columns={"ts": "ts_r"}),
        left_on="ts",
        right_on="ts_r",
        by="key",
        direction="backward",
        **kw,
    )
    return exp.rename(columns={"price": "price_right", "ts_r": "ts_right"})


def _got(spark, left, right, tolerance=None):
    l_df = spark.createDataFrame(left)
    r_df = spark.createDataFrame(right)
    return asof_join(
        l_df, r_df, on="ts", by=["key"], tolerance=tolerance
    ).toPandas()


def _cmp(got, want):
    g = got.sort_values(["key", "ts", "lval"], ignore_index=True)
    w = want.sort_values(["key", "ts", "lval"], ignore_index=True)[g.columns]
    for c in g.columns:  # unify datetime resolution (ns vs us)
        if pd.api.types.is_datetime64_any_dtype(g[c]):
            g[c] = g[c].astype("datetime64[us]")
            w[c] = w[c].astype("datetime64[us]")
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


def test_asof_backward_matches_merge_asof(spark, frames):
    left, right = frames
    _cmp(_got(spark, left, right), _expected(left, right))


def test_asof_with_tolerance(spark, frames):
    left, right = frames
    got = _got(spark, left, right, tolerance="1 hour")
    want = _expected(left, right, tolerance="1 hour")
    # pandas keeps ts_r even out of tolerance? no — it nulls the row's
    # right columns entirely, same as ours
    _cmp(got, want)


def test_asof_tie_matches_equal_timestamp(spark):
    left = pd.DataFrame(
        {"key": ["a"], "ts": pd.to_datetime(["2025-01-01 00:10:00"]).astype("datetime64[us]"), "lval": [1]}
    )
    right = pd.DataFrame(
        {"key": ["a"], "ts": pd.to_datetime(["2025-01-01 00:10:00"]).astype("datetime64[us]"), "price": [0.5]}
    )
    got = _got(spark, left, right)
    assert got["price_right"].iloc[0] == 0.5  # <= semantics: tie matches


def test_asof_null_right_value_does_not_mix_rows(spark):
    """A right row with a NULL value field must not inherit the value of
    an older right row (struct-carry atomicity)."""
    left = pd.DataFrame(
        {"key": ["a"], "ts": pd.to_datetime(["2025-01-01 02:00:00"]).astype("datetime64[us]"), "lval": [1]}
    )
    r = pd.DataFrame(
        {
            "key": ["a", "a"],
            "ts": pd.to_datetime(["2025-01-01 00:00:00", "2025-01-01 01:00:00"]).astype("datetime64[us]"),
            "price": [1.0, None],
        }
    )
    got = _got(spark, left, r)
    # latest right row (01:00) has NULL price — the match must carry that
    # NULL, not the 00:00 price
    assert pd.isna(got["price_right"].iloc[0])
    assert got["ts_right"].iloc[0] == pd.Timestamp("2025-01-01 01:00:00")


def test_keyless_asof_matches_merge_asof(spark, frames):
    """Global (no-by) as-of join: the range-partitioned LOCF + boundary
    carry must equal a global pandas merge_asof."""
    left, right = frames
    # drop key: global as-of; dedup right ts so ties are unambiguous
    l = left.drop(columns=["key"]).copy()
    r = (
        right.drop(columns=["key"])
        .drop_duplicates(["ts"])
        .sort_values("ts", kind="stable")
    )
    got = asof_join(
        spark.createDataFrame(l), spark.createDataFrame(r), on="ts", range_buckets=8
    ).toPandas()
    want = pd.merge_asof(
        l.sort_values("ts", kind="stable"),
        r.rename(columns={"ts": "ts_r"}),
        left_on="ts",
        right_on="ts_r",
        direction="backward",
    ).rename(columns={"price": "price_right", "ts_r": "ts_right"})
    g = got.sort_values(["ts", "lval"], ignore_index=True)
    w = want.sort_values(["ts", "lval"], ignore_index=True)[g.columns]
    for c in g.columns:
        if pd.api.types.is_datetime64_any_dtype(g[c]):
            g[c] = g[c].astype("datetime64[us]")
            w[c] = w[c].astype("datetime64[us]")
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


def test_keyless_asof_plan_is_range_partitioned(spark, frames):
    """The keyless path must NOT serialize through one global window: the
    main LOCF window's exchange hash-partitions on the range bucket."""
    left, right = frames
    l = left.drop(columns=["key"])
    r = right.drop(columns=["key"]).drop_duplicates(["ts"])
    out = asof_join(
        spark.createDataFrame(l), spark.createDataFrame(r), on="ts", range_buckets=8
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the big LOCF window shuffles on the range bucket...
    assert "hashpartitioning(_rb" in plan
    # ...and the only SinglePartition exchange is the tiny carry spine
    assert plan.count("Exchange SinglePartition") <= 1


def test_keyless_asof_null_on_rows(spark):
    """Left rows with NULL `on` get no match; right rows with NULL `on`
    are never carried."""
    l = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                ["2025-01-01 01:00:00", pd.NaT, "2025-01-01 03:00:00"]
            ).astype("datetime64[us]"),
            "lval": [1, 2, 3],
        }
    )
    r = pd.DataFrame(
        {
            "ts": pd.to_datetime([pd.NaT, "2025-01-01 02:00:00"]).astype(
                "datetime64[us]"
            ),
            "price": [99.0, 1.5],
        }
    )
    got = (
        asof_join(
            spark.createDataFrame(l), spark.createDataFrame(r), on="ts", range_buckets=4
        )
        .toPandas()
        .sort_values("lval", ignore_index=True)
    )
    assert pd.isna(got["price_right"].iloc[0])  # 01:00 predates all rights
    assert pd.isna(got["price_right"].iloc[1])  # NULL ts: no match
    assert got["price_right"].iloc[2] == 1.5  # 03:00 ← 02:00; 99.0 never used


# ------------------------------------------------------------- directions


def _expected_dir(left, right, direction, tolerance=None, by=True):
    kw = {"tolerance": pd.Timedelta(tolerance)} if tolerance else {}
    if by:
        kw["by"] = "key"
    exp = pd.merge_asof(
        left.sort_values("ts", kind="stable"),
        right.sort_values("ts", kind="stable").rename(columns={"ts": "ts_r"}),
        left_on="ts",
        right_on="ts_r",
        direction=direction,
        **kw,
    )
    return exp.rename(columns={"price": "price_right", "ts_r": "ts_right"})


def test_asof_forward_matches_merge_asof(spark, frames):
    left, right = frames
    got = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        on="ts",
        by=["key"],
        direction="forward",
    ).toPandas()
    _cmp(got, _expected_dir(left, right, "forward"))


def test_asof_forward_with_tolerance(spark, frames):
    left, right = frames
    got = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        on="ts",
        by=["key"],
        direction="forward",
        tolerance="1 hour",
    ).toPandas()
    _cmp(got, _expected_dir(left, right, "forward", tolerance="1 hour"))


def test_asof_nearest_matches_merge_asof(spark, frames):
    left, right = frames
    got = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        on="ts",
        by=["key"],
        direction="nearest",
    ).toPandas()
    # pandas `nearest` also prefers backward on exact-distance ties
    _cmp(got, _expected_dir(left, right, "nearest"))


def test_asof_keyless_forward_matches_merge_asof(spark, frames):
    left, right = frames
    r1 = right.drop_duplicates(["ts"])
    got = asof_join(
        spark.createDataFrame(left.drop(columns=["key"])),
        spark.createDataFrame(r1.drop(columns=["key"])),
        on="ts",
        direction="forward",
        range_buckets=7,
    ).toPandas()
    want = _expected_dir(
        left.drop(columns=["key"]), r1.drop(columns=["key"]), "forward", by=False
    )
    g = got.sort_values(["ts", "lval"], ignore_index=True)
    w = want.sort_values(["ts", "lval"], ignore_index=True)[g.columns]
    for c in g.columns:
        if pd.api.types.is_datetime64_any_dtype(g[c]):
            g[c] = g[c].astype("datetime64[us]")
            w[c] = w[c].astype("datetime64[us]")
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


def test_asof_forward_tie_matches_equal_timestamp(spark):
    base = pd.Timestamp("2025-03-01")
    left = pd.DataFrame({"key": ["a"], "ts": [base], "lval": [1]})
    right = pd.DataFrame({"key": ["a"], "ts": [base], "price": [9.5]})
    got = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        on="ts",
        by=["key"],
        direction="forward",
    ).collect()
    assert got[0].price_right == 9.5 and got[0].ts_right == base.to_pydatetime()


def test_asof_forward_null_left_on_matches_nothing(spark):
    base = pd.Timestamp("2025-03-01")
    left = pd.DataFrame(
        {"key": ["a", "a"], "ts": [base, pd.NaT], "lval": [1, 2]}
    )
    right = pd.DataFrame({"key": ["a"], "ts": [base], "price": [9.5]})
    got = {
        r.lval: r.price_right
        for r in asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="ts",
            by=["key"],
            direction="forward",
        ).collect()
    }
    assert got[1] == 9.5 and got[2] is None


def test_asof_bad_direction_raises(spark, frames):
    left, right = frames
    with pytest.raises(ValueError):
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="ts",
            direction="sideways",
        )
