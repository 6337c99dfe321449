"""Range join vs a pandas cross-merge oracle, and plan shape (equi-join,
not BroadcastNestedLoop)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mq_to_db_spark.operators.rangejoin import range_join


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(23)
    base = pd.Timestamp("2025-04-01")
    keys = [f"u{i}" for i in range(5)]
    left = pd.DataFrame(
        {
            "key": rng.choice(keys, 300),
            "ts": (base + pd.to_timedelta(rng.integers(0, 3 * 86400, 300), unit="s")).astype("datetime64[us]"),
            "lid": np.arange(300),
        }
    )
    starts = base + pd.to_timedelta(rng.integers(0, 3 * 86400, 60), unit="s")
    right = pd.DataFrame(
        {
            "key": rng.choice(keys, 60),
            "start": starts.astype("datetime64[us]"),
            "end": (starts + pd.to_timedelta(rng.integers(600, 4 * 3600, 60), unit="s")).astype("datetime64[us]"),
            "rid": np.arange(60),
        }
    )
    return left, right


def _expected(left, right):
    m = left.merge(right, on="key")
    m = m[(m.ts >= m.start) & (m.ts < m.end)]
    return m[["key", "ts", "lid", "start", "end", "rid"]].reset_index(drop=True)


def test_range_join_matches_pandas(spark, frames):
    left, right = frames
    got = (
        range_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            by=["key"],
            bucket="1 hour",
        )
        .toPandas()[["key", "ts", "lid", "start", "end", "rid"]]
    )
    g = got.sort_values(["lid", "rid"], ignore_index=True)
    w = _expected(left, right).sort_values(["lid", "rid"], ignore_index=True)
    for c in g.columns:
        if pd.api.types.is_datetime64_any_dtype(g[c]):
            g[c] = g[c].astype("datetime64[us]")
            w[c] = w[c].astype("datetime64[us]")
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


def test_range_join_no_duplicate_pairs(spark, frames):
    """An interval spanning many buckets must still match each point at
    most once (left points map to exactly one bucket)."""
    left, right = frames
    wide = right.copy()
    wide["end"] = wide["start"] + pd.Timedelta("2 days")  # spans ~48 buckets
    got = range_join(
        spark.createDataFrame(left), spark.createDataFrame(wide), by=["key"], bucket="1 hour"
    )
    assert got.groupBy("lid", "rid").count().filter("count > 1").count() == 0


def test_range_join_is_equi_join_not_bnlj(spark, frames):
    left, right = frames
    q = range_join(
        spark.createDataFrame(left), spark.createDataFrame(right), by=["key"], bucket="1 hour"
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_range_join_degenerate_interval_matches_nothing(spark):
    """A malformed right interval (end < start) must match nothing —
    not crash the job with a sequence() error."""
    import pandas as pd

    from mq_to_db_spark.operators.rangejoin import range_join

    left = spark.createDataFrame(
        pd.DataFrame(
            {
                "ts": pd.to_datetime(["2025-01-01 01:00:00"]).astype("datetime64[us]"),
                "lid": [1],
            }
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "rid": [10, 20],
                "start": pd.to_datetime(
                    ["2025-01-01 00:00:00", "2025-01-01 05:00:00"]
                ).astype("datetime64[us]"),
                "end": pd.to_datetime(
                    ["2025-01-01 02:00:00", "2025-01-01 04:00:00"]  # rid=20: end<start
                ).astype("datetime64[us]"),
            }
        )
    )
    out = range_join(left, right, bucket="1 hour").collect()
    assert [r.rid for r in out] == [10]
