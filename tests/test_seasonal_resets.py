"""Seasonal baseline + counter resets vs brute-force pandas replays."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mq_to_db_spark.operators.counters import counter_resets
from mq_to_db_spark.operators.seasonal import (
    seasonal_profile,
    with_seasonal,
)


@pytest.fixture(scope="module")
def tier_pdf() -> pd.DataFrame:
    """Hourly tier series for 2 keys over ~20 days, integer values with
    a deliberate hour-of-day shape plus noise."""
    rng = np.random.default_rng(11)
    hours = pd.date_range("2024-03-01", periods=20 * 24, freq="h")
    rows = []
    for key in ("a", "b"):
        base = 100 if key == "a" else 40
        for t in hours:
            rows.append(
                {
                    "k": key,
                    "bucket_start": t,
                    "v": int(
                        base
                        + 30 * np.sin(t.hour / 24 * 2 * np.pi)
                        + rng.integers(0, 10)
                    ),
                }
            )
    pdf = pd.DataFrame(rows)
    # punch out a few buckets so season cells have unequal n
    return pdf.drop(pdf.index[5:60:7]).reset_index(drop=True)


@pytest.fixture(scope="module")
def tier(spark, tier_pdf):
    df = spark.createDataFrame(tier_pdf).cache()
    df.count()
    return df


def _brute_cells(pdf: pd.DataFrame, season: str) -> pd.DataFrame:
    p = pdf.copy()
    if season == "hod":
        p["season_idx"] = p.bucket_start.dt.hour
    elif season == "dow":
        p["season_idx"] = (p.bucket_start.dt.dayofweek + 1) % 7  # 0=Sunday
    else:
        p["season_idx"] = (
            (p.bucket_start.dt.dayofweek + 1) % 7
        ) * 24 + p.bucket_start.dt.hour
    g = p.groupby(["k", "season_idx"])["v"]
    cells = g.agg(n="count", s="sum", ss=lambda x: (x.astype("int64") ** 2).sum())
    cells["avg"] = cells.s / cells.n
    cells["std"] = np.where(
        cells.n >= 2,
        np.sqrt(np.maximum((cells.ss - cells.s**2 / cells.n) / (cells.n - 1), 0.0)),
        np.nan,
    )
    return cells


@pytest.mark.parametrize("season", ["hod", "dow", "hod_dow"])
def test_with_seasonal_matches_brute(tier, tier_pdf, season):
    got = (
        with_seasonal(tier, ["k"], ts_col="bucket_start", value_col="v", season=season)
        .toPandas()
        .set_index(["k", "bucket_start"])
        .sort_index()
    )
    cells = _brute_cells(tier_pdf, season)
    for (k, ts), row in got.iterrows():
        cell = cells.loc[(k, row.season_idx)]
        assert row.seas_n == cell.n
        assert row.seas_avg == pytest.approx(round(cell.avg, 6))
        if cell.n >= 2:
            assert row.seas_std == pytest.approx(round(cell["std"], 6))
        assert row.residual == pytest.approx(round(row.v - cell.avg, 6))
        if cell.n >= 2 and cell["std"] > 0:
            assert row.seas_z == pytest.approx(
                round((row.v - cell.avg) / cell["std"], 6)
            )
        else:
            assert pd.isna(row.seas_z)


def test_profile_agrees_with_with_seasonal(tier):
    prof = (
        seasonal_profile(tier, ["k"], ts_col="bucket_start", value_col="v")
        .toPandas()
        .set_index(["k", "season_idx"])
        .sort_index()
    )
    attached = (
        with_seasonal(tier, ["k"], ts_col="bucket_start", value_col="v")
        .select("k", "season_idx", "seas_n", "seas_avg", "seas_std")
        .distinct()
        .toPandas()
        .set_index(["k", "season_idx"])
        .sort_index()
    )
    pd.testing.assert_frame_equal(prof, attached, check_like=True)


def test_single_bucket_cell_has_null_std(spark):
    pdf = pd.DataFrame(
        {
            "k": ["x", "x"],
            "bucket_start": pd.to_datetime(
                ["2024-01-01 05:00", "2024-01-01 06:00"]
            ),
            "v": [3, 9],
        }
    )
    out = (
        with_seasonal(
            spark.createDataFrame(pdf), ["k"], ts_col="bucket_start", value_col="v"
        )
        .toPandas()
        .sort_values("bucket_start")
    )
    # each hod cell has exactly one row: std/z undefined, residual 0
    assert out.seas_std.isna().all()
    assert out.seas_z.isna().all()
    assert (out.residual == 0.0).all()
    assert (out.seas_n == 1).all()


def test_seasonal_rejects_unknown_season(tier):
    with pytest.raises(ValueError, match="season"):
        with_seasonal(tier, ["k"], season="lunar")


# -- counter_resets -----------------------------------------------------------


def test_counter_resets_matches_brute(spark):
    rng = np.random.default_rng(3)
    n = 3000
    pdf = pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c"], n),
            "sid": np.arange(n),
            "ts": pd.to_datetime(
                pd.Timestamp("2024-01-01").value // 1000
                + rng.integers(0, 3 * 86_400 * 1_000_000, n),
                unit="us",
            ),
            "v": rng.integers(0, 1_000, n).astype("int64"),
        }
    )
    got = (
        counter_resets(
            spark.createDataFrame(pdf), ["k"], ts_col="ts", value_col="v",
            tier="1h", tiebreak=("sid",),
        )
        .toPandas()
        .set_index(["k", "bucket_start"])
        .sort_index()
    )
    p = pdf.sort_values(["k", "ts", "sid"]).copy()
    p["prev"] = p.groupby("k").v.shift(1)
    p["reset"] = (p.prev.notna() & (p.v < p.prev)).astype("int64")
    p["bucket_start"] = p.ts.dt.floor("h")
    want = p.groupby(["k", "bucket_start"]).agg(
        n_resets=("reset", "sum"), n_samples=("reset", "size")
    )
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(
        got.astype("int64"), want.astype("int64"), check_like=True
    )


def test_counter_resets_keyless(spark):
    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                ["2024-01-01 00:01", "2024-01-01 00:02", "2024-01-01 00:03",
                 "2024-01-01 01:01", "2024-01-01 01:02"]
            ),
            "v": [5, 3, 7, 2, 9],  # resets at 00:02 and 01:01
        }
    )
    got = (
        counter_resets(spark.createDataFrame(pdf), [], ts_col="ts", value_col="v")
        .orderBy("bucket_start")
        .toPandas()
    )
    assert got.n_resets.tolist() == [1, 1]
    assert got.n_samples.tolist() == [3, 2]
