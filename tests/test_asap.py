"""ASAP smoothing-window selection (operators/asap.py).

Oracle-style checks against a hand-computed numpy replay plus the
semantic invariants of the paper: exactly one chosen rung per key,
kurtosis preservation keeps spiky series sharp, white noise smooths to
the widest rung, and asap_smooth equals the trailing mean at the chosen
width.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import numpy as np
import pytest

from pyspark.sql import functions as F

from mq_to_db_spark.operators.asap import ASAP_LADDER, asap_metrics, asap_smooth


def _series_df(spark, values_by_key: dict[str, list[int]]):
    t0 = datetime(2024, 1, 1)
    rows = [
        (k, t0 + timedelta(hours=i), int(v))
        for k, vals in values_by_key.items()
        for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(
        rows, "k string, bucket_start timestamp, v long"
    )


def _np_metrics(vals: np.ndarray, w: int):
    """Reference replay: rolling sums, lag diffs, moment formulas."""
    n = len(vals)
    s = np.array(
        [vals[i - w + 1 : i + 1].sum() for i in range(w - 1, n)], dtype=float
    )
    kurt = None
    if len(s) >= 2:
        mu = s.mean()
        m2 = (s * s).mean() - mu * mu
        if m2 > 0:
            m4 = (
                (s**4).mean()
                - 4 * mu * (s**3).mean()
                + 6 * mu * mu * (s * s).mean()
                - 3 * mu**4
            )
            kurt = m4 / (m2 * m2) - 3
    d = np.diff(s)
    rough = None
    if len(d) >= 2:
        var = max(
            ((d * d).sum() - d.sum() ** 2 / len(d)) / (len(d) - 1), 0.0
        )
        rough = np.sqrt(var) / w
    return kurt, rough


def test_metrics_match_numpy_replay(spark):
    rng = np.random.RandomState(7)
    vals = rng.poisson(20, size=120)
    df = _series_df(spark, {"a": list(vals)})
    out = {
        r["w"]: r
        for r in asap_metrics(df, ["k"], value_col="v").collect()
    }
    assert set(out) == set(ASAP_LADDER)
    for w in ASAP_LADDER:
        kurt, rough = _np_metrics(vals.astype(np.int64), w)
        row = out[w]
        assert row["n_s"] == 120 - w + 1
        assert row["n_d"] == 120 - w
        if kurt is None:
            assert row["kurt"] is None
        else:
            assert row["kurt"] == pytest.approx(kurt, abs=2e-6)
        if rough is None:
            assert row["roughness"] is None
        else:
            assert row["roughness"] == pytest.approx(rough, abs=2e-6)


def test_exactly_one_chosen_per_key(spark):
    rng = np.random.RandomState(3)
    df = _series_df(
        spark,
        {
            "noise": list(rng.poisson(50, size=100)),
            "spiky": list(
                np.where(rng.rand(100) < 0.05, 500, 1) + rng.poisson(2, 100)
            ),
        },
    )
    out = asap_metrics(df, ["k"], value_col="v")
    per_key = (
        out.groupBy("k").agg(F.count_if("chosen").alias("n")).collect()
    )
    assert {r["k"]: r["n"] for r in per_key} == {"noise": 1, "spiky": 1}


def test_white_noise_smooths_spikes_stay(spark):
    rng = np.random.RandomState(11)
    noise = list(rng.poisson(100, size=200))
    # rare huge spikes: heavy kurtosis that wide windows destroy
    spiky_arr = rng.poisson(5, size=200)
    spiky_arr[::37] += 800
    df = _series_df(spark, {"noise": noise, "spiky": list(spiky_arr)})
    chosen = {
        r["k"]: r["w"]
        for r in asap_metrics(df, ["k"], value_col="v")
        .where("chosen")
        .collect()
    }
    # white noise: roughness shrinks with w, so the widest rung whose
    # kurtosis still clears the original's (≈0.48 on this draw; CLT
    # pulls wider rungs toward 0, so w=6+ disqualify) wins — the
    # kurtosis guard binding on sampling noise is the paper's behavior
    assert chosen["noise"] == 4
    # spikes dominate kurtosis (≈28 at w=1); every smoothing dilutes it
    # -> ASAP must keep the raw series
    assert chosen["spiky"] == 1


def test_smooth_is_trailing_mean_at_chosen_width(spark):
    rng = np.random.RandomState(5)
    vals = list(rng.poisson(40, size=96))
    df = _series_df(spark, {"a": vals})
    w = (
        asap_metrics(df, ["k"], value_col="v")
        .where("chosen")
        .first()["w"]
    )
    sm = (
        asap_smooth(df, ["k"], value_col="v")
        .orderBy("bucket_start")
        .collect()
    )
    assert len(sm) == len(vals) - w + 1
    assert all(r["w"] == w for r in sm)
    arr = np.array(vals, dtype=float)
    for i, r in enumerate(sm):
        expect = arr[i : i + w].mean()
        assert r["sma"] == pytest.approx(expect, abs=1e-6)


def test_constant_series_degenerates(spark):
    df = _series_df(spark, {"c": [7] * 50})
    out = asap_metrics(df, ["k"], value_col="v")
    rows = {r["w"]: r for r in out.collect()}
    # zero variance: kurtosis undefined on every rung, roughness 0;
    # w=1 is always qualified and wins the (0.0, w) tie at the smallest w
    assert all(r["kurt"] is None for r in rows.values())
    assert all(r["roughness"] == 0.0 for r in rows.values())
    chosen = [r for r in rows.values() if r["chosen"]]
    assert len(chosen) == 1 and chosen[0]["w"] == 1
