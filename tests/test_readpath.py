"""Hybrid tiered read path vs direct raw aggregation (SURVEY.md §5)."""

from datetime import datetime

import pandas as pd
import pytest

from pyspark.sql import functions as F

from mq_to_db_spark.operators.compression import encode_chunks
from mq_to_db_spark.operators.rollup import rollup_tiers
from mq_to_db_spark.plans.readpath import TierReader, hybrid_read


@pytest.fixture(scope="module")
def store(spark, transcripts):
    tiers = {k: v.cache() for k, v in rollup_tiers(transcripts, keys=["role"]).items()}
    chunks = encode_chunks(transcripts, value_col="text_len").cache()
    chunks.count()
    return TierReader(tiers, chunks)


def _direct(transcripts_pdf, t0, t1, keys):
    p = transcripts_pdf[(transcripts_pdf["ts"] >= t0) & (transcripts_pdf["ts"] < t1)].copy()
    p["text_len"] = p["text"].str.len().fillna(0).astype("int64")
    return (
        p.groupby(keys, dropna=False)
        .agg(
            n_turns=("text_len", "size"),
            text_len_sum=("text_len", "sum"),
            text_len_min=("text_len", "min"),
            text_len_max=("text_len", "max"),
        )
        .reset_index()
    )


@pytest.mark.parametrize(
    "t0,t1",
    [
        # microsecond bounds: head + interior + tail
        (datetime(2025, 1, 2, 5, 37, 17, 500000), datetime(2025, 1, 6, 21, 41, 42, 250000)),
        # aligned bounds: pure stitch, no raw slivers
        (datetime(2025, 1, 2, 6, 0), datetime(2025, 1, 6, 0, 0)),
        # sub-minute range: slivers only
        (datetime(2025, 1, 2, 5, 37, 5), datetime(2025, 1, 2, 5, 37, 45)),
        # two adjacent minutes, no whole bucket between
        (datetime(2025, 1, 2, 5, 37, 30), datetime(2025, 1, 2, 5, 38, 30)),
    ],
)
def test_hybrid_read_matches_raw(store, transcripts_pdf, t0, t1):
    got = (
        store.aggregate(t0, t1, keys=["role"])
        .select(
            "role", "n_turns", "text_len_sum", "text_len_min", "text_len_max",
            "n_partials", "n_raw",
        )
        .toPandas()
        .sort_values("role", ignore_index=True)
    )
    want = _direct(transcripts_pdf, t0, t1, ["role"]).sort_values(
        "role", ignore_index=True
    )
    pd.testing.assert_frame_equal(
        got.drop(columns=["n_partials", "n_raw"]),
        want,
        check_dtype=False,
    )


def test_sliver_actually_served_from_archive(store, transcripts_pdf):
    """Bounds cut through a minute that provably contains samples: the
    head sliver must contribute raw partials (n_raw > 0) and the answer
    must still be exact."""
    s_ts = transcripts_pdf["ts"].sort_values().iloc[len(transcripts_pdf) // 2]
    assert s_ts.second or s_ts.microsecond  # not minute-aligned
    t0 = s_ts.floor("s").to_pydatetime()
    t1 = (s_ts + pd.Timedelta(days=2)).floor("min").to_pydatetime()
    got = store.aggregate(t0, t1, keys=["role"]).toPandas()
    want = _direct(transcripts_pdf, t0, t1, ["role"])
    pd.testing.assert_frame_equal(
        got[["role", "n_turns", "text_len_sum", "text_len_min", "text_len_max"]]
        .sort_values("role", ignore_index=True),
        want.sort_values("role", ignore_index=True),
        check_dtype=False,
    )
    assert (got["n_raw"] > 0).any()


def test_hybrid_read_global_keys(store, transcripts_pdf):
    t0, t1 = datetime(2025, 1, 3, 11, 11, 11), datetime(2025, 1, 5, 13, 13, 13)
    got = store.aggregate(t0, t1).collect()[0]
    p = transcripts_pdf[(transcripts_pdf["ts"] >= t0) & (transcripts_pdf["ts"] < t1)]
    assert got["n_turns"] == len(p)


def test_points_pruned_read(store, transcripts_pdf):
    lo, hi = datetime(2025, 1, 3), datetime(2025, 1, 4)
    got = store.points(lo, hi).count()
    p = transcripts_pdf[(transcripts_pdf["ts"] >= lo) & (transcripts_pdf["ts"] < hi)]
    assert got == len(p)


def test_empty_range_rejected(store):
    with pytest.raises(ValueError):
        store.aggregate(datetime(2025, 1, 2), datetime(2025, 1, 2))

# ---------------------------------------------------------------------------
# range_eval: PromQL query_range served from the coarsest dividing tier
# ---------------------------------------------------------------------------


def test_pick_tier_resolution_rule():
    from mq_to_db_spark.plans.readpath import pick_tier

    assert pick_tier(60) == "1m"
    assert pick_tier(600) == "1m"          # 10m: only 1m divides
    assert pick_tier(3600) == "1h"
    assert pick_tier(6 * 3600) == "1h"     # 6h: 1d doesn't divide
    assert pick_tier(86400) == "1d"
    assert pick_tier(7 * 86400) == "1d"    # weekly
    with pytest.raises(ValueError):
        pick_tier(90)                       # no tier divides 90s
    assert pick_tier(6 * 3600, available=("1m",)) == "1m"


@pytest.mark.parametrize("step", [6 * 3600, 86400, 600])
def test_range_eval_matches_raw_grid(store, transcripts_pdf, step):
    from mq_to_db_spark.plans.readpath import range_eval

    t0, t1 = datetime(2025, 1, 2), datetime(2025, 1, 6)
    got = (
        range_eval(store.tiers, t0, t1, step, keys=["role"])
        .select("grid_ts", "role", "n_turns", "text_len_sum", "n_src_buckets")
        .toPandas()
        .sort_values(["grid_ts", "role"], ignore_index=True)
    )
    p = transcripts_pdf[(transcripts_pdf["ts"] >= t0) & (transcripts_pdf["ts"] < t1)].copy()
    p["text_len"] = p["text"].str.len().fillna(0).astype("int64")
    p["grid_ts"] = p["ts"].dt.floor(f"{step}s")
    want = (
        p.groupby(["grid_ts", "role"])
        .agg(n_turns=("text_len", "size"), text_len_sum=("text_len", "sum"))
        .reset_index()
        .sort_values(["grid_ts", "role"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(
        got[["grid_ts", "role", "n_turns", "text_len_sum"]], want, check_dtype=False
    )
    # read amplification bounded by the tier fan-in per cell
    fan_in = {600: 10, 6 * 3600: 6, 86400: 1}[step]
    assert (got["n_src_buckets"] <= fan_in).all()


def test_range_eval_alignment_enforced(store):
    from mq_to_db_spark.plans.readpath import range_eval

    with pytest.raises(ValueError):
        # 6h step picks the 1h tier; t0 at :30 is not hour-aligned
        range_eval(store.tiers, datetime(2025, 1, 2, 0, 30), datetime(2025, 1, 4), 6 * 3600)


def test_query_range_facade(store, transcripts_pdf):
    t0, t1 = datetime(2025, 1, 2), datetime(2025, 1, 5)
    got = store.query_range(t0, t1, 86400).toPandas()
    p = transcripts_pdf[(transcripts_pdf["ts"] >= t0) & (transcripts_pdf["ts"] < t1)]
    assert got["n_turns"].sum() == len(p)
    assert len(got) == 3  # one point per day
