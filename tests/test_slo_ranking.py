"""SLO burn rates and BM25 ranking vs brute-force replays."""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mq_to_db_spark.operators.ranking import bm25_scores, bm25_topk, idf_table
from mq_to_db_spark.operators.slo import burn_rate, error_ratio_tier, slo_burn

# ---------------------------------------------------------------- SLO


@pytest.fixture(scope="module")
def outcomes_pdf() -> pd.DataFrame:
    """Per-minute outcome events for 2 services over 3 days; service b
    has a 2h error storm to trip the multiwindow alert."""
    rng = np.random.default_rng(7)
    ts = pd.date_range("2024-05-01", periods=3 * 24 * 60, freq="min")
    rows = []
    for svc in ("a", "b"):
        for t in ts:
            n = int(rng.integers(1, 4))
            for _ in range(n):
                storm = (
                    svc == "b"
                    and pd.Timestamp("2024-05-02 10:00") <= t
                    < pd.Timestamp("2024-05-02 12:00")
                )
                bad = bool(rng.random() < (0.5 if storm else 0.001))
                rows.append({"svc": svc, "ts": t, "bad": bad})
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def outcomes(spark, outcomes_pdf):
    df = spark.createDataFrame(outcomes_pdf).cache()
    df.count()
    return df


def _brute_tier(pdf: pd.DataFrame) -> pd.DataFrame:
    p = pdf.copy()
    p["bucket_start"] = p.ts.dt.floor("h")
    g = p.groupby(["svc", "bucket_start"])
    out = g.agg(n_total=("bad", "size"), n_bad=("bad", "sum")).reset_index()
    out["n_bad"] = out.n_bad.astype("int64")
    return out


def _round_half_up(x: float, digits: int = 6) -> float:
    # Spark's round() is HALF_UP; Python's built-in round() is
    # banker's, which differs on exact ties (e.g. 1/128 at 6 digits).
    import math

    scaled = x * 10**digits
    return math.floor(scaled + 0.5) / 10**digits


def _brute_burn(tier: pd.DataFrame, windows, slo_target, threshold):
    tier = tier.sort_values(["svc", "bucket_start"]).reset_index(drop=True)
    budget = 1.0 - slo_target
    recs = []
    for _, row in tier.iterrows():
        rec = dict(row)
        burns = []
        for name, span in windows.items():
            lo = row.bucket_start - pd.Timedelta(seconds=span - 1)
            w = tier[
                (tier.svc == row.svc)
                & (tier.bucket_start >= lo)
                & (tier.bucket_start <= row.bucket_start)
            ]
            ratio = w.n_bad.sum() / w.n_total.sum()
            rec[f"ratio_{name}"] = _round_half_up(ratio)
            rec[f"burn_{name}"] = _round_half_up(ratio / budget)
            burns.append(ratio / budget)
        rec["alert"] = all(x >= threshold for x in burns)
        recs.append(rec)
    return pd.DataFrame(recs)


WINDOWS = {"1h": 3600, "6h": 6 * 3600}


def test_slo_burn_matches_brute(outcomes, outcomes_pdf):
    got = (
        slo_burn(
            outcomes,
            ["svc"],
            bad=F.col("bad"),
            windows=WINDOWS,
            slo_target=0.99,
            threshold=10.0,
        )
        .toPandas()
        .sort_values(["svc", "bucket_start"])
        .reset_index(drop=True)
    )
    want = _brute_burn(_brute_tier(outcomes_pdf), WINDOWS, 0.99, 10.0)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)],
        want[sorted(want.columns)],
        check_dtype=False,
    )


def test_alert_fires_only_in_storm(outcomes):
    got = slo_burn(
        outcomes,
        ["svc"],
        bad=F.col("bad"),
        windows=WINDOWS,
        slo_target=0.99,
        threshold=10.0,
    ).toPandas()
    alerts = got[got.alert]
    assert not alerts.empty
    assert set(alerts.svc) == {"b"}
    # the multiwindow AND delays the page until the 6h window confirms
    # (storm hour 2) and silences it the moment the 1h window recovers
    assert alerts.bucket_start.tolist() == [pd.Timestamp("2024-05-02 11:00")]


def test_window_gap_does_not_stretch_range(spark):
    """A missing bucket contributes nothing; the RANGE frame is time-
    bounded, so a 2-bucket window NEVER sees a value older than its
    span (a ROWS frame would)."""
    pdf = pd.DataFrame(
        {
            "bucket_start": pd.to_datetime(
                ["2024-01-01 00:00", "2024-01-01 01:00", "2024-01-01 05:00"]
            ),
            "n_total": [100, 100, 100],
            "n_bad": [100, 0, 0],
        }
    )
    got = burn_rate(
        spark.createDataFrame(pdf),
        [],
        {"2h": 7200},
        slo_target=0.9,
        threshold=1.0,
    ).toPandas().sort_values("bucket_start").reset_index(drop=True)
    assert got.ratio_2h.tolist() == [1.0, 0.5, 0.0]
    assert got.alert.tolist() == [True, True, False]


def test_tier_counts_exact(outcomes, outcomes_pdf):
    got = (
        error_ratio_tier(outcomes, ["svc"], bad=F.col("bad"))
        .toPandas()
        .sort_values(["svc", "bucket_start"])
        .reset_index(drop=True)
    )
    want = _brute_tier(outcomes_pdf)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False
    )


def test_burn_validations(spark, outcomes):
    with pytest.raises(ValueError, match="at least one"):
        burn_rate(outcomes.limit(1), [], {})
    with pytest.raises(ValueError, match="slo_target"):
        slo_burn(outcomes, [], bad=F.col("bad"), slo_target=1.0)
    with pytest.raises(ValueError, match="multiple of tier"):
        slo_burn(outcomes, [], bad=F.col("bad"), windows={"90m": 5400})


# --------------------------------------------------------------- BM25


@pytest.fixture(scope="module")
def docs_pdf() -> pd.DataFrame:
    texts = [
        "spark shuffles the hash join build side",  # both terms
        "spark spark spark is fast",  # high tf, short
        "the join key is skewed; salt the join key",  # join only
        "nothing relevant here at all",  # no terms
        "spark! JOIN, Spark? join...",  # punctuation + case folding
        "a very long document about spark " + "padding word " * 50,
    ]
    return pd.DataFrame({"doc_id": range(len(texts)), "text": texts})


@pytest.fixture(scope="module")
def docs(spark, docs_pdf):
    df = spark.createDataFrame(docs_pdf).cache()
    df.count()
    return df


def _brute_bm25(pdf, terms, k1=1.2, b=0.75):
    toks = [
        [w for w in re.split("[^a-z0-9]+", t.lower()) if w] for t in pdf.text
    ]
    dls = [len(t) for t in toks]
    n = len(toks)
    avgdl = sum(dls) / n
    dfs = {t: sum(1 for d in toks if t in d) for t in terms}
    idf = idf_table(n, dfs)
    out = []
    for did, d, dl in zip(pdf.doc_id, toks, dls):
        score = 0.0
        for t in terms:  # fixed term order, like the operator
            tf = d.count(t)
            score += idf[t] * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
        out.append({"doc_id": did, "dl": dl, "score": score})
    return pd.DataFrame(out)


def test_bm25_scores_match_brute(docs, docs_pdf):
    terms = ["spark", "join"]
    got = bm25_scores(docs, terms).toPandas().sort_values("doc_id")
    want = _brute_bm25(docs_pdf, terms).sort_values("doc_id")
    np.testing.assert_allclose(got._score_raw, want.score, rtol=1e-12)
    assert got.dl.tolist() == want.dl.tolist()


def test_bm25_topk_order_and_tiebreak(docs, docs_pdf):
    terms = ["spark", "join"]
    got = bm25_topk(docs, terms, k=3).toPandas()
    want = _brute_bm25(docs_pdf, terms)
    want = want[want.score > 0].sort_values(
        ["score", "doc_id"], ascending=[False, True]
    )
    assert got.doc_id.tolist() == want.doc_id.head(3).tolist()
    np.testing.assert_allclose(
        got.score, want.score.head(3).round(6), rtol=1e-12
    )


def test_bm25_tokenizer_punctuation(docs):
    got = bm25_scores(docs, ["spark"]).toPandas().set_index("doc_id")
    # "spark! JOIN, Spark? join..." -> 4 tokens, 2 sparks
    assert got.loc[4].dl == 4
    assert got.loc[4].tf_0 == 2


def test_bm25_zero_score_docs_dropped(docs):
    got = bm25_topk(docs, ["spark", "join"], k=10).toPandas()
    assert 3 not in set(got.doc_id)


def test_bm25_no_shuffle_plan(docs):
    """The corpus path must stay exchange-free: tf is an array
    expression, corpus stats a broadcast, top-k a TakeOrdered."""
    plan = bm25_topk(docs, ["spark", "join"], k=3)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange hashpartitioning" not in plan


def test_bm25_validations(docs):
    with pytest.raises(ValueError, match="non-empty"):
        bm25_scores(docs, [])
    with pytest.raises(ValueError, match="distinct"):
        bm25_scores(docs, ["a", "a"])


def test_top_k_with_others_sums_and_ranks(spark):
    from mq_to_db_spark.operators.topk import top_k_with_others

    tier = spark.createDataFrame(
        [("d1", "u1", 50), ("d1", "u2", 30), ("d1", "u3", 30),
         ("d1", "u4", 7), ("d1", "u5", 3),
         ("d2", "u1", 9)],
        "w string, key string, n long",
    )
    got = top_k_with_others(tier, ["w"], "key", "n", k=2).collect()
    d1 = sorted([(r.key, r.n, r.rank) for r in got if r.w == "d1"])
    # tie at 30 breaks by key asc → u2 in, u3 spills to others
    assert d1 == [("__others__", 40, 3), ("u1", 50, 1), ("u2", 30, 2)]
    # window totals preserved
    assert sum(n for _, n, _ in d1) == 120
    # a window with <= k keys emits no others row
    d2 = [(r.key, r.n, r.rank) for r in got if r.w == "d2"]
    assert d2 == [("u1", 9, 1)]


def test_apdex_hand_computed(spark):
    import datetime as dt

    from mq_to_db_spark.operators.slo import apdex_tier

    t0 = dt.datetime(2024, 1, 1, 10)
    rows = [
        ("svc", t0, 10.0),   # satisfied (== T counts satisfied: <=)
        ("svc", t0, 20.0),   # tolerating upper edge: > T, <= 4T
        ("svc", t0, 80.0),   # tolerating at exactly 4T
        ("svc", t0, 81.0),   # frustrated
        ("svc", t0, None),   # NULL latency -> frustrated
    ]
    out = apdex_tier(
        spark.createDataFrame(rows, "k string, ts timestamp, value double"),
        ["k"], latency_col="value", threshold=20.0, tier="1h",
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_total"], r["n_satisfied"], r["n_tolerating"]) == (5, 2, 1)
    assert r["apdex"] == 0.5  # (2 + 0.5) / 5


def test_apdex_validation_and_plan(spark):
    import datetime as dt

    import pytest

    from mq_to_db_spark.operators.slo import apdex_tier

    df = spark.createDataFrame(
        [("k", dt.datetime(2024, 1, 1), 1.0)], "k string, ts timestamp, value double"
    )
    with pytest.raises(ValueError, match="threshold"):
        apdex_tier(df, ["k"], threshold=0.0)
    plan = apdex_tier(df, ["k"])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1  # one hash-agg exchange, nothing else
