"""Zipf rank-frequency fit (operators/ranking.py zipf_fit): regression
vs numpy lstsq on a corpus with planted frequencies, integer surfaces,
and the TakeOrdered plan."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from mq_to_db_spark.operators.ranking import zipf_fit


def _planted_corpus(spark):
    """Token i (of 30) appears ceil(1000 / (i+1)) times -> slope ~= -1."""
    freqs = [math.ceil(1000 / (i + 1)) for i in range(30)]
    words = []
    for i, f in enumerate(freqs):
        words += [f"w{i:02d}"] * f
    # spread over a few documents (fit is corpus-global, split arbitrary)
    docs = [" ".join(words[j::7]) for j in range(7)]
    return (
        spark.createDataFrame(
            pd.DataFrame({"doc_id": range(7), "text": docs})
        ),
        freqs,
    )


def test_matches_numpy_lstsq(spark):
    df, freqs = _planted_corpus(spark)
    got = zipf_fit(df, top_n=30).first()
    x = np.log(np.arange(1, 31, dtype=float))
    y = np.log(np.array(sorted(freqs, reverse=True), dtype=float))
    slope, intercept = np.polyfit(x, y, 1)
    r = np.corrcoef(x, y)[0, 1]
    assert abs(got.zipf_slope - slope) < 1e-6
    assert abs(got.intercept - intercept) < 1e-6
    assert abs(got.r2 - r * r) < 1e-6
    assert -1.1 < got.zipf_slope < -0.9  # planted ~1/rank law


def test_integer_surfaces(spark):
    df, freqs = _planted_corpus(spark)
    got = zipf_fit(df, top_n=30).first()
    assert got.vocab_size == 30
    assert got.total_tokens == sum(freqs)
    assert got.n_fit == 30
    assert got.top_token == "w00" and got.top_freq == 1000


def test_top_n_caps_and_tie_order(spark):
    # 5 tokens, all frequency 2: rank ties break by token asc
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": ["e d c b a a b c d e"]})
    )
    got = zipf_fit(df, top_n=3).first()
    assert got.n_fit == 3 and got.vocab_size == 5
    assert got.top_token == "a"
    assert got.zipf_slope == 0.0  # flat frequencies -> zero slope


def test_plan_take_ordered_not_global_sort(spark):
    df, _ = _planted_corpus(spark)
    plan = zipf_fit(df, top_n=30)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    assert "PythonUDF" not in plan, plan


# ------------------------------------------------------------------ OOV


def test_oov_matches_naive(spark):
    import re

    from mq_to_db_spark.operators.ranking import oov_stats

    texts = {
        1: "alpha beta alpha gamma",
        2: "alpha zzz qqq",
        3: "",
        4: "beta beta beta",
    }
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    )
    from collections import Counter

    c = Counter(
        t for s in texts.values() for t in re.split(r"[^a-z0-9]+", s.lower()) if t
    )
    top2 = [t for t, _ in sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:2]]
    got = {
        r.doc_id: (r.n_tokens, r.n_oov, r.oov_rate)
        for r in oov_stats(df, top_v=2).collect()
    }
    for i, s in texts.items():
        toks = [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]
        oov = sum(1 for t in toks if t not in top2)
        want = (
            len(toks), oov,
            round(oov / len(toks), 6) if toks else None,
        )
        assert got[i] == want, (i, got[i], want)


def test_oov_zero_shuffle_scan(spark):
    from mq_to_db_spark.operators.ranking import oov_stats

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["a b c", "c d e"]})
    )
    plan = (
        oov_stats(df, top_v=3)._jdf.queryExecution().executedPlan().toString()
    )
    # the scoring pass itself: pure projection, no exchange, no join
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan


# ------------------------------------------------------------------ Heaps


def test_heaps_matches_naive(spark):
    import re

    from mq_to_db_spark.operators.ranking import heaps_curve

    texts = {
        1: "alpha beta alpha",
        2: "beta gamma",
        3: "",
        4: "alpha delta delta epsilon",
        5: "zeta",
    }
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    )
    got = {
        r.doc_id: (r.n_tokens, r.cum_tokens, r.new_types, r.cum_types)
        for r in heaps_curve(df).collect()
    }
    seen: set = set()
    cum_t = 0
    for i in sorted(texts):
        toks = [t for t in re.split(r"[^a-z0-9]+", texts[i].lower()) if t]
        new = {t for t in toks if t not in seen}
        cum_t += len(toks)
        seen |= new
        assert got[i] == (len(toks), cum_t, len(new), len(seen)), (i, got[i])


def test_heaps_monotone_and_bounded(spark):
    from mq_to_db_spark.operators.ranking import heaps_curve

    docs = [(i, " ".join(f"w{(i * 7 + j) % 23}" for j in range(6))) for i in range(40)]
    df = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"]))
    rows = sorted(heaps_curve(df).collect(), key=lambda r: r.doc_id)
    cts = [r.cum_types for r in rows]
    assert cts == sorted(cts)
    assert cts[-1] == 23  # vocabulary saturates at the 23 planted types
    assert rows[-1].cum_tokens == 240
