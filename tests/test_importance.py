"""DSIR importance-weighting plane (operators/importance.py)."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from mq_to_db_spark.operators.importance import (
    bucket_profile,
    dsir_log_weights,
    dsir_select,
    hashed_ngram_buckets,
    target_overlap_topk,
)


@pytest.fixture()
def docs(spark):
    rows = [
        (1, "the cat sat on the mat", "tgt"),
        (2, "the cat sat", "tgt"),
        (3, "the cat sat on the mat again and again", "raw"),
        (4, "completely different words entirely here", "raw"),
        (5, "one", "raw"),  # < 2 tokens: no bigrams
        (6, "", "raw"),  # empty: no tokens at all
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, grp string")


def test_ngram_bucket_counts(spark, docs):
    c = hashed_ngram_buckets(docs, buckets=1 << 20)
    per_doc = {r["doc_id"]: r["n"] for r in c.groupBy("doc_id").agg(F.sum("c").alias("n")).collect()}
    # doc 1: 6 tokens -> 5 bigrams; doc 5/6: none (absent)
    assert per_doc[1] == 5 and per_doc[2] == 2 and per_doc[3] == 8
    assert 5 not in per_doc and 6 not in per_doc
    # repeated bigram ("the cat" x1...) — "again and"/"and again": doc 3
    # has distinct rows per bucket with counts summing to 8
    with pytest.raises(ValueError, match="n must"):
        hashed_ngram_buckets(docs, n=0)
    with pytest.raises(ValueError, match="buckets"):
        hashed_ngram_buckets(docs, buckets=1)


def test_overlap_prefers_target_like_doc(spark, docs):
    target = docs.where(F.col("grp") == "tgt")
    raw = docs.where(F.col("grp") == "raw")
    top = target_overlap_topk(raw, target, k=10).collect()
    # doc 3 shares bigrams with the target; doc 4 shares none
    assert top[0]["doc_id"] == 3 and top[0]["overlap"] > 0
    assert all(r["doc_id"] != 4 for r in top)  # zero overlap -> inner join drops


def test_dsir_weights_match_numpy_replay(spark, docs):
    import numpy as np

    buckets = 512
    target = docs.where(F.col("grp") == "tgt")
    raw = docs.where(F.col("grp") == "raw")
    rc = hashed_ngram_buckets(raw, buckets=buckets)
    tp = bucket_profile(hashed_ngram_buckets(target, buckets=buckets))
    rp = bucket_profile(rc)
    got = {r["doc_id"]: r["log_w"] for r in dsir_log_weights(rc, tp, rp, buckets).collect()}

    rcp = rc.toPandas()
    tpp = tp.toPandas().set_index("bucket")["c_corpus"]
    rpp = rp.toPandas().set_index("bucket")["c_corpus"]
    nt, nr = int(tpp.sum()), int(rpp.sum())
    ct = rcp["bucket"].map(tpp).fillna(0) + 1
    cr = rcp["bucket"].map(rpp).fillna(0) + 1
    rcp["term"] = rcp["c"] * (np.log(ct / (nt + buckets)) - np.log(cr / (nr + buckets)))
    want = rcp.groupby("doc_id")["term"].sum()
    for d, w in got.items():
        assert math.isclose(w, want[d], abs_tol=1e-12)
    # target-like doc 3 outweighs off-target doc 4
    assert got[3] > got[4]


def test_gumbel_select_deterministic_and_weight_sensitive(spark):
    w = spark.createDataFrame(
        [(i, 0.0 if i else 50.0) for i in range(40)], "doc_id long, log_w double"
    )
    a = sorted(r["doc_id"] for r in dsir_select(w, 10, seed=99).collect())
    b = sorted(r["doc_id"] for r in dsir_select(w, 10, seed=99).collect())
    assert a == b  # deterministic in (seed, id)
    assert 0 in a  # log_w = 50 dominates any Gumbel noise
    c = sorted(r["doc_id"] for r in dsir_select(w, 10, seed=7).collect())
    assert a != c  # different seed, different sample (overwhelmingly)
    with pytest.raises(ValueError, match="k must"):
        dsir_select(w, 0)


def test_plan_shapes(spark, docs):
    # bucket join is broadcast; the token strings never reach an exchange
    target = docs.where(F.col("grp") == "tgt")
    raw = docs.where(F.col("grp") == "raw")
    plan = (
        target_overlap_topk(raw, target, k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan  # top-k, no global sort
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
