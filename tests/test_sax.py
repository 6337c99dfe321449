"""SAX words vs a numpy fixed-order replay; degenerate + plan checks."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mq_to_db_spark.operators.sax import BREAK, sax_words


@pytest.fixture(scope="module")
def hourly(spark):
    rng = np.random.default_rng(7)
    hours = pd.date_range("2024-03-01", periods=4 * 24, freq="h")
    rows = []
    for k in ("a", "b"):
        for t in hours:
            s = int(rng.integers(-500, 5000))
            rows.append((k, t.to_pydatetime(), s, int(rng.integers(1, 9))))
    # a degenerate all-equal day for key 'flat'
    for t in hours[:24]:
        rows.append(("flat", t.to_pydatetime(), 700, 7))
    return spark.createDataFrame(
        rows, "k string, bucket_start timestamp, sum_cents long, n long"
    )


def test_matches_numpy_fixed_order_fold(spark, hourly):
    got = {
        (r["k"], r["window_start"]): (r["sax_word"], r["n_buckets"])
        for r in sax_words(hourly, ["k"]).collect()
    }
    pdf = hourly.toPandas()
    pdf["day"] = pdf["bucket_start"].dt.floor("D")
    for (k, day), grp in pdf.groupby(["k", "day"]):
        grp = grp.sort_values("bucket_start")
        vals = (grp["sum_cents"] / grp["n"]).to_numpy()
        acc = 0.0
        for x in vals:
            acc += x
        m = acc / len(vals)
        acc2 = 0.0
        for x in vals:
            acc2 += (x - m) * (x - m)
        sd = math.sqrt(acc2 / len(vals))
        word = "".join(
            "a" if x < m - BREAK * sd
            else "b" if x < m
            else "c" if x < m + BREAK * sd
            else "d"
            for x in vals
        )
        assert got[(k, day.to_pydatetime())] == (word, len(vals)), (k, day)


def test_degenerate_flat_day_is_all_d(spark, hourly):
    r = (
        sax_words(hourly.where(F.col("k") == "flat"), ["k"])
        .collect()
    )
    assert len(r) == 1 and r[0]["sax_word"] == "d" * 24


def test_word_length_matches_buckets(spark, hourly):
    for r in sax_words(hourly, ["k"]).collect():
        assert len(r["sax_word"]) == r["n_buckets"]


def test_sax_word_feeds_cep_motif_search(spark, hourly):
    # the SAX alphabet is CEP's symbol alphabet: find "deep-low run
    # then an immediate top-band spike" motifs (a{2,}d) inside each
    # day's word by exploding the word back to per-bucket symbols
    from mq_to_db_spark.operators.cep import match_pattern

    words = sax_words(hourly, ["k"])
    ev = words.select(
        "k",
        "window_start",
        F.posexplode(F.split(F.col("sax_word"), "(?!^)")),
    ).select(
        F.concat_ws("/", "k", F.col("window_start").cast("string")).alias(
            "conv_id"
        ),
        F.col("pos").alias("turn_idx"),
        F.col("col").alias("sym"),
        F.timestamp_seconds(F.col("pos") * 3600).alias("ts"),
    )
    motifs = match_pattern(ev, "a{2,}d", ["conv_id"])
    rows = motifs.collect()
    # replay on the words themselves
    import re

    expected = sum(
        len(re.findall("a{2,}d", r["sax_word"])) for r in words.collect()
    )
    assert len(rows) == expected
    for r in rows:
        assert re.fullmatch("a+d", r["match_syms"])


def test_plan_single_shuffle_no_python(spark, hourly):
    plan = (
        sax_words(hourly, ["k"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") <= 2
    for marker in ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas"):
        assert marker not in plan
