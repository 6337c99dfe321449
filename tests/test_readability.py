"""Flesch readability (functions/text.py): the three integer counts and
the score vs hand-computed values, degenerate inputs, and pure-codegen
plan."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from mq_to_db_spark.functions.text import (
    flesch_reading_ease,
    readability_counts,
)


def _score(words, sentences, syllables):
    return 206.835 - 1.015 * (words / sentences) - 84.6 * (syllables / words)


def test_counts(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "t": [
                    "The cat sat. The dog ran!",     # 6 words, 2 sentences
                    "no terminator here",             # fragment -> 1 sentence
                    "Hmm... what?! Right.",           # runs collapse: 3
                    "",                               # nothing
                    None,
                ]
            }
        )
    )
    k = readability_counts("t")
    got = df.select(
        k["n_words"].alias("w"),
        k["n_sentences"].alias("s"),
        k["n_syllables"].alias("y"),
    ).collect()
    assert (got[0].w, got[0].s) == (6, 2)
    assert (got[1].w, got[1].s) == (3, 1)
    assert (got[2].w, got[2].s) == (3, 3)
    assert (got[3].w, got[3].s, got[3].y) == (0, 0, 0)
    assert (got[4].w, got[4].s, got[4].y) == (0, 0, 0)


def test_syllable_floor_per_word(spark):
    # "rhythm" has no aeiouy-group except 'y'; "tsk tsk" has none at all
    df = spark.createDataFrame(pd.DataFrame({"t": ["tsk tsk psst"]}))
    k = readability_counts("t")
    got = df.select(k["n_words"], k["n_syllables"]).first()
    assert got[0] == 3 and got[1] == 3  # floor: >= one syllable per word


def test_flesch_value(spark):
    # "The cat sat on the mat." -> 6 words, 1 sentence, 6 vowel groups
    df = spark.createDataFrame(pd.DataFrame({"t": ["The cat sat on the mat."]}))
    got = df.select(F.round(flesch_reading_ease("t"), 6).alias("f")).first().f
    assert got == round(_score(6, 1, 6), 6)
    # easy prose scores high
    assert got > 100


def test_flesch_null_on_wordless(spark):
    df = spark.createDataFrame(pd.DataFrame({"t": ["", "?!?", None]}))
    got = [r[0] for r in df.select(flesch_reading_ease("t")).collect()]
    assert got == [None, None, None]


def test_plan_no_udf(spark):
    df = spark.createDataFrame(pd.DataFrame({"t": ["a b c."]}))
    plan = (
        df.select(flesch_reading_ease("t"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PythonUDF" not in plan, plan
