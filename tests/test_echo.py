"""Cross-turn repetition (operators/echo.py): bigram sets, same-role
lag pairing, overlap arithmetic vs a python-set replay, and the
one-window plan."""

from __future__ import annotations

import re

import pandas as pd

from mq_to_db_spark.operators.echo import turn_echo

ROWS = [
    # conv 1: assistant repeats itself verbatim at turn 3
    ("c1", 0, "user", "What is the Spark shuffle?"),
    ("c1", 1, "assistant", "The shuffle moves data between stages."),
    ("c1", 2, "user", "say that again please"),
    ("c1", 3, "assistant", "The shuffle moves data between stages."),
    ("c1", 4, "assistant", "It is expensive; avoid wide dependencies."),
    # conv 2: single-word turns (no bigrams), plus an empty text
    ("c2", 0, "user", "hello"),
    ("c2", 1, "user", "hello"),
    ("c2", 2, "assistant", ""),
    ("c2", 3, "assistant", "ok then"),
]


def _tok(t):
    return [x for x in re.split(r"[^a-z0-9]+", t.lower()) if x]


def _bigrams(t):
    ts = _tok(t)
    return {f"{a} {b}" for a, b in zip(ts, ts[1:])}


def _brute():
    want = {}
    by = {}
    for conv, idx, role, text in ROWS:
        by.setdefault((conv, role), []).append((idx, text))
    for (conv, role), turns in by.items():
        turns.sort()
        for (pi, pt), (ci, ct) in zip(turns, turns[1:]):
            a, b = _bigrams(ct), _bigrams(pt)
            i, u = len(a & b), len(a | b)
            want[(conv, ci)] = (
                role, len(a), len(b), i, u,
                round(i / u, 6) if u else 0.0,
                round(i / len(a), 6) if a else 0.0,
            )
    return want


def _df(spark):
    return spark.createDataFrame(
        pd.DataFrame(ROWS, columns=["conv_id", "turn_idx", "role", "text"])
    )


def test_matches_naive(spark):
    got = {
        (r.conv_id, r.turn_idx): (
            r.role, r.n_grams, r.n_prev_grams, r.n_common, r.n_union,
            r.jaccard, r.containment,
        )
        for r in turn_echo(_df(spark)).collect()
    }
    assert got == _brute()


def test_verbatim_repeat_is_full_echo(spark):
    got = {(r.conv_id, r.turn_idx): r for r in turn_echo(_df(spark)).collect()}
    r = got[("c1", 3)]
    assert r.jaccard == 1.0 and r.containment == 1.0
    # first turn of each (conv, role) emits nothing
    assert ("c1", 0) not in got and ("c1", 1) not in got


def test_empty_and_single_token_turns(spark):
    got = {(r.conv_id, r.turn_idx): r for r in turn_echo(_df(spark)).collect()}
    r = got[("c2", 1)]  # "hello" vs "hello": zero bigrams each
    assert (r.n_grams, r.n_prev_grams, r.jaccard, r.containment) == (0, 0, 0.0, 0.0)
    r = got[("c2", 3)]  # "ok then" vs "": one bigram vs none
    assert (r.n_grams, r.n_common, r.containment) == (1, 0, 0.0)


def test_plan_one_window_no_self_join(spark):
    plan = (
        turn_echo(_df(spark))._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Window") == 1, plan
    assert "Join" not in plan, plan
    assert "PythonUDF" not in plan, plan
