"""CEP pattern matching vs a ``re.finditer`` replay (oracle-style)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from mq_to_db_spark.operators.cep import match_pattern, symbolize


def _df(spark, seqs: dict[str, str]):
    rows = [
        (k, i, c) for k, s in seqs.items() for i, c in enumerate(s)
    ]
    return (
        spark.createDataFrame(rows, "conv_id string, turn_idx int, sym string")
        .withColumn("ts", F.timestamp_seconds(F.col("turn_idx") * 60))
    )


def _expected(seqs: dict[str, str], pattern: str):
    out = []
    for k in sorted(seqs):
        for i, m in enumerate(re.finditer(pattern, seqs[k]), start=1):
            out.append(
                (k, i, m.group(0), len(m.group(0)), m.start(), m.end() - 1)
            )
    return out


PATTERNS = ["vc*p", "e+", "uv(cv)*p", "sc{2,}"]
SEQS = {
    "a": "cvccpevcpvpx",
    "b": "vcp",
    "c": "eeevecveee",
    "d": "uvcvcvpsccc",
    "e": "x",
    "f": "p",
}


@pytest.mark.parametrize("pattern", PATTERNS)
def test_matches_re_finditer(spark, pattern):
    got = [
        (
            r["conv_id"],
            r["match_seq"],
            r["match_syms"],
            r["n_events"],
            r["start_turn_idx"],
            r["end_turn_idx"],
        )
        for r in match_pattern(_df(spark, SEQS), pattern, ["conv_id"])
        .orderBy("conv_id", "match_seq")
        .collect()
    ]
    assert got == _expected(SEQS, pattern)


def test_timestamps_map_to_match_endpoints(spark):
    out = match_pattern(_df(spark, {"a": "cvcp"}), "vc*p", ["conv_id"]).collect()
    assert len(out) == 1
    r = out[0]
    assert r["start_ts"].minute == 1 and r["end_ts"].minute == 3


def test_non_overlapping_greedy(spark):
    # greedy: 'vcccp' consumed whole, not split; non-overlap: second
    # 'v' inside a match never starts a new one
    out = match_pattern(_df(spark, {"a": "vcvcp"}), "vc*p", ["conv_id"]).collect()
    assert [(r["match_syms"], r["start_turn_idx"]) for r in out] == [("vcp", 2)]


def test_no_match_keys_absent(spark):
    out = match_pattern(_df(spark, {"a": "xxx", "b": "vp"}), "vc*p", ["conv_id"])
    assert [r["conv_id"] for r in out.collect()] == ["b"]


def test_symbolize_when_chain(spark):
    df = spark.createDataFrame(
        [("view",), ("click",), ("purchase",), ("weird",)], "role string"
    ).select(
        symbolize({"view": "v", "click": "c", "purchase": "p"}, "role").alias("s")
    )
    assert [r["s"] for r in df.collect()] == ["v", "c", "p", "."]


def test_symbolize_rejects_multichar():
    with pytest.raises(ValueError):
        symbolize({"view": "vv"}, "role")


def test_plan_is_single_shuffle_no_python(spark):
    df = _df(spark, SEQS)
    plan = match_pattern(df, "vc*p", ["conv_id"])._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan
    assert plan.count("Exchange") <= 2  # partial+final agg of ONE groupBy
    for marker in ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas"):
        assert marker not in plan
