"""Recording-rule DAG evaluator (plans/rules.py)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mq_to_db_spark.plans.rules import Rule, evaluate_rules


@pytest.fixture()
def base(spark):
    return {
        "t": spark.createDataFrame(
            [("a", 1), ("a", 2), ("b", 3)], "k string, v long"
        )
    }


def test_chain_and_fanout(spark, base):
    rules = [
        Rule("per_k", lambda e: e["t"].groupBy("k").agg(F.sum("v").alias("s"))),
        Rule(
            "total",
            lambda e: e["per_k"].agg(F.sum("s").alias("total")),
            deps=("per_k",),
        ),
        Rule(
            "share",
            lambda e: e["per_k"].crossJoin(e["total"]).select(
                "k", (F.col("s") / F.col("total")).alias("share")
            ),
            deps=("per_k", "total"),
        ),
    ]
    out = evaluate_rules(base, rules)
    assert set(out) == {"per_k", "total", "share"}
    shares = {r["k"]: r["share"] for r in out["share"].collect()}
    assert shares == {"a": 0.5, "b": 0.5}
    # fan-out node (per_k feeds total AND share) got persisted
    assert out["per_k"].storageLevel.useMemory
    assert not out["share"].storageLevel.useMemory
    out["per_k"].unpersist()


def test_order_independent_of_declaration(base):
    # declared reverse of dependency order — topo sort fixes it
    rules = [
        Rule("b", lambda e: e["a"].select("k"), deps=("a",)),
        Rule("a", lambda e: e["t"]),
    ]
    out = evaluate_rules(base, rules, persist_shared=False)
    assert out["b"].columns == ["k"]


def test_cycle_unknown_duplicate_shadow(base):
    with pytest.raises(ValueError, match="cycle"):
        evaluate_rules(
            base,
            [
                Rule("x", lambda e: e["y"], deps=("y",)),
                Rule("y", lambda e: e["x"], deps=("x",)),
            ],
        )
    with pytest.raises(ValueError, match="unknown rule"):
        evaluate_rules(base, [Rule("x", lambda e: e["t"], deps=("nope",))])
    with pytest.raises(ValueError, match="duplicate"):
        evaluate_rules(
            base, [Rule("x", lambda e: e["t"]), Rule("x", lambda e: e["t"])]
        )
    with pytest.raises(ValueError, match="shadow"):
        evaluate_rules(base, [Rule("t", lambda e: e["t"])])


def test_non_dataframe_result_raises(base):
    with pytest.raises(TypeError, match="not DataFrame"):
        evaluate_rules(base, [Rule("x", lambda e: 42)])


def test_lazy_fusion_pushes_filters_through_rules(spark, base):
    """A downstream filter reaches the base scan: rules are logical
    plans, not materializations."""
    rules = [
        Rule("wide", lambda e: e["t"].select("k", "v", (F.col("v") * 2).alias("v2"))),
        Rule("narrow", lambda e: e["wide"].where(F.col("k") == "a").select("k"), deps=("wide",)),
    ]
    out = evaluate_rules(base, rules, persist_shared=False)
    plan = out["narrow"]._jdf.queryExecution().optimizedPlan().toString()
    # column pruning: v/v2 are gone from the optimized scan of rule "wide"
    assert "v2" not in plan
