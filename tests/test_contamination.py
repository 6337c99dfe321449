"""Train/eval decontamination (operators/contamination.py): planted
n-gram leaks are found with the right DISTINCT hit counts, clean docs
survive, short-doc whole-text semantics hold, and the corpus-side probe
is a broadcast semi join (zero corpus shuffle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mq_to_db_spark.operators.contamination import (
    contamination_hits,
    decontaminate,
    eval_ngram_set,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


_EVAL = [
    (100, "alpha bravo charlie delta echo foxtrot golf hotel india juliet"),
    (101, "tiny doc"),  # 2 words < n: whole-text shingle
]

_CORPUS = [
    # 5-word span from eval doc 100 → 2 distinct shared 4-grams
    (1, "intro words then charlie delta echo foxtrot golf and some tail"),
    # repeats ONE leaked 4-gram twice → still exactly 1 distinct hit
    (2, "alpha bravo charlie delta padding x alpha bravo charlie delta y"),
    (3, "completely unrelated clean text with no overlap whatsoever here"),
    (4, "tiny doc"),  # short-short exact match via whole-text shingle
    (5, "tiny"),      # prefix of a short eval doc: must NOT match
]


def _dfs(spark):
    corpus = spark.createDataFrame(_CORPUS, "doc_id long, text string")
    eval_df = spark.createDataFrame(_EVAL, "doc_id long, text string")
    return corpus, eval_df


def test_contamination_hits_counts(spark):
    corpus, eval_df = _dfs(spark)
    got = {
        r.id: r.n_hits
        for r in contamination_hits(corpus, eval_df, n=4).collect()
    }
    assert got == {1: 2, 2: 1, 4: 1}


def test_decontaminate_thresholds(spark):
    corpus, eval_df = _dfs(spark)
    kept1 = {r.doc_id for r in decontaminate(corpus, eval_df, n=4).collect()}
    assert kept1 == {3, 5}
    # min_hits=2: only the 2-distinct-ngram doc is dropped
    kept2 = {
        r.doc_id
        for r in decontaminate(corpus, eval_df, n=4, min_hits=2).collect()
    }
    assert kept2 == {2, 3, 4, 5}


def test_eval_set_is_distinct_hashes(spark):
    _, eval_df = _dfs(spark)
    s = eval_ngram_set(eval_df, "doc_id", "text", n=4)
    assert s.columns == ["ngram"]
    assert dict(s.dtypes)["ngram"] == "bigint"
    n = s.count()
    # doc 100: 10 words → 7 distinct 4-grams; doc 101: 1 whole-text shingle
    assert n == 8


def test_probe_is_broadcast_semi_join(spark):
    corpus, eval_df = _dfs(spark)
    plan = _plan(contamination_hits(corpus, eval_df, n=4))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan
    # shuffle-hash fallback for multi-GB eval sets
    plan2 = _plan(contamination_hits(corpus, eval_df, n=4, broadcast_eval=False))
    assert "LeftSemi" in plan2, plan2
