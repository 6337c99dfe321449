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


# ------------------------------------------------------------------ bloom


def test_bloom_no_false_negatives(spark):
    import pandas as pd

    from mq_to_db_spark.operators.contamination import bloom_build, bloom_member

    keys = [f"key-{i}" for i in range(300)]
    eval_df = spark.createDataFrame(pd.DataFrame({"k": keys[:100]}))
    corpus = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(300), "k": keys})
    )
    bloom = bloom_build(eval_df, "k", m_bits=1 << 14, k=4)
    out = bloom_member(corpus, "k", bloom, ["doc_id"], m_bits=1 << 14, k=4)
    got = {r.doc_id: r.bloom_hit for r in out.collect()}
    # every eval member MUST hit (a bloom never false-negatives)
    assert all(got[i] for i in range(100))
    # at m=16384 bits for 100 keys the fp rate is ~0: the rest miss
    misses = sum(not got[i] for i in range(100, 300))
    assert misses >= 195, misses


def test_bloom_fp_rate_by_design(spark):
    import pandas as pd

    from mq_to_db_spark.operators.contamination import bloom_build, bloom_member

    eval_df = spark.createDataFrame(
        pd.DataFrame({"k": [f"e{i}" for i in range(200)]})
    )
    probe = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(2000), "k": [f"p{i}" for i in range(2000)]})
    )
    m, kk = 1 << 11, 4  # deliberately tight: measurable fp rate
    bloom = bloom_build(eval_df, "k", m_bits=m, k=kk)
    out = bloom_member(probe, "k", bloom, ["doc_id"], m_bits=m, k=kk)
    fpr = out.where("bloom_hit").count() / 2000
    # theoretical fpr = (1 - exp(-kn/m))^k ~ (0.32)^4 ~ 1.1%
    assert 0.001 < fpr < 0.05, fpr


def test_bloom_word_packing_positive_masks(spark):
    import pandas as pd

    from mq_to_db_spark.operators.contamination import bloom_build

    eval_df = spark.createDataFrame(
        pd.DataFrame({"k": [f"x{i}" for i in range(500)]})
    )
    rows = bloom_build(eval_df, "k", m_bits=630, k=3).collect()
    assert all(r.bits > 0 for r in rows)          # bit 63 never used
    assert all(0 <= r.word <= 10 for r in rows)   # 630 bits / 63 = 10 words


def test_bloom_member_plan_broadcast(spark):
    import pandas as pd

    from mq_to_db_spark.operators.contamination import bloom_build, bloom_member

    eval_df = spark.createDataFrame(pd.DataFrame({"k": ["a", "b"]}))
    corpus = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3], "k": ["a", "x", "y"]})
    )
    bloom = bloom_build(eval_df, "k")
    plan = _plan(bloom_member(corpus, "k", bloom, ["doc_id"]))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
