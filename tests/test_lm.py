"""Corpus bigram-LM self-perplexity (operators/lm.py): counts, add-one
probabilities, position-ordered fold, and the plan shape (map-side
combined counts, no Python UDF)."""

from __future__ import annotations

import math
import re

import pandas as pd

from mq_to_db_spark.operators.lm import bigram_lm_scores, bigram_pairs

DOCS = [
    (1, "The cat sat on the mat. The cat sat."),
    (2, "the dog ran"),
    (3, "cat cat cat"),
    (4, ""),            # empty -> dropped
    (5, "!!! ???"),     # tokenizes to nothing -> dropped
    (6, "zebra"),       # single token: one (<s>, zebra) bigram
]


def _tok(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _brute() -> dict[int, tuple]:
    toks = {i: _tok(t) for i, t in DOCS}
    toks = {i: t for i, t in toks.items() if t}
    bc: dict[tuple, int] = {}
    for t in toks.values():
        for h, w in zip(["<s>"] + t[:-1], t):
            bc[(h, w)] = bc.get((h, w), 0) + 1
    hc: dict[str, int] = {}
    for (h, _w), c in bc.items():
        hc[h] = hc.get(h, 0) + c
    v = len({w for (_h, w) in bc})
    want = {}
    for i, t in toks.items():
        lp = 0.0
        csum = 0
        nsing = 0
        for h, w in zip(["<s>"] + t[:-1], t):
            c = bc[(h, w)]
            csum += c
            nsing += c == 1
            lp = lp + (math.log(c + 1) - math.log(hc[h] + v))
        want[i] = (
            len(t), csum, nsing, round(lp, 6),
            round(math.exp(-lp / len(t)), 6),
        )
    return want


def _df(spark):
    return spark.createDataFrame(
        pd.DataFrame(DOCS, columns=["doc_id", "text"])
    )


def test_bigram_pairs_positions_and_history(spark):
    rows = bigram_pairs(_df(spark)).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.pos, r.h, r.w))
    assert 4 not in by_doc and 5 not in by_doc
    assert sorted(by_doc[6]) == [(1, "<s>", "zebra")]
    assert sorted(by_doc[2]) == [(1, "<s>", "the"), (2, "the", "dog"), (3, "dog", "ran")]
    # positions are a contiguous 1..n run per doc
    for doc, triples in by_doc.items():
        assert sorted(p for p, _h, _w in triples) == list(
            range(1, len(triples) + 1)
        ), doc


def test_scores_match_naive(spark):
    got = {
        r.doc_id: (r.n_tokens, r.bigram_c_sum, r.n_singletons, r.logprob, r.ppl)
        for r in bigram_lm_scores(_df(spark)).collect()
    }
    assert got == _brute()


def test_repetitive_doc_scores_lower_ppl_than_rare(spark):
    got = {r.doc_id: r.ppl for r in bigram_lm_scores(_df(spark)).collect()}
    # "cat cat cat" repeats a corpus-frequent token; "zebra" is a
    # singleton behind the high-entropy <s> history
    assert got[3] < got[6]


def test_plan_no_python_udf(spark):
    plan = (
        bigram_lm_scores(_df(spark))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PythonUDF" not in plan, plan
