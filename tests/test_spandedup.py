"""Intra-document repeated-span removal (operators/spandedup.py)."""

from __future__ import annotations

import duckdb
import pytest

from mq_to_db_spark.operators.spandedup import dedup_spans


@pytest.fixture()
def docs(spark):
    rows = [
        # "x y z w" recurs at token 9 (plus the overlapping follow-on
        # starts): tokens 9..14 are covered, "q" survives
        (1, "x y z w a b c d x y z w a b q"),
        # shorter than the window: untouched
        (2, "one two three"),
        # period-4 repetition: only the first period survives
        (3, "p q r s p q r s p q r s"),
        # no repeats at all
        (4, "all eight tokens here are fully distinct words"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_semantics_window4(docs):
    out = {
        r["doc_id"]: (r["text_dedup"], r["n_tokens"], r["n_removed"])
        for r in dedup_spans(docs, window=4).collect()
    }
    assert out[1] == ("x y z w a b c d q", 15, 6)
    assert out[2] == ("one two three", 3, 0)
    assert out[3] == ("p q r s", 12, 8)
    assert out[4] == ("all eight tokens here are fully distinct words", 8, 0)
    assert out[5] == ("", 0, 0)


def test_first_occurrence_survives_and_order_preserved(spark):
    # duplicate span in the MIDDLE: prefix, dup of prefix, suffix
    df = spark.createDataFrame(
        [(1, "a b c d TAIL a b c d END")], "doc_id long, text string"
    )
    row = dedup_spans(df, window=4).first()
    assert row["text_dedup"] == "a b c d TAIL END"
    assert row["n_removed"] == 4


def test_window_validation(docs):
    with pytest.raises(ValueError):
        dedup_spans(docs, window=1)


def test_whitespace_runs_collapse(spark):
    # tabs/newlines/multi-space all split; empties dropped before hashing
    df = spark.createDataFrame(
        [(1, "  a  b\tc\nd   a b c d  ")], "doc_id long, text string"
    )
    row = dedup_spans(df, window=4).first()
    assert row["text_dedup"] == "a b c d"
    assert row["n_tokens"] == 8 and row["n_removed"] == 4


ORACLE = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS t
  FROM docs
),
g AS (
  SELECT doc_id, t, len(t) AS n,
    CASE WHEN len(t) >= {w} THEN
      list_transform(range(1, len(t) - {w} + 2),
        i -> ('0x' || substring(md5('13:' || array_to_string(t[i : i+{w}-1], ' ')),
                                1, 15))::BIGINT)
    ELSE [] END AS gh
  FROM toks
),
m AS (
  SELECT doc_id, t, n,
    list_filter(range(1, len(gh)+1), i -> list_position(gh, gh[i]) < i) AS dups
  FROM g
),
k AS (
  SELECT doc_id, n,
    list_transform(
      list_filter(range(1, n+1),
        p -> len(list_filter(dups, i -> i <= p AND p <= i + {w} - 1)) = 0),
      p -> t[p]) AS kept
  FROM m
)
SELECT doc_id, array_to_string(kept, ' ') AS text_dedup,
       n::BIGINT AS n_tokens, (n - len(kept))::BIGINT AS n_removed
FROM k ORDER BY doc_id
"""


@pytest.mark.parametrize("w", [2, 5, 8])
def test_oracle_parity(spark, w):
    # deterministic corpus with real internal repetition: every third
    # doc is its own text twice (junction-spanning grams included)
    import pandas as pd

    base = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "one two three four five six seven eight",
        "red green blue red green blue red green blue yellow",
        "short doc",
        "the quick brown fox jumps over the lazy dog the quick brown fox again",
    ]
    rows = []
    for i in range(20):
        t = base[i % len(base)]
        if i % 3 == 0:
            t = t + " " + t
        rows.append((i, t))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])

    got = (
        dedup_spans(
            spark.createDataFrame(pdf, "doc_id long, text string"), window=w
        )
        .select("doc_id", "text_dedup", "n_tokens", "n_removed")
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    con = duckdb.connect()
    con.register("docs", pdf)
    exp = con.execute(ORACLE.format(w=w)).fetchdf()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
