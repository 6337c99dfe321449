"""Line-level boilerplate removal (operators/linededup.py)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mq_to_db_spark.operators.linededup import (
    boilerplate_lines,
    line_stats,
    strip_boilerplate,
)


@pytest.fixture()
def pages(spark):
    rows = [
        (1, "unique prose one\nCookie Policy.\n\nmore prose"),
        (2, "different words here\ncookie policy\nCookie Policy."),
        (3, "third doc body\nCOOKIE   POLICY\nsignature block"),
        (4, "signature block\nlone content"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_line_stats_normalization_and_blanks(pages):
    stats = {r["n_docs"]: r for r in line_stats(pages).collect() if r["n_docs"] >= 2}
    # "Cookie Policy." ≡ "cookie policy" ≡ "COOKIE   POLICY" -> one hash
    # across 3 docs (doc 2 carries it twice: n_total 4)
    assert 3 in stats and stats[3]["n_total"] == 4
    # the blank line in doc 1 is never counted
    total_rows = line_stats(pages).agg(F.sum("n_total")).first()[0]
    assert total_rows == 11  # 12 lines minus the blank


def test_strip_keeps_order_blanks_and_unique_lines(pages):
    out = {
        r["doc_id"]: r["text_clean"]
        for r in strip_boilerplate(pages, min_docs=3).collect()
    }
    # cookie policy (3 docs) stripped everywhere, in all its spellings;
    # signature block (2 docs) survives min_docs=3
    assert out[1] == "unique prose one\n\nmore prose"  # blank line kept
    assert out[2] == "different words here"
    assert out[3] == "third doc body\nsignature block"
    assert out[4] == "signature block\nlone content"
    low = {
        r["doc_id"]: r["text_clean"]
        for r in strip_boilerplate(pages, min_docs=2).collect()
    }
    assert low[4] == "lone content"  # signature block now boilerplate


def test_strip_empty_doc_and_no_boilerplate(spark):
    df = spark.createDataFrame(
        [(1, "only unique"), (2, "also unique")], "doc_id long, text string"
    )
    out = strip_boilerplate(df, min_docs=2).collect()
    assert all(r["text_clean"] == r["text"] for r in out)
    gone = spark.createDataFrame(
        [(1, "same line"), (2, "same line"), (3, "same line")],
        "doc_id long, text string",
    )
    assert all(
        r["text_clean"] == "" for r in strip_boilerplate(gone, min_docs=2).collect()
    )


def test_validation_and_bounded_literal(pages):
    with pytest.raises(ValueError, match="min_docs"):
        strip_boilerplate(pages, min_docs=1)
    with pytest.raises(ValueError, match="max_lines"):
        strip_boilerplate(pages, min_docs=2, max_lines=0)


def test_strip_is_pure_projection(pages):
    out = strip_boilerplate(pages, min_docs=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the strip itself: no shuffle, no join — one projection over the scan
    assert "Exchange" not in plan and "Join" not in plan
