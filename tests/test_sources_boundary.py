"""File-boundary sources: strict JSONL ingest (sources/jsonl.py) and
bucketed co-located layout (sources/bucketed.py)."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F


GOOD = [
    dict(conv_id="c1", turn_idx=0, role="user", text="hi", tool=None,
         ts="2024-01-01T00:00:00"),
    dict(conv_id="c1", turn_idx=1, role="assistant", text="hello", tool=None,
         ts="2024-01-01T00:00:05"),
    dict(conv_id="c2", turn_idx=0, role="tool", text="{}", tool="search",
         ts="2024-01-01T01:00:00"),
]


def _lines(spark, lines):
    return spark.createDataFrame([(l,) for l in lines], "value string")


def test_jsonl_strict_parse_taxonomy(spark):
    from mq_to_db_spark.sources.jsonl import parse_transcript_lines

    lines = [json.dumps(g) for g in GOOD] + [
        "not json at all {",                                       # malformed
        json.dumps(dict(GOOD[0], ts="yesterday lunchtime")),       # bad ts
        json.dumps(dict(GOOD[0], conv_id="", turn_idx=5)),         # empty key
        json.dumps(dict(GOOD[0], role="wizard", turn_idx=6)),      # bad role
        json.dumps(dict(GOOD[0], turn_idx=-3)),                    # bad idx
        json.dumps(GOOD[0]),                                       # duplicate
    ]
    valid, dead = parse_transcript_lines(_lines(spark, lines))
    assert valid.count() == 3
    assert valid.columns == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    reasons = sorted(r["reason"] for r in dead.select("reason").collect())
    assert reasons == sorted([
        "malformed_json", "null_ts", "null_or_empty_conv_id",
        "unknown_role", "negative_or_null_turn_idx", "duplicate_conv_turn_key",
    ])
    # every dead-letter row keeps its original line for replay
    raws = {r["reason"]: r["raw"] for r in dead.collect()}
    assert raws["malformed_json"] == "not json at all {"
    assert json.loads(raws["unknown_role"])["role"] == "wizard"


def test_jsonl_type_mismatch_rejected_not_coerced(spark):
    """The reference's strict-parse discipline: a type-mismatched field
    must surface as a REJECT (here: Spark nulls the field / record and
    the taxonomy names it), never as a silently coerced value."""
    from mq_to_db_spark.sources.jsonl import parse_transcript_lines

    lines = [json.dumps(dict(GOOD[0], turn_idx="zero"))]
    valid, dead = parse_transcript_lines(_lines(spark, lines))
    assert valid.count() == 0
    [r] = dead.collect()
    assert r["reason"] in (
        "negative_or_null_turn_idx", "null_or_empty_conv_id", "malformed_json"
    )


def test_jsonl_file_roundtrip(spark, tmp_path):
    from mq_to_db_spark.sources.jsonl import read_transcripts_jsonl

    p = tmp_path / "feed.jsonl"
    p.write_text("\n".join([json.dumps(g) for g in GOOD] + ["broken {"]))
    valid, dead = read_transcripts_jsonl(spark, str(p))
    assert valid.count() == 3
    assert dead.count() == 1


def _clean_tables(spark, *names):
    """Drop + remove stale warehouse dirs (a fresh in-memory catalog
    does not know about a previous session's managed-table locations)."""
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for n in names:
        spark.sql(f"DROP TABLE IF EXISTS {n}")
        shutil.rmtree(f"{wh}/{n}", ignore_errors=True)


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    from mq_to_db_spark.sources.bucketed import (
        assert_no_shuffle_join,
        read_bucketed,
        write_bucketed,
    )

    _clean_tables(spark, "bkt_left", "bkt_right")

    left = spark.range(0, 1000).select(
        (F.col("id") % 37).cast("string").alias("conv_id"),
        F.col("id").alias("a"),
    )
    right = spark.range(0, 500).select(
        (F.col("id") % 37).cast("string").alias("conv_id"),
        (F.col("id") * 2).alias("b"),
    )
    write_bucketed(left, "bkt_left", 8, "conv_id")
    write_bucketed(right, "bkt_right", 8, "conv_id")
    l, r = read_bucketed(spark, "bkt_left"), read_bucketed(spark, "bkt_right")
    # merge hint: these test tables are tiny enough to auto-broadcast,
    # which would bypass the bucketed scan we are proving
    joined = l.hint("merge").join(r, "conv_id")
    plan = assert_no_shuffle_join(joined)       # raises on any shuffle
    assert "SortMergeJoin" in plan
    assert "Bucketed: true" in plan
    # and the result is actually correct
    expect = left.join(right, "conv_id")
    assert joined.count() == expect.count()
    # groupBy on the bucket key: no exchange either
    agg_plan = (
        l.groupBy("conv_id").agg(F.sum("a"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in agg_plan
    # non-bucketed baseline DOES shuffle (the layout is what removed it)
    base_plan = (
        left.hint("merge").join(right, "conv_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange hashpartitioning" in base_plan


def test_bucketed_mismatched_counts_shuffle(spark):
    """Different bucket counts do NOT co-locate (documented caveat)."""
    from mq_to_db_spark.sources.bucketed import read_bucketed, write_bucketed

    _clean_tables(spark, "bkt_a8", "bkt_a4")

    df = spark.range(0, 100).select(
        (F.col("id") % 7).cast("string").alias("conv_id"), F.col("id").alias("x")
    )
    write_bucketed(df, "bkt_a8", 8, "conv_id")
    write_bucketed(df, "bkt_a4", 4, "conv_id")
    j = read_bucketed(spark, "bkt_a8").hint("merge").join(
        read_bucketed(spark, "bkt_a4"), "conv_id"
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" in plan


def test_jsonl_streaming_boundary(spark, tmp_path):
    """The strict-parse split works on an unbounded stream: valid rows
    roll up, dead letters surface with reasons, availableNow drains."""
    import json as _json

    from mq_to_db_spark.streaming.stream import read_transcript_stream_jsonl

    d = tmp_path / "stream_feed"
    d.mkdir()
    (d / "a.jsonl").write_text(
        "\n".join(_json.dumps(g) for g in GOOD) + "\nbroken {"
    )
    valid, dead = read_transcript_stream_jsonl(spark, str(d))
    q1 = (
        valid.writeStream.format("memory").queryName("jl_valid")
        .trigger(availableNow=True).start()
    )
    q2 = (
        dead.writeStream.format("memory").queryName("jl_dead")
        .trigger(availableNow=True).start()
    )
    q1.awaitTermination(60); q2.awaitTermination(60)
    assert spark.table("jl_valid").count() == 3
    [r] = spark.table("jl_dead").collect()
    assert r["reason"] == "malformed_json" and r["raw"] == "broken {"
