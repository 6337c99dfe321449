"""Reject-routing truth table — mirror of the reference's strict-parse and
ValidDataConn tests (/root/reference/internal/messages/sql_test.go:45-50,
:240-387) re-expressed for the transcript schema."""

from pyspark.sql import functions as F

from mq_to_db_spark.config import (
    REASON_BAD_ROLE,
    REASON_BAD_TURN_IDX,
    REASON_DUP_KEY,
    REASON_NULL_KEY,
    REASON_NULL_TS,
)
from mq_to_db_spark.operators.validate import split_valid_rejected


def test_clean_input_passes(spark, transcripts):
    valid, rejected = split_valid_rejected(transcripts)
    assert rejected.count() == 0
    assert valid.count() == transcripts.count()
    assert valid.columns == transcripts.columns


def test_dirty_rows_routed_with_reasons(spark, dirty, transcripts):
    valid, rejected = split_valid_rejected(dirty)
    rej = {r.reason for r in rejected.select("reason").distinct().collect()}
    assert rej == {
        REASON_NULL_KEY,
        REASON_NULL_TS,
        REASON_BAD_TURN_IDX,
        REASON_BAD_ROLE,
        REASON_DUP_KEY,
    }
    assert rejected.count() == 6
    # every clean row survives: valid == original clean table
    assert valid.count() == transcripts.count()


def test_duplicate_keeps_first_by_ts(spark, transcripts):
    # duplicate an existing key with a later ts — the later copy is rejected
    dup = transcripts.limit(1).withColumn("ts", F.col("ts") + F.expr("interval 1 hour"))
    valid, rejected = split_valid_rejected(transcripts.unionAll(dup))
    assert rejected.count() == 1
    row = rejected.collect()[0]
    assert row.reason == REASON_DUP_KEY
    orig = transcripts.limit(1).collect()[0]
    assert row.ts == orig.ts + __import__("datetime").timedelta(hours=1)


def test_reason_precedence(spark):
    import datetime

    from mq_to_db_spark.fixtures.generator import TRANSCRIPT_SCHEMA

    # null conv_id AND null ts → first check wins (null_key), as in the
    # reference's sequential check order (messages.go:65-84).
    df = spark.createDataFrame(
        [(None, -1, "oracle", "x", None, None)], schema=TRANSCRIPT_SCHEMA
    )
    _, rejected = split_valid_rejected(df)
    assert rejected.collect()[0].reason == REASON_NULL_KEY
