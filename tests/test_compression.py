"""Spark-side codec round-trip + the per-turn text-equality invariant
(north_rule): decode(encode(turns)) ordered by (conv_id, turn_idx) equals
the input exactly — texts byte-for-byte, ts microsecond-exact."""

import pandas as pd
from pyspark.sql import functions as F

from mq_to_db_spark.operators.compression import (
    compression_report,
    decode_chunks,
    encode_chunks,
)
from mq_to_db_spark.operators.rollup import with_text_stats


def test_text_equality_invariant(spark, transcripts, transcripts_pdf):
    chunks = encode_chunks(transcripts)
    back = (
        decode_chunks(chunks)
        .orderBy("conv_id", "turn_idx")
        .toPandas()
        .reset_index(drop=True)
    )
    want = transcripts_pdf.sort_values(["conv_id", "turn_idx"], ignore_index=True)
    assert len(back) == len(want)
    # per-turn text equality, exact — including empty and non-ASCII
    assert back["text"].fillna("∅").tolist() == want["text"].fillna("∅").tolist()
    assert back["conv_id"].tolist() == want["conv_id"].tolist()
    assert back["turn_idx"].tolist() == want["turn_idx"].tolist()
    assert back["role"].tolist() == want["role"].tolist()
    # tool: null-preserving
    norm = lambda s: [None if pd.isna(x) else x for x in s]
    assert norm(back["tool"]) == norm(want["tool"])
    # ts microsecond-exact
    assert (
        pd.to_datetime(back["ts"]).values.astype("datetime64[us]")
        == want["ts"].values.astype("datetime64[us]")
    ).all()


def test_value_column_bit_exact(spark, transcripts):
    import numpy as np

    chunks = encode_chunks(transcripts, value_col="text_len")
    back = decode_chunks(chunks)
    orig = with_text_stats(transcripts).select(
        "conv_id", "turn_idx", F.col("text_len").cast("double").alias("v")
    )
    joined = back.join(orig, ["conv_id", "turn_idx"]).select("value", "v").toPandas()
    assert np.array_equal(
        joined["value"].values.astype("float64").view("uint64"),
        joined["v"].values.astype("float64").view("uint64"),
    )


def test_chunking_bounds_group_size(spark, transcripts):
    chunks = encode_chunks(transcripts).cache()
    # one chunk per (conv_id, day-of-activity); a conversation active on
    # k days yields k chunks
    per_conv = chunks.groupBy("conv_id").count()
    days = (
        transcripts.select("conv_id", F.to_date("ts").alias("d")).distinct()
        .groupBy("conv_id").count()
    )
    joined = per_conv.withColumnRenamed("count", "a").join(
        days.withColumnRenamed("count", "b"), "conv_id"
    )
    assert joined.filter("a != b").count() == 0
    chunks.unpersist()


def test_compression_achieves_reduction(spark, transcripts):
    rep = compression_report(encode_chunks(transcripts)).agg(
        F.sum("raw_bytes").alias("raw"), F.sum("enc_bytes").alias("enc")
    ).collect()[0]
    assert rep.enc < rep.raw  # zlib text + dod/xor numerics beat raw


def test_empty_input(spark):
    from mq_to_db_spark.fixtures.generator import TRANSCRIPT_SCHEMA

    empty = spark.createDataFrame([], schema=TRANSCRIPT_SCHEMA)
    assert decode_chunks(encode_chunks(empty)).count() == 0


def test_decode_range_equals_decode_all_then_filter(spark, transcripts):
    from mq_to_db_spark.operators.compression import decode_chunks_range

    chunks = encode_chunks(transcripts).cache()
    ext = transcripts.agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).collect()[0]
    # a ~2-day slice in the middle of the extent
    lo = ext.lo + (ext.hi - ext.lo) / 3
    hi = lo + pd.Timedelta("2 days").to_pytimedelta()

    got = decode_chunks_range(chunks, lo, hi).toPandas()
    ref = (
        decode_chunks(chunks)
        .where((F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit(hi)))
        .toPandas()
    )
    key = ["conv_id", "turn_idx"]
    pd.testing.assert_frame_equal(
        got.sort_values(key, ignore_index=True)[ref.columns],
        ref.sort_values(key, ignore_index=True),
    )
    assert len(got) > 0

    # the prune must actually skip chunks: chunks feeding the ranged
    # decode << all chunks (day-aligned slice of a multi-week archive)
    n_all = chunks.count()
    n_pruned = chunks.where(
        (F.col("chunk_start") >= F.date_trunc("day", F.lit(lo)))
        & (F.col("chunk_start") < F.lit(hi))
    ).count()
    # 2 days of the fixture's ~6-day span → roughly a third of chunks
    assert 0 < n_pruned < n_all * 0.7

    # conv_ids restriction composes
    some = [r.conv_id for r in chunks.select("conv_id").distinct().limit(2).collect()]
    sub = decode_chunks_range(chunks, lo, hi, conv_ids=some).toPandas()
    assert set(sub["conv_id"].unique()) <= set(some)
    chunks.unpersist()
