"""Counter reset adjustment + chunk value-sketch pruning vs oracles."""

from datetime import datetime, timedelta

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from mq_to_db_spark.operators.compression import (
    decode_chunks,
    decode_chunks_value_range,
    encode_chunks,
)
from mq_to_db_spark.operators.counters import adjust_resets
from tests.conftest import assert_pdf_equal


# ---------------------------------------------------------- adjust_resets


def _mk(spark, values, key="a"):
    t0 = datetime(2025, 1, 1)
    rows = [
        (key, t0 + timedelta(minutes=i), i, float(v)) for i, v in enumerate(values)
    ]
    return spark.createDataFrame(
        rows, "k string, ts timestamp, i int, value double"
    )


def test_adjust_known_sequence(spark):
    df = _mk(spark, [0, 5, 2, 7, 1, 1, 3])
    got = (
        adjust_resets(df, ["k"], tiebreak=("i",))
        .orderBy("ts")
        .select("adjusted")
        .toPandas()["adjusted"]
        .tolist()
    )
    assert got == [0.0, 5.0, 7.0, 12.0, 13.0, 13.0, 15.0]


def _pandas_adjust(pdf: pd.DataFrame, keys: list[str]) -> pd.Series:
    def one(g):
        v = g["value"].to_numpy()
        prev = np.r_[np.nan, v[:-1]]
        off = np.where(~np.isnan(prev) & (v < prev), prev, 0.0)
        return pd.Series(v + np.cumsum(off), index=g.index)

    if keys:
        return pdf.groupby(keys, group_keys=False).apply(one)
    return one(pdf)


def test_adjust_matches_pandas_and_is_monotonic(spark, transcripts):
    # per-conv resetting counter: turn_idx resets every day
    w_day = (
        "conv_id",
        F.date_trunc("day", "ts").alias("d"),
    )
    from pyspark.sql import Window as W

    win = W.partitionBy(*w_day).orderBy("ts", "turn_idx")
    ctr = transcripts.select(
        "conv_id",
        "ts",
        "turn_idx",
        F.row_number().over(win).cast("double").alias("value"),
    )
    got = (
        adjust_resets(ctr, ["conv_id"], tiebreak=("turn_idx",))
        .toPandas()
        .sort_values(["conv_id", "ts", "turn_idx"], ignore_index=True)
    )
    want = got.drop(columns=["adjusted"]).copy()
    want["adjusted"] = _pandas_adjust(want, ["conv_id"]).to_numpy()
    assert_pdf_equal(got, want, ["conv_id", "ts", "turn_idx"])
    mono = got.groupby("conv_id")["adjusted"].apply(
        lambda s: (s.diff().dropna() >= 0).all()
    )
    assert mono.all()


def test_adjust_keyless_matches_keyed(spark):
    vals = [3, 9, 1, 4, 4, 2, 10, 0, 6]
    df = _mk(spark, vals)
    keyed = (
        adjust_resets(df, ["k"], tiebreak=("i",))
        .orderBy("ts").select("adjusted").toPandas()
    )
    keyless = (
        adjust_resets(df.drop("k"), [], tiebreak=("i",), n_buckets=4)
        .orderBy("ts").select("adjusted").toPandas()
    )
    assert keyed["adjusted"].tolist() == keyless["adjusted"].tolist()


# ------------------------------------------------- chunk value sketches


@pytest.fixture(scope="module")
def chunks(spark, transcripts):
    c = encode_chunks(transcripts, value_col="text_len").cache()
    c.count()
    return c


def test_sketch_matches_decoded_extrema(spark, chunks):
    meta = chunks.select("conv_id", "chunk_start", "val_min", "val_max").toPandas()
    truth = (
        decode_chunks(chunks)
        .withColumn("chunk_start", F.date_trunc("day", "ts"))
        .groupBy("conv_id", "chunk_start")
        .agg(F.min("value").alias("val_min"), F.max("value").alias("val_max"))
        .toPandas()
    )
    assert_pdf_equal(meta, truth, ["conv_id", "chunk_start"])


def test_value_range_prune_is_exact_and_prunes(spark, chunks):
    lo = 150.0  # spike hunt: long texts only
    got = (
        decode_chunks_value_range(chunks, lo=lo)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"], ignore_index=True)
    )
    want = (
        decode_chunks(chunks)
        .where(F.col("value") >= lo)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"], ignore_index=True)
    )
    assert_pdf_equal(got, want, ["conv_id", "turn_idx"])
    # the sketch actually prunes: some chunks never reach the threshold
    n_all = chunks.count()
    n_kept = chunks.where(F.col("val_max") >= lo).count()
    assert 0 < n_kept < n_all


def test_value_range_two_sided(spark, chunks):
    got = decode_chunks_value_range(chunks, lo=10.0, hi=20.0)
    want = decode_chunks(chunks).where(
        (F.col("value") >= 10.0) & (F.col("value") <= 20.0)
    )
    assert got.count() == want.count()
    assert (
        got.agg(F.sum("value")).collect()[0][0]
        == want.agg(F.sum("value")).collect()[0][0]
    )
