"""Compressed conversation-chunk archive (SURVEY.md §2 C10).

Spark plumbing around the pure-numpy Gorilla-style codec
(functions/codec.py): one compressed chunk per ``(conv_id, chunk_start)``
where ``chunk_start = date_trunc(chunk_interval, first ts)``.  Encode is a
grouped-map pandas UDF (``applyInPandas`` — Arrow batches in, one chunk
row out); decode is ``mapInPandas`` (chunk rows in, turn rows out).  These
are the engine's **only** two pandas-UDF families (input_hint: "no
per-row Python") — everything inside them is vectorized numpy.

Scale design:
  * chunk grain bounds group size: a conversation's day of turns, not the
    conversation — a hot conversation spanning weeks becomes many
    bounded groups, so the grouped-map shuffle cannot produce a
    pathological partition (this is where the north_rule's skew clause
    bites: ``applyInPandas`` has no partial aggregation to save you);
  * blobs are self-describing (counts embedded) with a ``codec`` tag for
    forward evolution;
  * the archive preserves the *full turn payload* (ts, turn_idx, role,
    tool, text, value) so ``decode(encode(x)) == x`` — the per-turn
    text-equality invariant under (conv_id, turn_idx) ordering that the
    north_rule verifies, inheriting the reference's byte-exact golden
    serialization discipline
    (/root/reference/internal/messages/sql_test.go:110,147-159).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mq_to_db_spark.functions import codec

CODEC_NAME = "gorilla-byte-v1"

CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("chunk_start", T.TimestampType()),
        T.StructField("codec", T.StringType()),
        T.StructField("n_points", T.IntegerType()),
        T.StructField("ts_blob", T.BinaryType()),
        T.StructField("turn_blob", T.BinaryType()),
        T.StructField("val_blob", T.BinaryType()),
        T.StructField("text_blob", T.BinaryType()),
        T.StructField("role_blob", T.BinaryType()),
        T.StructField("tool_blob", T.BinaryType()),
        T.StructField("raw_bytes", T.LongType()),
        T.StructField("enc_bytes", T.LongType()),
    ]
)

_TRUNC_UNIT = {"1 day": "day", "1 hour": "hour"}


def _encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("turn_idx", kind="stable")
    ts = pdf["ts"].values.astype("datetime64[us]").view("int64")
    turn = pdf["turn_idx"].values.astype("int64")
    val = pdf["_value"].values.astype("float64")
    texts = [None if t is None or t is pd.NA else str(t) for t in pdf["text"]]
    roles = [None if r is None or r is pd.NA else str(r) for r in pdf["role"]]
    tools = [None if x is None or x is pd.NA else str(x) for x in pdf["tool"]]

    blobs = {
        "ts_blob": codec.encode_ts(ts),
        "turn_blob": codec.encode_i64(turn),
        "val_blob": codec.encode_xor(val),
        "text_blob": codec.encode_strings(texts),
        "role_blob": codec.encode_dict(roles),
        "tool_blob": codec.encode_dict(tools),
    }
    raw = int(
        len(ts) * 8 * 3
        + sum(len(t.encode("utf-8")) if t else 0 for t in texts)
        + sum(len(r) if r else 0 for r in roles)
        + sum(len(x) if x else 0 for x in tools)
    )
    enc = int(sum(len(b) for b in blobs.values()))
    return pd.DataFrame(
        [
            {
                "conv_id": pdf["conv_id"].iloc[0],
                "chunk_start": pdf["_chunk_start"].iloc[0],
                "codec": CODEC_NAME,
                "n_points": len(pdf),
                **blobs,
                "raw_bytes": raw,
                "enc_bytes": enc,
            }
        ]
    )


def encode_chunks(
    df: DataFrame,
    value_col: str = "text_len",
    chunk_interval: str = "1 day",
) -> DataFrame:
    """Compress turns into per-(conv_id, chunk) blobs.

    ``value_col``: the float series for the XOR codec (defaults to
    text_len; any numeric column works).  Input needs the transcript
    schema; ``text_len`` is derived if absent.
    """
    from mq_to_db_spark.operators.rollup import with_text_stats

    if value_col not in df.columns:
        df = with_text_stats(df)
    prepped = df.withColumn(
        "_chunk_start", F.date_trunc(_TRUNC_UNIT[chunk_interval], F.col("ts"))
    ).withColumn("_value", F.col(value_col).cast("double"))
    return prepped.groupBy("conv_id", "_chunk_start").applyInPandas(
        _encode_group, schema=CHUNK_SCHEMA
    )


_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _decode_batches(batches):
    for pdf in batches:
        frames = []
        for row in pdf.itertuples(index=False):
            ts = codec.decode_ts(bytes(row.ts_blob)).view("datetime64[us]")
            turn = codec.decode_i64(bytes(row.turn_blob)).astype("int32")
            val = codec.decode_xor(bytes(row.val_blob))
            frames.append(
                pd.DataFrame(
                    {
                        "conv_id": row.conv_id,
                        "turn_idx": turn,
                        "role": pd.array(codec.decode_dict(bytes(row.role_blob)), dtype=object),
                        "text": pd.array(codec.decode_strings(bytes(row.text_blob)), dtype=object),
                        "tool": pd.array(codec.decode_dict(bytes(row.tool_blob)), dtype=object),
                        "ts": ts,
                        "value": val,
                    }
                )
            )
        if frames:
            yield pd.concat(frames, ignore_index=True)


def decode_chunks(chunks: DataFrame) -> DataFrame:
    """Inverse of encode_chunks: chunk rows → turn rows (+ the float
    ``value`` column the XOR codec carried).  Per-*chunk* Python iteration
    only (thousands of turns per step), all per-turn work vectorized."""
    return chunks.mapInPandas(_decode_batches, schema=_DECODE_SCHEMA)


def compression_report(chunks: DataFrame) -> DataFrame:
    """Codec metrics per conversation — raw/encoded bytes and ratio."""
    return chunks.groupBy("conv_id").agg(
        F.sum("n_points").alias("n_points"),
        F.sum("raw_bytes").alias("raw_bytes"),
        F.sum("enc_bytes").alias("enc_bytes"),
        F.try_divide(F.sum("raw_bytes"), F.sum("enc_bytes")).alias("ratio"),
    )
