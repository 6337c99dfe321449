"""Multimodal column handling: image/audio/video as opaque binary columns
with typed metadata.

The container has no image/audio libraries, so the *decode* step is
stubbed (NotImplementedError) or replaced by a deterministic fake — but
the Spark-side plumbing is real and tested: schemas, Arrow batch shapes,
``mapInPandas`` signatures, partition sizing.  Swapping the fake for a
real decoder (PIL/ffmpeg) changes one function body, not the plan.

Scale notes: media rows are large → ``media_repartition`` targets a
bytes-per-partition budget (row-group-sized tasks, not row-count-sized);
feature extraction is a ``mapInPandas`` narrow pass so it pipelines with
the scan and never shuffles the payload bytes.
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 64

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def real_decode(payload: bytes, mime: str) -> np.ndarray:
    """The genuine decode step — requires PIL/soundfile/ffmpeg, absent in
    this container.  STUB (clearly marked per the build brief)."""
    raise NotImplementedError(
        "media decoding requires PIL/ffmpeg, not available in this "
        "environment; use deterministic_fake_decode for plumbing tests"
    )


def deterministic_fake_decode(payload: bytes, mime: str) -> np.ndarray:
    """Deterministic stand-in: sha256-seeded pseudo-pixels.  Same payload →
    same 'decoded' array, so downstream tests are exact."""
    digest = hashlib.sha256(payload or b"").digest()
    seed = int.from_bytes(digest[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.random(256, dtype=np.float64)


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: decode → pool to FEATURE_DIM.  Batch-vectorized
    except the per-item decode call (unavoidable for variable-size
    payloads; the decode itself is C-side in a real library)."""
    for pdf in batches:
        feats = []
        for payload, mime in zip(pdf["payload"], pdf["mime"]):
            arr = deterministic_fake_decode(
                bytes(payload) if payload is not None else b"", mime
            )
            pooled = arr.reshape(FEATURE_DIM, -1).mean(axis=1).astype(np.float32)
            feats.append(pooled.tolist())
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(lambda p: 0 if p is None else len(p)).astype("int64"),
                "feature": feats,
            }
        )


def extract_features(df: DataFrame) -> DataFrame:
    """Media table → feature table (the embed step of a multimodal
    training-data pipeline)."""
    return df.mapInPandas(_extract_features, schema=FEATURE_SCHEMA)


def media_repartition(df: DataFrame, target_bytes: int = 128 << 20) -> DataFrame:
    """Repartition a media table so each task carries ~target_bytes of
    payload (estimate from a sample mean).  Prevents 2-row tasks next to
    2000-row tasks when payload sizes are skewed."""
    stats = df.select(F.avg(F.length("payload")).alias("avg"), F.count(F.lit(1)).alias("n")).collect()[0]
    if not stats.n:
        return df
    avg = stats.avg or 1.0
    n_parts = max(1, int(stats.n * avg / target_bytes))
    return df.repartition(n_parts)


def synth_media(spark, n: int = 100, seed: int = 0) -> DataFrame:
    """Deterministic fake media table for plumbing tests."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        size = int(rng.integers(100, 5000))
        payload = rng.integers(0, 256, size, dtype=np.uint8).tobytes()
        meta = {
            "width": int(rng.integers(32, 1024)) if kind == "image" else None,
            "height": int(rng.integers(32, 1024)) if kind == "image" else None,
            "duration_ms": int(rng.integers(1000, 60000)) if kind != "image" else None,
            "sample_rate": 16000 if kind == "audio" else None,
            "codec": {"image": "png", "audio": "opus", "video": "h264"}[kind],
        }
        rows.append((i, kind, f"{kind}/x-fake", payload, meta))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def resize_images(df: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Image resize pass (mapInPandas, image rows only).

    The pixel resample itself needs PIL (absent here) — the stand-in
    re-derives a deterministic payload of the target dimensions from the
    source bytes, so schema/batching/partition behavior are real and a
    PIL-backed body is a drop-in."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for payload in pdf["payload"]:
                arr = deterministic_fake_decode(
                    bytes(payload) if payload is not None else b"", "image/*"
                )
                # deterministic "resampled" bytes sized to the target grid
                reps = (width * height) // len(arr) + 1
                outs.append(
                    (np.tile(arr, reps)[: width * height] * 255).astype(np.uint8).tobytes()
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": np.full(len(pdf), width, dtype="int32"),
                    "height": np.full(len(pdf), height, dtype="int32"),
                    "payload": outs,
                }
            )

    return df.filter(F.col("kind") == "image").mapInPandas(_resize, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_ms", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling (one output row per sampled frame).

    Frame *extraction* needs ffmpeg (absent) — the stand-in emits
    deterministic per-frame payloads at the requested cadence using the
    duration metadata, so the explode shape (1 video row → N frame rows,
    payload bytes never shuffled before sampling) is real."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, mss, payloads = [], [], [], []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                dur = (meta or {}).get("duration_ms") or 0
                n_frames = max(1, int(dur // every_ms))
                base = deterministic_fake_decode(
                    bytes(payload) if payload is not None else b"", "video/*"
                )
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    mss.append(i * every_ms)
                    payloads.append(
                        (np.roll(base, i)[:64] * 255).astype(np.uint8).tobytes()
                    )
            yield pd.DataFrame(
                {
                    "media_id": pd.array(ids, dtype="int64"),
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "frame_ms": pd.array(mss, dtype="int32"),
                    "payload": payloads,
                }
            )

    return df.filter(F.col("kind") == "video").mapInPandas(_sample, schema=FRAME_SCHEMA)
