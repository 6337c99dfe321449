"""Multimodal plumbing: schema, Arrow batch shape, deterministic fake
decode, bytes-aware repartitioning."""

import pytest

from mq_to_db_spark.operators.multimodal import (
    FEATURE_DIM,
    extract_features,
    media_repartition,
    real_decode,
    synth_media,
)


def test_feature_extraction_shape_and_determinism(spark):
    media = synth_media(spark, n=30).cache()
    feats = extract_features(media).toPandas().sort_values("media_id")
    assert len(feats) == 30
    assert all(len(f) == FEATURE_DIM for f in feats.feature)
    # deterministic: same payload → same feature
    again = extract_features(media).toPandas().sort_values("media_id")
    assert [list(f) for f in feats.feature] == [list(f) for f in again.feature]
    assert (feats.n_bytes > 0).all()


def test_real_decode_is_marked_stub():
    with pytest.raises(NotImplementedError, match="PIL/ffmpeg"):
        real_decode(b"\x89PNG", "image/png")


def test_media_repartition_targets_bytes(spark):
    media = synth_media(spark, n=90)
    out = media_repartition(media, target_bytes=50_000)
    # ~90 rows × ~2.5 KB ≈ 230 KB → ~4 partitions
    assert 1 <= out.rdd.getNumPartitions() <= 10
    assert out.count() == 90
