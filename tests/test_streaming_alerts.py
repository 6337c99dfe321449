"""Streaming alert lifecycle (streaming/stateful.py streaming_alerts):
pending runs emit nothing, a hold ≥ for_duration fires once, dropping
below resolves, and run state carries across micro-batches (one
combined scenario — streaming-state queries cost ~90 s to spin up)."""

import pandas as pd

from mq_to_db_spark.streaming.stateful import streaming_alerts


def _samples(rows):
    return pd.DataFrame(
        {
            "series": pd.array([r[0] for r in rows], dtype="string"),
            "ts": pd.to_datetime([r[1] for r in rows]).astype("datetime64[us]"),
            "v": pd.array([r[2] for r in rows], dtype="int64"),
        }
    )


def _run(spark, inp, out, ckpt):
    stream = (
        spark.readStream.schema("series string, ts timestamp, v long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(inp))
    )
    q = (
        streaming_alerts(stream, threshold=10, for_duration="5 minutes")
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)


def test_streaming_alert_lifecycle(spark, tmp_path):
    inp = tmp_path / "in"
    inp.mkdir()
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"

    # batch 1:
    #   s1 — above threshold at 00:00/:02/:06 → hold 6 min ≥ 5 → FIRING
    #   s2 — single above sample (pending)
    #   s3 — below only (nothing)
    #   s4 — above at 00:00/:02 (pending, must carry across batches)
    _samples(
        [
            ("s1", "2025-01-01 00:00:00", 20),
            ("s1", "2025-01-01 00:02:00", 30),
            ("s1", "2025-01-01 00:06:00", 25),
            ("s2", "2025-01-01 00:00:00", 15),
            ("s3", "2025-01-01 00:00:00", 5),
            ("s4", "2025-01-01 00:00:00", 12),
            ("s4", "2025-01-01 00:02:00", 11),
        ]
    ).to_parquet(inp / "f1.parquet", index=False)
    _run(spark, inp, out, ckpt)
    got = spark.read.parquet(str(out)).toPandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert (r.series, r.event, r.n_samples, r.peak) == ("s1", "firing", 3, 30)
    assert str(r.run_start) == "2025-01-01 00:00:00"
    assert str(r.event_ts) == "2025-01-01 00:06:00"

    # batch 2:
    #   s1 — drops below → RESOLVED (stamped at last above sample 00:06)
    #   s2 — below at 00:03 → pending run dropped silently
    #   s4 — above at 00:06 → hold reaches 6 min using batch-1 state → FIRING
    _samples(
        [
            ("s1", "2025-01-01 00:10:00", 3),
            ("s2", "2025-01-01 00:03:00", 2),
            ("s4", "2025-01-01 00:06:00", 40),
        ]
    ).to_parquet(inp / "f2.parquet", index=False)
    _run(spark, inp, out, ckpt)
    got = spark.read.parquet(str(out)).toPandas()
    ev = {(r.series, r.event): r for _, r in got.iterrows()}
    assert set(ev) == {("s1", "firing"), ("s1", "resolved"), ("s4", "firing")}
    res = ev[("s1", "resolved")]
    assert (res.n_samples, res.peak) == (3, 30)
    assert str(res.event_ts) == "2025-01-01 00:06:00"  # last above sample
    f4 = ev[("s4", "firing")]
    assert (f4.n_samples, f4.peak) == (3, 40)
    assert str(f4.run_start) == "2025-01-01 00:00:00"  # batch-1 state carried
