"""Cross-tier stitching, tier audit, histogram rebin, late-data
compaction — each against a pandas/direct oracle (SURVEY.md §5)."""

from datetime import datetime

import pandas as pd
import pytest

from pyspark.sql import functions as F

from mq_to_db_spark.operators.compression import (
    decode_chunks,
    encode_chunks,
    merge_late_chunks,
)
from mq_to_db_spark.operators.rollup import (
    fixed_bucket_histogram,
    rollup_tiers,
    with_text_stats,
)
from mq_to_db_spark.operators.stitch import (
    audit_tiers,
    cover_range,
    rebin_histogram,
    stitch_range,
)
from tests.conftest import assert_pdf_equal

T0 = datetime(2025, 1, 2, 5, 37)
T1 = datetime(2025, 1, 6, 21, 14)

_TD = {"1m": pd.Timedelta(minutes=1), "1h": pd.Timedelta(hours=1), "1d": pd.Timedelta(days=1)}


# ----------------------------------------------------------- cover_range


def test_cover_range_known_case():
    segs = cover_range(T0, T1)
    assert segs == [
        ("1m", datetime(2025, 1, 2, 5, 37), datetime(2025, 1, 2, 6, 0)),
        ("1h", datetime(2025, 1, 2, 6, 0), datetime(2025, 1, 3, 0, 0)),
        ("1d", datetime(2025, 1, 3, 0, 0), datetime(2025, 1, 6, 0, 0)),
        ("1h", datetime(2025, 1, 6, 0, 0), datetime(2025, 1, 6, 21, 0)),
        ("1m", datetime(2025, 1, 6, 21, 0), datetime(2025, 1, 6, 21, 14)),
    ]


@pytest.mark.parametrize(
    "t0,t1",
    [
        (datetime(2025, 1, 2, 5, 37), datetime(2025, 1, 2, 5, 42)),  # one hour
        (datetime(2025, 1, 2, 5, 0), datetime(2025, 1, 2, 5, 42)),  # aligned lo
        (datetime(2025, 1, 2, 0, 0), datetime(2025, 1, 2, 9, 30)),  # day-aligned lo
        (datetime(2025, 1, 2, 0, 0), datetime(2025, 1, 5, 0, 0)),  # pure days
        (datetime(2025, 1, 2, 23, 59), datetime(2025, 1, 3, 0, 1)),  # midnight straddle
        (datetime(2025, 1, 2, 5, 37), datetime(2025, 1, 9, 21, 14)),
    ],
)
def test_cover_range_partition_properties(t0, t1):
    segs = cover_range(t0, t1)
    # contiguous, exactly covering [t0, t1)
    assert segs[0][1] == t0 and segs[-1][2] == t1
    for (_, _, hi), (_, lo, _) in zip(segs, segs[1:]):
        assert hi == lo
    from mq_to_db_spark.operators.stitch import _floor

    for tier, lo, hi in segs:
        td = _TD[tier].to_pytimedelta()
        assert lo < hi
        # whole aligned buckets only
        assert _floor(lo, tier) == lo
        assert (hi - lo).total_seconds() % td.total_seconds() == 0
    # coarsest-fit optimality: no segment of a fine tier contains a whole
    # aligned bucket of a coarser one
    coarser_of = {"1m": "1h", "1h": "1d"}
    for tier, lo, hi in segs:
        if tier in coarser_of:
            c = coarser_of[tier]
            first = _floor(lo, c)
            if first < lo:
                first += _TD[c].to_pytimedelta()
            assert first + _TD[c].to_pytimedelta() > hi


def test_cover_range_rejects_bad_bounds():
    with pytest.raises(ValueError):
        cover_range(datetime(2025, 1, 2), datetime(2025, 1, 2))
    with pytest.raises(ValueError):
        cover_range(datetime(2025, 1, 2, 0, 0, 30), datetime(2025, 1, 3))
    with pytest.raises(ValueError):
        cover_range(datetime(2025, 1, 2), datetime(2025, 1, 3), tiers=("1h", "1d"))


# ----------------------------------------------------------- stitch_range


def _raw_range_oracle(pdf: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
    p = pdf[(pdf["ts"] >= T0) & (pdf["ts"] < T1)].copy()
    p["text_len"] = p["text"].str.len().fillna(0).astype("int64")
    g = p.groupby(keys, dropna=False)
    return g.agg(
        n_turns=("text_len", "size"),
        text_len_sum=("text_len", "sum"),
        text_len_min=("text_len", "min"),
        text_len_max=("text_len", "max"),
    ).reset_index()


def test_stitch_range_matches_raw(spark, transcripts, transcripts_pdf):
    tiers = rollup_tiers(transcripts, keys=["role"])
    got = (
        stitch_range(tiers, T0, T1, keys=["role"])
        .select(
            "role", "n_turns", "text_len_sum", "text_len_min", "text_len_max",
            "n_partials", "n_1m", "n_1h", "n_1d",
        )
        .toPandas()
    )
    want = _raw_range_oracle(transcripts_pdf, ["role"])
    assert_pdf_equal(
        got.drop(columns=["n_partials", "n_1m", "n_1h", "n_1d"]), want, ["role"]
    )
    # provenance: per-tier partial counts == distinct active buckets per
    # segment (pandas replay of the covering)
    p = transcripts_pdf[(transcripts_pdf["ts"] >= T0) & (transcripts_pdf["ts"] < T1)]
    freq = {"1m": "min", "1h": "h", "1d": "D"}
    expect = {"1m": 0, "1h": 0, "1d": 0}
    for tier, lo, hi in cover_range(T0, T1):
        seg = p[(p["ts"] >= lo) & (p["ts"] < hi)]
        buckets = seg.groupby(["role", seg["ts"].dt.floor(freq[tier])]).size()
        expect[tier] += len(buckets)
    assert int(got["n_1m"].sum()) == expect["1m"]
    assert int(got["n_1h"].sum()) == expect["1h"]
    assert int(got["n_1d"].sum()) == expect["1d"]
    assert int(got["n_partials"].sum()) == sum(expect.values())
    # the interior really was served by the coarse tier
    assert int(got["n_1d"].sum()) > 0


def test_stitch_covering_rows(spark, transcripts, transcripts_pdf):
    tiers = rollup_tiers(transcripts, keys=[])
    rows = stitch_range(tiers, T0, T1, keys=[], aggregate=False).toPandas()
    in_range = transcripts_pdf[
        (transcripts_pdf["ts"] >= T0) & (transcripts_pdf["ts"] < T1)
    ]
    assert int(rows["n_turns"].sum()) == len(in_range)
    # dashboard-zoom shape: interior days coarse, edges fine
    by_tier = rows.groupby("tier")["bucket_start"]
    assert by_tier.min()["1d"] == pd.Timestamp(2025, 1, 3)
    assert (rows[rows["tier"] == "1m"]["bucket_start"].dt.minute != 0).any()


# ----------------------------------------------------------- audit_tiers


def test_audit_consistent_tiers_is_empty(spark, transcripts):
    tiers = rollup_tiers(transcripts, keys=["role"])
    assert audit_tiers(tiers["1h"], tiers["1d"], "1d", keys=["role"]).count() == 0


def test_audit_flags_each_violation_kind(spark, transcripts):
    tiers = rollup_tiers(transcripts, keys=["role"])
    stored = tiers["1d"]
    drop_day = datetime(2025, 1, 3)
    corrupt = (
        stored.filter(
            ~((F.col("bucket_start") == drop_day) & (F.col("role") == "user"))
        )
        .unionByName(
            stored.filter(
                (F.col("bucket_start") == drop_day) & (F.col("role") == "tool")
            ).withColumn("bucket_start", F.lit(datetime(2030, 1, 1)))
        )
        .withColumn(
            "n_turns",
            F.when(
                (F.col("bucket_start") == datetime(2025, 1, 4))
                & (F.col("role") == "assistant"),
                F.col("n_turns") + 7,
            ).otherwise(F.col("n_turns")),
        )
    )
    got = audit_tiers(tiers["1h"], corrupt, "1d", keys=["role"]).toPandas()
    status = {
        (row["bucket_start"], row["role"]): row["status"] for _, row in got.iterrows()
    }
    assert status[(pd.Timestamp(drop_day), "user")] == "missing_in_stored"
    assert status[(pd.Timestamp(2030, 1, 1), "tool")] == "unexpected_in_stored"
    assert status[(pd.Timestamp(2025, 1, 4), "assistant")] == "mismatch"
    mism = got[got["status"] == "mismatch"]
    assert (mism["d_n_turns"] == 7).all() and (mism["d_token_sum"] == 0).all()
    assert len(got) == 3


# ------------------------------------------------------- rebin_histogram


def test_rebin_matches_direct_coarse_histogram(spark, transcripts):
    fine_edges = [8.0, 16.0, 32.0, 64.0, 128.0]
    coarse_edges = [16.0, 64.0]
    tr = with_text_stats(transcripts)
    fine = fixed_bucket_histogram(tr, "text_len", fine_edges, "1d", ["role"])
    got = rebin_histogram(fine, fine_edges, coarse_edges, keys=["role"]).toPandas()
    want = fixed_bucket_histogram(
        tr, "text_len", coarse_edges, "1d", ["role"]
    ).toPandas()
    assert_pdf_equal(got, want, ["bucket_start", "role", "le"])


def test_rebin_rejects_non_nested_edges(spark, transcripts):
    fine = fixed_bucket_histogram(with_text_stats(transcripts), "text_len", [8.0, 16.0], "1d")
    with pytest.raises(ValueError, match="subset"):
        rebin_histogram(fine, [8.0, 16.0], [10.0])


# ----------------------------------------------------- merge_late_chunks


def test_merge_late_chunks_lossless_and_minimal(spark, transcripts, transcripts_pdf):
    base = transcripts.filter(F.col("turn_idx") % 5 != 0)
    late = transcripts.filter(F.col("turn_idx") % 5 == 0)
    chunks = encode_chunks(base, value_col="text_len").cache()
    merged = merge_late_chunks(
        chunks, late, value_col="text_len", chunk_interval="1 day"
    ).cache()

    # losslessness (incl. the per-turn text-equality invariant): decoding
    # the compacted archive reproduces every original turn exactly
    got = (
        decode_chunks(merged)
        .drop("value")
        .toPandas()
        .astype({"conv_id": "string", "role": "string", "text": "string", "tool": "string"})
    )
    assert_pdf_equal(got, transcripts_pdf, ["conv_id", "turn_idx"])

    # minimality: untouched chunks pass through byte-identically
    touched = (
        late.select(
            "conv_id", F.date_trunc("day", "ts").alias("chunk_start")
        ).distinct().toPandas()
    )
    tset = set(map(tuple, touched.itertuples(index=False)))
    before = chunks.select("conv_id", "chunk_start", "ts_blob", "text_blob").toPandas()
    after = merged.select("conv_id", "chunk_start", "ts_blob", "text_blob").toPandas()
    b_un = before[[(r.conv_id, r.chunk_start) not in tset for r in before.itertuples()]]
    a_un = after[[(r.conv_id, r.chunk_start) not in tset for r in after.itertuples()]]
    assert len(b_un) == len(a_un)
    key = ["conv_id", "chunk_start"]
    b_s = b_un.sort_values(key, ignore_index=True)
    a_s = a_un.sort_values(key, ignore_index=True)
    assert (b_s["ts_blob"].map(bytes) == a_s["ts_blob"].map(bytes)).all()
    assert (b_s["text_blob"].map(bytes) == a_s["text_blob"].map(bytes)).all()


def test_merge_late_creates_missing_chunks(spark, transcripts):
    one_conv = transcripts.filter(F.col("conv_id") == "conv-00000000")
    days = one_conv.select(F.date_trunc("day", "ts").alias("d")).distinct()
    first_day = days.agg(F.min("d")).collect()[0][0]
    base = one_conv.filter(F.date_trunc("day", "ts") != F.lit(first_day))
    late = one_conv.filter(F.date_trunc("day", "ts") == F.lit(first_day))
    chunks = encode_chunks(base, value_col="text_len")
    merged = merge_late_chunks(chunks, late, value_col="text_len")
    assert merged.filter(F.col("chunk_start") == F.lit(first_day)).count() == 1
    assert decode_chunks(merged).count() == one_conv.count()
