"""The tiered READ path: answer any time range from tiers + archive.

plans/pipeline.py is the write path (raw turns → tier cascade + chunk
archive + retention).  This module is its read-side complement — the
TimescaleDB *real-time continuous aggregate* / Druid broker shape: a
query over an arbitrary ``[t0, t1)`` is served by

  1. whole tier buckets for the minute-aligned interior
     (operators/stitch.py — 1d interior, 1h edges, 1m fringes, each a
     partition-prunable ``bucket_start`` range scan over tier-sized
     rows), and
  2. the compressed chunk archive for the sub-minute edge slivers
     (operators/compression.py ``decode_chunks_range`` — chunk-metadata
     pruned, so only the O(series active in the edge minute) blobs
     decompress),

merged by the cascade's exact partial merge.  The raw turns table is
never touched: at 10^12 turns the interior is thousandfold-reduced tier
rows and the slivers are two minutes of archive — this is what makes a
dashboard zoom O(answer), not O(data).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mq_to_db_spark.operators.compression import decode_chunks_range
from mq_to_db_spark.operators.rollup import (
    _merge_aggs,
    _partial_aggs,
    with_text_stats,
)
from mq_to_db_spark.operators.stitch import _floor, _as_dt, stitch_range

_MINUTE = 60_000_000  # µs


def _ceil_minute(ts: datetime) -> datetime:
    f = _floor(ts, "1m")
    if f == ts:
        return ts
    from datetime import timedelta

    return f + timedelta(minutes=1)


def _sliver_partials(
    chunks: DataFrame, lo: datetime, hi: datetime, keys: list[str]
) -> DataFrame:
    """Tier-shaped partials for a sub-minute ``[lo, hi)`` edge, computed
    from the chunk archive (metadata-pruned decode, exact trim)."""
    turns = decode_chunks_range(chunks, lo, hi)
    return (
        with_text_stats(turns)
        .groupBy(*keys)
        .agg(*_partial_aggs())
        .withColumn("bucket_start", F.lit(_floor(lo, "1m")))
        .withColumn("tier", F.lit("raw"))
    )


def hybrid_read(
    tier_dfs: dict[str, DataFrame],
    chunks: DataFrame,
    t0,
    t1,
    keys: list[str] | None = None,
) -> DataFrame:
    """Exact aggregate over an ARBITRARY ``[t0, t1)`` (any microsecond
    bounds) from tier tables + chunk archive alone.

    Decomposition: minute-aligned interior via :func:`stitch_range`
    covering rows; head sliver ``[t0, ceil_minute(t0))`` and tail sliver
    ``[floor_minute(t1), t1)`` via archive decode; one merge agg over
    the union.  Output: one row per ``keys`` with the merged stats plus
    ``n_partials`` / ``n_raw`` provenance (tier rows merged / raw-sliver
    partial rows merged).

    A range inside a single minute degenerates to one archive sliver;
    aligned bounds degenerate to pure stitching — both exact.
    """
    keys = list(keys or [])
    t0, t1 = _as_dt(t0), _as_dt(t1)
    if not t0 < t1:
        raise ValueError(f"empty range: {t0!r} >= {t1!r}")
    t0c, t1f = _ceil_minute(t0), _floor(t1, "1m")

    parts: list[DataFrame] = []
    if t0c >= t1f:
        # whole range inside one or two adjacent minutes: slivers only
        parts.append(_sliver_partials(chunks, t0, t1, keys))
    else:
        if t0 < t0c:
            parts.append(_sliver_partials(chunks, t0, t0c, keys))
        parts.append(
            stitch_range(tier_dfs, t0c, t1f, keys=keys, aggregate=False)
        )
        if t1f < t1:
            parts.append(_sliver_partials(chunks, t1f, t1, keys))

    cols = ["bucket_start", *keys, "tier"]
    stat_cols = None
    normed = []
    for p in parts:
        if stat_cols is None:
            stat_cols = [c for c in p.columns if c not in cols]
        normed.append(p.select(*cols, *stat_cols))
    u = normed[0]
    for p in normed[1:]:
        u = u.unionByName(p)
    return u.groupBy(*keys).agg(
        *_merge_aggs(),
        F.count(F.lit(1)).alias("n_partials"),
        F.count_if(F.col("tier") == "raw").alias("n_raw"),
    )


class TierReader:
    """Bound read façade over one logical series store: the tier dict +
    the chunk archive produced by the write path.

    ``aggregate(t0, t1, keys)``  — exact stats over any range
    (:func:`hybrid_read`); ``points(lo, hi, conv_ids)`` — raw turn rows
    from the archive (chunk-pruned decode).  Both never touch the
    original turns table.
    """

    def __init__(self, tier_dfs: dict[str, DataFrame], chunks: DataFrame):
        self.tiers = tier_dfs
        self.chunks = chunks

    def aggregate(self, t0, t1, keys: list[str] | None = None) -> DataFrame:
        return hybrid_read(self.tiers, self.chunks, t0, t1, keys)

    def points(self, lo, hi, conv_ids: list[str] | None = None) -> DataFrame:
        return decode_chunks_range(self.chunks, lo, hi, conv_ids=conv_ids)
