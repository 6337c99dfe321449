"""Time-series downsampling: OHLC / first-last-extremes per tier bucket.

The reference's Grafana dashboard renders its counter and gauge series at
panel resolution — Grafana downsamples the scrape stream to one point per
pixel bucket (docker-compose/grafana/dashboards/mq-to-db.json:239,868).
This module makes that read-path behavior a first-class engine operator:
collapse a raw ``(keys, ts, value)`` stream to one row per tier bucket
carrying the four values any plot or candlestick needs — first (open),
max (high), min (low), last (close) — plus count/sum for re-aggregation.

Semantics: ``open``/``close`` are the value at the min/max ``(ts,
*tiebreak)`` within the bucket (deterministic under duplicate timestamps
when a unique tiebreak column is passed); ``high``/``low``/``n_samples``/
``value_sum`` are plain aggregates.

Scale design — this is the *cheapest possible* plan for the semantics:
  * one hash aggregation, no window: ``min_by/max_by(value, struct(ts,
    *tiebreak))`` fold open/close inside the same partial+final agg as
    min/max/count/sum, so raw data is touched once and the only exchange
    carries one partially-agged row per (key, bucket) per map task;
  * every output column is re-aggregable in the tier cascade sense:
    ``downsample('1d')`` over the 1h output (with open/close carried via
    the bucket-start/bucket-end keys) equals downsampling raw — the same
    mergeability invariant the rollup tiers rely on (rollup.py);
  * whole-stage codegen end to end (no UDFs, no window sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mq_to_db_spark.operators.rollup import bucket_col


def downsample_ohlc(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    tier: str = "1h",
    tiebreak: tuple[str, ...] = (),
) -> DataFrame:
    """One row per ``(keys…, bucket_start)`` with ``open`` / ``high`` /
    ``low`` / ``close`` / ``n_samples`` / ``value_sum``."""
    order_key = F.struct(
        F.col(ts_col).alias("o"), *[F.col(t) for t in tiebreak]
    )
    value = F.col(value_col)
    bucket = bucket_col(tier, ts_col)
    return (
        df.groupBy(*keys, bucket.alias("bucket_start"))
        .agg(
            F.min_by(value, order_key).alias("open"),
            F.max(value).alias("high"),
            F.min(value).alias("low"),
            F.max_by(value, order_key).alias("close"),
            F.count(F.lit(1)).alias("n_samples"),
            F.round(F.sum(value), 6).alias("value_sum"),
        )
    )
