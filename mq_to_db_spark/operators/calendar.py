"""Calendar- and timezone-aware rollup buckets.

Every tier in operators/rollup.py is a fixed-width UTC truncation —
the right primitive for rates and retention, but dashboards and
billing reports ask calendar questions in a LOCAL zone: "turns per
*local* day in America/New_York", where a day is 23 h on the
spring-forward date and 25 h on the fall-back date, and a local
midnight is NOT a fixed UTC offset.  (TimescaleDB grew
``time_bucket(..., timezone => ...)`` for exactly this; the
reference's Grafana dashboards implicitly re-bucket in the browser's
zone — docs/dashboards/mq-to-db.json panel time axes.)

``bucket_local`` maps a UTC instant to the UTC instant of its local
calendar-unit start, via the round-trip

    to_utc(date_trunc(unit, from_utc(ts, tz)), tz)

which is pure codegen (two zone conversions + one truncation — no
UDF, no shuffle) and stays correct across DST because the truncation
happens in wall-clock space.  The companion ``local_start`` column is
the *naive* local wall-clock start (what a report prints); the
bucket identity for grouping is the UTC instant (what a join keys
on).

DST edge semantics (documented, tested against the DuckDB ICU
replay in tests/test_calendar.py):

  * instants inside the repeated fall-back hour truncate by their
    true local wall-clock — both offsets of the ambiguous hour belong
    to the same local day, so day buckets are unaffected;
  * a local bucket start that does not exist (spring-forward gap) is
    resolved by shifting forward (Java ``ZonedDateTime.ofLocal`` /
    ICU both resolve gaps forward); zones whose transitions happen at
    midnight (e.g. America/Santiago) therefore get the post-gap
    instant on those dates — identically in both engines;
  * week starts are Monday in both Spark ``date_trunc('week')`` and
    DuckDB — no convention gap.

Scale: the bucket expression is a per-row projection; a calendar
rollup is the same ONE hash aggregation as any UTC tier.  Grouping
keys stay low-cardinality (days, not instants), so nothing about the
shuffle changes at 10^12 turns.

Reference analogue: the read-side re-bucketing the reference leaves
to Grafana (docs/dashboards), made an engine operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bucket_local", "rollup_calendar"]

_UNITS = {"day", "week", "month", "quarter", "year"}


def bucket_local(unit: str, tz: str, ts_col: str = "ts") -> Column:
    """UTC instant of the local-``tz`` calendar-``unit`` start containing
    ``ts_col`` (itself a UTC instant)."""
    if unit not in _UNITS:
        raise ValueError(f"unit must be one of {sorted(_UNITS)}, got {unit!r}")
    local = F.from_utc_timestamp(F.col(ts_col), tz)
    return F.to_utc_timestamp(F.date_trunc(unit, local), tz)


def local_start(unit: str, tz: str, ts_col: str = "ts") -> Column:
    """Naive local wall-clock start of the bucket (for display/reports)."""
    if unit not in _UNITS:
        raise ValueError(f"unit must be one of {sorted(_UNITS)}, got {unit!r}")
    return F.date_trunc(unit, F.from_utc_timestamp(F.col(ts_col), tz))


def rollup_calendar(
    df: DataFrame,
    unit: str,
    tz: str,
    keys: list[str] | None = None,
    ts_col: str = "ts",
    aggs: list[Column] | None = None,
) -> DataFrame:
    """One hash aggregation per (keys…, local calendar bucket).

    Emits ``bucket_start`` (UTC instant — join/cascade key) and
    ``local_start`` (naive local wall-clock — report label), plus
    ``n_rows`` and any caller ``aggs``.
    """
    keys = list(keys or [])
    aggs = list(aggs) if aggs else []
    return (
        df.withColumn("bucket_start", bucket_local(unit, tz, ts_col))
        .withColumn("local_start", local_start(unit, tz, ts_col))
        .groupBy(*keys, "bucket_start", "local_start")
        .agg(F.count(F.lit(1)).alias("n_rows"), *aggs)
    )
