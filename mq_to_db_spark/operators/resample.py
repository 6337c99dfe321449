"""Grid resampling of irregular gauge series: LOCF / linear value at
every grid instant.

The reference's metrics plane is scrape-based — Prometheus evaluates an
instant query by taking, per series, the most recent sample within the
lookback window (LOCF with staleness); TimescaleDB's ``interpolate()``
instead draws the line between the bracketing samples.  Both are the
same shape over a transcript-derived gauge: align an IRREGULAR sample
stream (samples land wherever turns happen) onto a REGULAR grid so
series become comparable, joinable (operators/vectormatch.py), and
chartable.

Distinct from gap-fill (operators/gapfill.py), which densifies an
already-bucketed rollup: resampling evaluates the raw sample stream AT
instants — no bucketing, values are point evaluations, and a lookback
bound marks stale series NULL exactly like PromQL staleness.

Scale design: grid instants are generated per series from its [first,
last] extent (sequence + explode over the tiny per-series extent agg —
never materialized input); both directional matches are as-of joins
(operators/asof.py: union + in-window struct carry, ONE exchange per
direction, no grid×samples product); interpolation itself is pure
column arithmetic in exact epoch-µs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mq_to_db_spark.operators.asof import asof_join


def instant_series_grid(
    df: DataFrame,
    step: str,
    keys: list[str] | None = None,
    ts_col: str = "ts",
    align: str = "minute",
    out_col: str = "grid_ts",
) -> DataFrame:
    """Per-series evaluation instants: ``step``-spaced timestamps spanning
    each series' [first, last] sample (edges aligned outward/inward to
    ``align`` so instants are round).  One tiny extent agg + explode."""
    keys = list(keys or [])
    lo = F.date_trunc(align, F.min(ts_col))
    hi = F.date_trunc(align, F.max(ts_col))
    extent = df.groupBy(*keys).agg(lo.alias("_lo"), hi.alias("_hi"))
    return extent.select(
        *keys,
        F.explode(
            F.sequence("_lo", "_hi", F.expr(f"interval {step}"))
        ).alias(out_col),
    )


def resample_locf(
    df: DataFrame,
    step: str,
    keys: list[str] | None = None,
    ts_col: str = "ts",
    value_col: str = "value",
    lookback: str | None = None,
    tiebreak: tuple[str, ...] = (),
) -> DataFrame:
    """PromQL-instant-query semantics: at every grid instant, the most
    recent sample at or before it; ``lookback`` (e.g. ``"5 minutes"``)
    is the staleness bound — a series silent longer than that reads
    NULL, exactly a vanished Prometheus target.  Output: keys, grid_ts,
    ``value`` (+ ``sample_ts`` of the sample used)."""
    keys = list(keys or [])
    grid = instant_series_grid(df, step, keys, ts_col, out_col=ts_col)
    right = df.select(*keys, ts_col, value_col, *tiebreak)
    out = asof_join(
        grid,
        right,
        on=ts_col,
        by=keys,
        value_cols=[value_col],
        tolerance=lookback,
        direction="backward",
    )
    return out.select(
        *keys,
        F.col(ts_col).alias("grid_ts"),
        F.col(f"{value_col}_right").alias(value_col),
        F.col(f"{ts_col}_right").alias("sample_ts"),
    )


def resample_interpolate(
    df: DataFrame,
    step: str,
    keys: list[str] | None = None,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """TimescaleDB-``interpolate()`` semantics: at every grid instant,
    the linear interpolation between the bracketing samples (prev at or
    before, next strictly after), computed in exact epoch-µs::

        v(g) = v0 + (v1 - v0) · (g - t0) / (t1 - t0)

    An instant at a sample reads the sample itself; past the last sample
    the value holds (LOCF tail); before the first sample it is NULL.
    Two as-of joins (backward + forward), each one exchange.
    """
    keys = list(keys or [])
    grid = instant_series_grid(df, step, keys, ts_col, out_col=ts_col)
    right = df.select(*keys, ts_col, value_col)
    prev = asof_join(
        grid, right, on=ts_col, by=keys, value_cols=[value_col],
        direction="backward", suffix="_p",
    ).withColumnRenamed(f"{value_col}_p", "_v0")
    both = asof_join(
        prev, right, on=ts_col, by=keys, value_cols=[value_col],
        direction="forward", suffix="_n",
    ).withColumnRenamed(f"{value_col}_n", "_v1")
    g = F.unix_micros(F.col(ts_col).cast("timestamp_ltz"))
    t0 = F.unix_micros(F.col(f"{ts_col}_p").cast("timestamp_ltz"))
    t1 = F.unix_micros(F.col(f"{ts_col}_n").cast("timestamp_ltz"))
    v0, v1 = F.col("_v0"), F.col("_v1")
    interp = (
        # at-sample instants (t1 == g is possible only when g is a
        # sample: forward matches >=) — and degenerate t0 == t1
        F.when(t1 == t0, v0)
        .when(F.col(f"{ts_col}_n").isNull(), v0)  # LOCF tail
        # exact BIGINT µs deltas; one double division — replayable
        # bit-for-bit by epoch_us arithmetic in the oracle
        .otherwise(v0 + (v1 - v0) * (g - t0) / (t1 - t0))
    )
    return both.select(
        *keys,
        F.col(ts_col).alias("grid_ts"),
        interp.alias(value_col),
    )
