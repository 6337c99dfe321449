"""Seasonal (calendar-periodic) baselines and residuals over tier series.

The reference's dashboard reads its rate panels against "same time
yesterday / last week" mental baselines; this module makes that a
first-class operator: learn the per-key seasonal profile of a rolled-up
tier series (hour-of-day, day-of-week, or their cross) and standardize
every bucket against its own season cell.  This is the
"is 03:00 traffic low because it's 03:00, or because something broke?"
check a metrics plane grows once rolling z-scores (operators/rolling.py)
start flagging every quiet night as an anomaly.

Semantics per ``(keys…, season_idx)`` cell over the whole series:
  * ``seas_n`` / ``seas_avg`` / ``seas_std``: population size, mean and
    sample stddev of the cell's bucket values;
  * ``residual``: value − cell mean;
  * ``seas_z``: residual / cell stddev; NULL when the cell has <2
    buckets or zero variance (a constant season can't standardize).

Determinism: the mean/std are computed from ``sum``/``sum of squares``/
``count`` — with integer-valued tier series (counts, micro-unit-scaled
gauges) the two sums are exact BIGINTs regardless of accumulation
order, and the final double formula is evaluated identically by Spark
and the DuckDB oracle, so results hash-match bit-for-bit.  Built-in
streaming ``stddev_samp`` over an *unordered* partition would be
summation-order dependent — same reasoning as series_corr
(operators/correlate.py).  Float-valued series still work but are only
deterministic within one engine; pre-scale to integers (see
q_counter_increase's micro-unit idiom) when an oracle replay matters.

Scale design: consumes TIER rows (rollup output), never raw turns — the
input is calendar-bounded, not ingest-bounded.  ``with_seasonal`` is ONE
hash exchange on ``(keys…, season_idx)`` (an unordered whole-partition
window; no join, no second shuffle).  ``seasonal_profile`` is one
partial-aggregated groupBy of the same shape.  With ``keys=[]`` the
exchange spreads over the ≤168 season cells — acceptable for tier-sized
input, same caveat as rolling.rolling_stats.

Reference analogue: the Grafana dashboards' timeShift-style compare
panels over the consumer rate metrics (docs/dashboards, metrics.go) —
re-expressed as an engine-side operator instead of a panel transform.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

#: supported season shapes → (index expression builder, cell count)
_SEASONS = ("hod", "dow", "hod_dow")


def season_index(ts_col: str, season: str = "hod") -> Column:
    """Integer season-cell index for a timestamp column.

    ``hod`` = hour of day (0-23), ``dow`` = day of week (0=Sunday-6,
    matching DuckDB's ``date_part('dow', …)``), ``hod_dow`` = the
    24×7 cross (dow*24 + hod, 0-167).
    """
    h = F.hour(ts_col)
    d = F.dayofweek(ts_col) - F.lit(1)  # Spark: 1=Sunday → 0=Sunday
    if season == "hod":
        return h.cast("int")
    if season == "dow":
        return d.cast("int")
    if season == "hod_dow":
        return (d * F.lit(24) + h).cast("int")
    raise ValueError(f"season must be one of {_SEASONS}, got {season!r}")


def _avg_std(n: Column, s: Column, ss: Column) -> tuple[Column, Column]:
    """(avg, std) from order-independent count / sum / sum-of-squares."""
    sd, ssd, nd = s.cast("double"), ss.cast("double"), n.cast("double")
    avg = sd / nd
    var_raw = (ssd - sd * sd / nd) / (nd - F.lit(1.0))
    # gate on n OUTSIDE greatest: Spark's greatest() skips NULL args, so
    # greatest(NULL, 0.0) would silently turn "undefined" into 0.0
    std = F.when(n >= 2, F.sqrt(F.greatest(var_raw, F.lit(0.0))))
    return avg, std


def with_seasonal(
    tier: DataFrame,
    keys: list[str],
    ts_col: str = "bucket_start",
    value_col: str = "value",
    season: str = "hod",
) -> DataFrame:
    """Append ``season_idx, seas_n, seas_avg, seas_std, residual,
    seas_z`` to every tier row — one unordered-window exchange on
    ``(keys…, season_idx)``, no join.  The three base window aggregates
    (count / sum / sum-of-squares) are materialized ONCE as staging
    columns and everything else derives as plain row expressions — the
    naive per-output-column formulation stacks two Window operators with
    14 duplicate aggregates."""
    v = F.col(value_col)
    part = W.partitionBy(*keys, "season_idx")
    staged = (
        tier.withColumn("season_idx", season_index(ts_col, season))
        # pre-project the square so all three aggregates land in ONE
        # Window node (sum(v*v) inline forces a second Window pass)
        .withColumn("_v2", v * v)
        .withColumn("_n", F.count(v).over(part))
        .withColumn("_s", F.sum(v).over(part))
        .withColumn("_ss", F.sum("_v2").over(part))
    )
    n = F.col("_n")
    avg, std = _avg_std(n, F.col("_s"), F.col("_ss"))
    resid = v.cast("double") - avg
    z = F.when(std > 0, F.round(resid / std, 6))
    return (
        staged.withColumn("seas_n", n)
        .withColumn("seas_avg", F.round(avg, 6))
        .withColumn("seas_std", F.round(std, 6))
        .withColumn("residual", F.round(resid, 6))
        .withColumn("seas_z", z)
        .drop("_n", "_s", "_ss", "_v2")
    )


def seasonal_profile(
    tier: DataFrame,
    keys: list[str],
    ts_col: str = "bucket_start",
    value_col: str = "value",
    season: str = "hod",
) -> DataFrame:
    """The learned profile itself: one row per ``(keys…, season_idx)``
    with ``seas_n, seas_avg, seas_std`` — the broadcastable artifact a
    serving layer joins against incoming buckets (≤168 cells per key)."""
    v = F.col(value_col)
    grouped = (
        tier.withColumn("season_idx", season_index(ts_col, season))
        .groupBy(*keys, "season_idx")
        .agg(
            F.count(v).alias("seas_n"),
            F.sum(v).alias("_s"),
            F.sum(v * v).alias("_ss"),
        )
    )
    avg, std = _avg_std(F.col("seas_n"), F.col("_s"), F.col("_ss"))
    return grouped.select(
        *keys,
        "season_idx",
        "seas_n",
        F.round(avg, 6).alias("seas_avg"),
        F.round(std, 6).alias("seas_std"),
    )
