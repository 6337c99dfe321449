"""Instant-vector derivative semantics: ``changes`` / ``idelta`` /
``deriv`` / ``predict_linear`` per tier bucket.

The reference's dashboard derives trend panels from its Prometheus
counters and gauges (docker-compose/grafana/dashboards/mq-to-db.json) —
beyond ``rate``/``increase`` (operators/counters.py) the PromQL family it
leans on is the *derivative* set:

  * ``changes()``   — how many times a series' value changed;
  * ``idelta()``    — difference of the last two samples (instant delta);
  * ``deriv()``     — per-second least-squares slope of the samples;
  * ``predict_linear()`` — linear extrapolation of that fit.

This module promotes each to a first-class batch operator over any
``(series keys, ts, value)`` table with tumbling-bucket semantics (the
engine's tiers are complete sample streams, not scrape windows, so the
statistics are exact rather than window-edge-extrapolated estimates).

Exactness discipline (the series_corr/correlate.py pattern): the
regression runs on **integer sums** — x is the whole number of x-units
since the bucket start (BIGINT), y is the caller's integer series — so
Σx, Σy, Σxy, Σx² are exact BIGINT on any engine and any partitioning;
only the final slope/intercept formula touches doubles, in one fixed
expression-tree order, so a DuckDB oracle replaying the same formula
hash-matches bit-for-bit.  (Built-in ``regr_slope`` is summation-order
dependent — unusable for cross-engine replay.)

Scale design:
  * ``changes``: one exchange — the lag window hash-partitions on the
    series keys and the (keys, bucket) aggregation reuses that
    partitioning (the counters.py plan shape);
  * ``idelta``: one exchange — window over (keys, bucket) then groupBy
    (keys, bucket) back to back;
  * ``deriv``/``predict_linear``: plain groupBy with map-side partial
    aggregation of the five sums — mergeable, skew-free, ONE shuffle of
    five BIGINTs per group regardless of samples per bucket.

Overflow bounds (BIGINT): with x ≤ B (samples per bucket span in x-units)
and |y| ≤ Y, |Σxy| ≤ n·B·Y — for hour buckets at seconds grain
(B=3600) and |y| ≤ 10⁹ that allows n up to ~2.5 M samples per bucket
before approaching 2⁶³; document the caller's scaling accordingly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import window as W

from mq_to_db_spark.operators.rollup import bucket_col


def discrete_changes(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    tier: str = "1h",
    tiebreak: tuple[str, ...] = (),
    out_col: str = "n_changes",
) -> DataFrame:
    """PromQL ``changes()`` per (keys, bucket): the number of samples
    whose value differs from their series-predecessor, attributed to the
    later sample's bucket.  The series' first-ever sample contributes 0
    (no predecessor).  Equality is exact value comparison — no arithmetic,
    so any column type replays exactly cross-engine.

    ``tiebreak`` orders equal timestamps deterministically (required for
    an exact oracle when the source has ts collisions)."""
    w = W.Window.partitionBy(*keys).orderBy(ts_col, *tiebreak)
    prev = F.lag(value_col).over(w)
    changed = prev.isNotNull() & (F.col(value_col) != prev)
    return (
        df.withColumn("_chg", changed)
        .groupBy(*keys, bucket_col(tier, ts_col).alias("bucket_start"))
        .agg(F.count_if(F.col("_chg")).alias(out_col))
    )


def idelta(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    tier: str = "1h",
    tiebreak: tuple[str, ...] = (),
    out_col: str = "idelta",
) -> DataFrame:
    """PromQL ``idelta()`` per (keys, bucket): last sample minus
    second-to-last sample *within the bucket* (NULL when the bucket has
    fewer than two samples).  One subtraction of the two picked doubles —
    exact cross-engine."""
    b = bucket_col(tier, ts_col).alias("bucket_start")
    order = [F.col(ts_col).desc()] + [F.col(c).desc() for c in tiebreak]
    w = W.Window.partitionBy(*keys, "bucket_start").orderBy(*order)
    return (
        df.select(*keys, b, ts_col, *tiebreak, F.col(value_col).alias("_v"))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= 2)
        .groupBy(*keys, "bucket_start")
        .agg(
            (
                F.max(F.when(F.col("_rn") == 1, F.col("_v")))
                - F.max(F.when(F.col("_rn") == 2, F.col("_v")))
            ).alias(out_col)
        )
    )


def gauge_delta(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    tier: str = "1h",
    tiebreak: tuple[str, ...] = (),
    out_col: str = "delta",
) -> DataFrame:
    """PromQL ``delta()`` per (keys, bucket): the bucket's last sample
    minus its FIRST sample — the gauge counterpart of ``increase``
    (no reset folding: gauges go down legitimately).  Single-sample
    buckets yield 0 (first == last), empty buckets no row.  Discrete
    endpoint semantics, not Prometheus window-edge extrapolation: the
    tiers hold complete streams, so the difference is exact.

    ONE hash aggregation, no window: both endpoints are picked by
    ``max_by``/``min_by`` on a (ts, tiebreak) struct inside the same
    groupBy — strictly cheaper than ``idelta``'s rank window (which
    cannot avoid ranking because it needs the last TWO samples, not the
    two ends).  Map-side combinable, skew-free."""
    keys = list(keys)
    b = bucket_col(tier, ts_col).alias("bucket_start")
    order = F.struct(F.col(ts_col), *[F.col(c) for c in tiebreak])
    return (
        df.select(*keys, b, ts_col, *tiebreak, F.col(value_col).alias("_v"))
        .groupBy(*keys, "bucket_start")
        .agg(
            (F.max_by("_v", order) - F.min_by("_v", order)).alias(out_col),
        )
    )


def _fit_sums(x: Column, y: Column) -> list[Column]:
    """The five exact BIGINT sums of a least-squares fit."""
    return [
        F.count(F.lit(1)).alias("_n"),
        F.sum(x).alias("_sx"),
        F.sum(y).alias("_sy"),
        F.sum(x * y).alias("_sxy"),
        F.sum(x * x).alias("_sxx"),
    ]


def _slope_intercept(prefix: str = "_") -> tuple[Column, Column]:
    """slope/intercept from the sums — numerator and denominator are
    exact BIGINTs converted to double (magnitudes must stay < 2^53 for
    bit-exact replay; see module overflow note), then ONE division."""
    n = F.col(f"{prefix}n").cast("double")
    sx = F.col(f"{prefix}sx").cast("double")
    sy = F.col(f"{prefix}sy").cast("double")
    num = (F.col(f"{prefix}n") * F.col(f"{prefix}sxy") - F.col(f"{prefix}sx") * F.col(f"{prefix}sy")).cast("double")
    den = (F.col(f"{prefix}n") * F.col(f"{prefix}sxx") - F.col(f"{prefix}sx") * F.col(f"{prefix}sx")).cast("double")
    slope = F.when(den != 0, num / den)
    intercept = (sy - slope * sx) / n
    return slope, intercept


def regression_fit(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    y_col: str = "y",
    tier: str = "1d",
    x_unit_seconds: int = 60,
) -> DataFrame:
    """PromQL ``deriv()`` generalized: per (keys, bucket) least-squares
    fit of the integer series ``y_col`` against x = whole ``x_unit``s
    since the bucket start.  Returns slope (per x-unit), intercept (fit
    value at bucket start), and the sample count.

    ``y_col`` must be integral (cast upstream with an explicit scaling if
    the series is a double gauge) — that is what makes Σxy/Σx² exact and
    the result engine-replayable.  NULL slope when the bucket has <2
    distinct x positions (vertical fit)."""
    b = bucket_col(tier, ts_col)
    x = (
        (F.unix_timestamp(ts_col) - F.unix_timestamp(b)) / F.lit(x_unit_seconds)
    ).cast("long")
    y = F.col(y_col).cast("long")
    sums = (
        df.select(*keys, b.alias("bucket_start"), x.alias("_x"), y.alias("_y"))
        .groupBy(*keys, "bucket_start")
        .agg(*_fit_sums(F.col("_x"), F.col("_y")))
    )
    slope, intercept = _slope_intercept()
    return sums.select(
        *keys,
        "bucket_start",
        F.col("_n").alias("n_samples"),
        slope.alias("slope"),
        intercept.alias("intercept"),
    )


def predict_linear(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    y_col: str = "y",
    tier: str = "1d",
    x_unit_seconds: int = 60,
    horizon_units: int = 0,
) -> DataFrame:
    """PromQL ``predict_linear()``: the regression_fit value extrapolated
    to the bucket's END plus ``horizon_units`` x-units —
    ``intercept + slope·(bucket_len + horizon)``.  Same exact-sums
    discipline; the extrapolation is three double ops in fixed order."""
    from mq_to_db_spark.config import TIER_SECONDS

    fit = regression_fit(df, keys, ts_col, y_col, tier, x_unit_seconds)
    x_end = F.lit(TIER_SECONDS[tier] / x_unit_seconds + horizon_units).cast("double")
    return fit.withColumn(
        "predicted", F.col("intercept") + F.col("slope") * x_end
    )


def offset_delta(
    series: DataFrame,
    keys: list[str],
    offset_buckets: int,
    bucket_col_name: str = "bucket_start",
    v_col: str = "v",
) -> DataFrame:
    """PromQL ``offset`` comparison in batch: each grid point minus (and
    over) its value ``offset_buckets`` earlier — week-over-week is
    ``offset_buckets=168`` on an hourly grid, day-over-day 24.

    Feed a ZERO-FILLED series (the tier grid): on a sparse series a row
    lag is not a time lag, and missing buckets silently shift the
    comparison.  Output adds ``v_prev`` (NULL for the leading buckets),
    ``delta`` (exact integer difference) and ``ratio``
    (round(v/v_prev, 6), NULL when v_prev is 0 — a dashboard's WoW%).

    One exchange: the lag window hash-partitions on the series keys over
    tier-sized rows."""
    w = W.Window.partitionBy(*keys).orderBy(bucket_col_name)
    prev = F.lag(v_col, int(offset_buckets)).over(w)
    v = F.col(v_col)
    return (
        series.withColumn("v_prev", prev)
        .withColumn("delta", v - F.col("v_prev"))
        .withColumn(
            "ratio",
            F.round(
                v.cast("double")
                / F.nullif(F.col("v_prev").cast("double"), F.lit(0.0)),
                6,
            ),
        )
    )


def theil_sen(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    y_col: str = "y",
    tier: str = "1d",
    x_unit_seconds: int = 3600,
) -> DataFrame:
    """Theil–Sen robust trend per (keys, bucket): the MEDIAN of all
    pairwise slopes ``(y_j - y_i) / (x_j - x_i)`` — the
    breakdown-point-29% alternative to :func:`regression_fit` that one
    counter spike cannot drag (the reason Grafana/observability
    pipelines prefer it for alerting on noisy trends).  The intercept
    is the Theil–Sen companion ``median(y_i - slope·x_i)``.

    Exactness: ``y_col`` must be integral (same contract as
    regression_fit) and x is whole ``x_unit``s since bucket start, so
    every pairwise slope is one division of two exact BIGINT-valued
    doubles, and both medians are PICKED lower-median order statistics
    (never interpolated) — the mad_outliers discipline, engine-
    replayable bit-for-bit.

    Scale design: ONE hash aggregation collects each bucket's series
    into a sorted array — bounded by the tier ratio (24 hourly samples
    per day; 1440 minutes — the same calendar-bounded per-group buffer
    as quantile_over_time), NOT by raw row count: feed it TIER rows.
    The O(n²) pair expansion (≤ ~10^6 slopes/bucket at minute grain)
    happens INSIDE array expressions per row — no shuffle ever carries
    a pair."""
    b = bucket_col(tier, ts_col)
    x = (
        (F.unix_timestamp(ts_col) - F.unix_timestamp(b))
        / F.lit(x_unit_seconds)
    ).cast("long")
    grouped = (
        df.select(
            *keys,
            b.alias("bucket_start"),
            F.struct(x.alias("x"), F.col(y_col).cast("long").alias("y")).alias("_p"),
        )
        .groupBy(*keys, "bucket_start")
        .agg(F.sort_array(F.collect_list("_p")).alias("_pts"))
    )
    n = F.size("_pts")
    pts = F.col("_pts")

    def _row_slopes(i):
        return F.transform(
            F.when(i < n, F.sequence(i + 1, n)).otherwise(
                F.array().cast("array<int>")
            ),
            lambda j: F.when(
                pts[j - 1]["x"] > pts[i - 1]["x"],
                (pts[j - 1]["y"] - pts[i - 1]["y"]).cast("double")
                / (pts[j - 1]["x"] - pts[i - 1]["x"]).cast("double"),
            ),
        )

    # duplicate-x pairs (vertical slopes) yield NULL above and drop here
    slopes = F.array_sort(
        F.filter(
            F.flatten(F.transform(F.sequence(F.lit(1), n), _row_slopes)),
            lambda s: s.isNotNull(),
        )
    )
    n_pairs = F.size(slopes)
    slope = F.element_at(slopes, ((n_pairs + 1) / 2).cast("int"))
    # the raw (unrounded) slope keeps a distinct name: aliasing the
    # rounded output as "slope" in the same select would make the
    # residual expression's col("slope") resolve to the ROUNDED lateral
    # alias (Spark lateral-column-alias precedence), shifting medians
    with_slope = grouped.select(
        *keys,
        "bucket_start",
        "_pts",
        n.cast("long").alias("n_samples"),
        n_pairs.cast("long").alias("n_pairs"),
        F.when(n_pairs > 0, slope).alias("_slope_raw"),
    )
    resid = F.array_sort(
        F.transform(
            F.col("_pts"),
            lambda p: p["y"].cast("double")
            - F.col("_slope_raw") * p["x"].cast("double"),
        )
    )
    intercept = F.element_at(resid, ((F.size(resid) + 1) / 2).cast("int"))
    return with_slope.select(
        *keys,
        "bucket_start",
        "n_samples",
        "n_pairs",
        F.round("_slope_raw", 6).alias("slope"),
        F.when(F.col("_slope_raw").isNotNull(), F.round(intercept, 6)).alias(
            "intercept"
        ),
    )
