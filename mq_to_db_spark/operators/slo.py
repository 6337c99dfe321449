"""SLO error-budget burn rates over outcome-labelled event streams.

The reference's whole purpose is moving ack/reject outcomes into a
store that dashboards alert on (metrics.go's ``*_ack``/``*_reject``
counters; the Grafana alert panels under docs/dashboards).  The alert
those counters feed in production is the multiwindow multi-burn-rate
SLO alert (Google SRE Workbook ch. 5): how fast is the error budget
``1 - slo_target`` burning over a short AND a long trailing window —
the short window makes the alert fast, the long window makes it
un-flappable.  This module makes that read-path computation a
first-class engine operator instead of a panel transform.

Semantics:
  * ``error_ratio_tier``: collapse raw outcome rows ONCE per
    ``(keys…, bucket_start)`` into exact BIGINT ``n_total`` /
    ``n_bad`` tier counts (``bad`` = any boolean Column over the raw
    row).
  * ``burn_rate``: for each window ``name -> seconds``, trailing
    time-RANGE sums of the tier counts (missing buckets simply do not
    contribute — a time range, not a row count, so gaps can't stretch
    the window), then
    ``ratio_<name>   = bad_w / total_w`` and
    ``burn_<name>    = ratio_<name> / (1 - slo_target)``
    (burn 1.0 = budget exhausted exactly at the SLO period's pace).
  * ``alert``: true when EVERY window's burn rate ≥ ``threshold`` —
    the multiwindow AND that suppresses short-window flaps.

Determinism: all window sums are BIGINT (order-independent); ratios
and burn rates are single double divisions of those sums, evaluated
identically by Spark and the DuckDB oracle, so results hash-match
bit-for-bit after the shared round-to-6.  The ``alert`` comparison
runs on the UNROUNDED doubles in both engines (same operand trees →
same bits — the seasonal z-gate precedent, operators/seasonal.py).

Scale design: consumes raw events once (one hash exchange for the
tier collapse), then everything else runs over TIER rows — calendar-
bounded, not ingest-bounded.  The RANGE windows partition by ``keys``
and order by epoch seconds: one more tier-sized exchange.  With
``keys=[]`` the single global series runs as one window partition —
acceptable for the same reason as rolling.rolling_stats (a year of 1h
buckets is 8,760 rows); pivot many keyless services into a key column
instead.

Reference analogue: internal/metrics/metrics.go (ack/reject outcome
counters) + docs/dashboards alert panels — the computation their
consumers run, re-expressed engine-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from mq_to_db_spark.config import TIER_SECONDS
from mq_to_db_spark.operators.rollup import bucket_col


def error_ratio_tier(
    df: DataFrame,
    keys: list[str],
    bad: Column,
    ts_col: str = "ts",
    tier: str = "1h",
) -> DataFrame:
    """Exact per-bucket outcome counts: (keys…, bucket_start, n_total, n_bad)."""
    return df.groupBy(
        *keys, bucket_col(tier, ts_col).alias("bucket_start")
    ).agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count_if(bad).alias("n_bad"),
    )


def burn_rate(
    tier_df: DataFrame,
    keys: list[str],
    windows: dict[str, int],
    slo_target: float = 0.999,
    threshold: float = 1.0,
    bucket_col_name: str = "bucket_start",
    total_col: str = "n_total",
    bad_col: str = "n_bad",
) -> DataFrame:
    """Append trailing ``ratio_<w>``/``burn_<w>`` per window + ``alert``.

    ``windows`` maps a suffix to its trailing span in SECONDS (e.g.
    ``{"1h": 3600, "6h": 21600}``); each span must be a multiple of the
    tier width so the RANGE frame lands on bucket edges.
    """
    if not windows:
        raise ValueError("windows must name at least one trailing span")
    budget = 1.0 - slo_target
    if not budget > 0:
        raise ValueError(f"slo_target must be < 1, got {slo_target}")
    part = W.partitionBy(*[F.col(k) for k in keys]) if keys else W.partitionBy(F.lit(1))
    epoch = F.unix_timestamp(bucket_col_name)
    out = tier_df
    burn_cols: list[Column] = []
    for name, span_sec in windows.items():
        w = part.orderBy(epoch).rangeBetween(-(span_sec - 1), 0)
        total_w = F.sum(total_col).over(w)
        bad_w = F.sum(bad_col).over(w)
        ratio = bad_w / total_w  # BIGINT sums -> one double division
        out = (
            out.withColumn(f"ratio_{name}", F.round(ratio, 6))
            .withColumn(f"burn_{name}", F.round(ratio / F.lit(budget), 6))
        )
        burn_cols.append(ratio / F.lit(budget))
    alert = burn_cols[0] >= F.lit(threshold)
    for c in burn_cols[1:]:
        alert = alert & (c >= F.lit(threshold))
    return out.withColumn("alert", F.coalesce(alert, F.lit(False)))


def apdex_tier(
    df: DataFrame,
    keys: list[str],
    latency_col: str = "value",
    threshold: float = 100.0,
    ts_col: str = "ts",
    tier: str = "1h",
) -> DataFrame:
    """Apdex score per ``(keys…, bucket_start)`` — the standard
    user-satisfaction index over a latency column (Apdex Alliance
    spec; the panel the reference's Grafana dashboards compute from
    the same ack counters this module's burn rates consume):

        satisfied   : latency ≤ T
        tolerating  : T < latency ≤ 4T
        frustrated  : latency > 4T          (NULL latencies count here:
                                             a lost measurement is not
                                             a satisfied user)
        apdex = (n_satisfied + n_tolerating/2) / n_total

    Exactness: the three tallies are BIGINT ``count_if`` partials
    (order-independent), and the score is ONE double expression over
    them — bit-identical on any engine, so the oracle hash-matches
    after the shared round-to-6.  Plan: a single partial-aggregated
    hash aggregate over the raw scan, same shape as
    :func:`error_ratio_tier`; at 10^12 turns the shuffle carries only
    tier rows."""
    if not threshold > 0:
        raise ValueError(f"threshold must be positive, got {threshold}")
    lat = F.col(latency_col)
    t = F.lit(float(threshold))
    sat = lat <= t
    tol = (lat > t) & (lat <= F.lit(4.0 * float(threshold)))
    g = df.groupBy(*keys, bucket_col(tier, ts_col).alias("bucket_start")).agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count_if(sat).alias("n_satisfied"),
        F.count_if(tol).alias("n_tolerating"),
    )
    score = (
        F.col("n_satisfied").cast("double")
        + F.col("n_tolerating").cast("double") / F.lit(2.0)
    ) / F.col("n_total").cast("double")
    return g.withColumn("apdex", F.round(score, 6))


def slo_burn(
    df: DataFrame,
    keys: list[str],
    bad: Column,
    ts_col: str = "ts",
    tier: str = "1h",
    windows: dict[str, int] | None = None,
    slo_target: float = 0.999,
    threshold: float = 1.0,
) -> DataFrame:
    """Raw outcome rows → tier collapse → multiwindow burn rates."""
    windows = windows or {"1h": 3600, "6h": 6 * 3600}
    tier_sec = TIER_SECONDS[tier]
    for name, span in windows.items():
        if span % tier_sec:
            raise ValueError(
                f"window {name}={span}s is not a multiple of tier {tier}"
            )
    tier_df = error_ratio_tier(df, keys, bad, ts_col=ts_col, tier=tier)
    return burn_rate(
        tier_df,
        keys,
        windows,
        slo_target=slo_target,
        threshold=threshold,
    )
