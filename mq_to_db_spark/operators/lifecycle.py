"""Series-lifecycle analytics: cardinality churn and exemplars.

A TSDB's operational pain is series *churn*, not series count —
Prometheus' head-block blowups come from labels being born and dying
faster than retention ages them out, and mq-to-db's per-queue consumer
metrics (internal/metrics) have exactly this shape when queue names or
consumer tags are dynamic.  This module gives the engine the two
governance primitives a metrics plane needs:

  * ``series_churn`` — per tier bucket: how many distinct series were
    ACTIVE, how many were BORN (first-ever sample in this bucket), how
    many DIED (last-ever sample in this bucket).  Born/died are defined
    against the whole input's horizon, the batch analogue of head-series
    churn counters.
  * ``exemplars`` — per (series, bucket): the single sample with the
    maximum value, with its timestamp and id carried along — the
    OpenMetrics *exemplar* attached to an aggregate point, letting a
    dashboard jump from a histogram spike to the exact offending event.

Determinism discipline: ``exemplars`` does NOT use ``max_by`` (ties are
engine-nondeterministic); it takes ``max(struct(value, ts, tiebreak…))``
whose lexicographic total order any engine replays exactly — the DuckDB
oracle picks the same row via ``ORDER BY v DESC, ts DESC, id DESC``.

Scale design: ``series_churn`` is two aggregations — per-series extents
(ONE shuffle keyed on the series, map-side-combined to one row per
series) and then per-bucket counts over that series-sized intermediate
(second shuffle is over #series rows, not #samples); the active count
reuses the (series, bucket) distinct projection.  ``exemplars`` is a
single groupBy carrying one struct per group — one shuffle, O(1) state,
no window sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mq_to_db_spark.operators.rollup import bucket_col


def series_churn(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    tier: str = "1d",
) -> DataFrame:
    """Per tier bucket: ``n_active`` / ``n_born`` / ``n_died`` distinct
    series (identified by ``keys``) — counts are exact BIGINT; buckets
    where nothing was born or died report 0 (never null)."""
    b = bucket_col(tier, ts_col)
    # one row per series: its first- and last-ever bucket
    extents = df.groupBy(*keys).agg(
        F.min(b).alias("_first_b"), F.max(b).alias("_last_b")
    )
    born = extents.groupBy(F.col("_first_b").alias("bucket_start")).agg(
        F.count(F.lit(1)).alias("n_born")
    )
    died = extents.groupBy(F.col("_last_b").alias("bucket_start")).agg(
        F.count(F.lit(1)).alias("n_died")
    )
    active = (
        df.select(*keys, b.alias("bucket_start"))
        .distinct()
        .groupBy("bucket_start")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    out = (
        active.join(born, "bucket_start", "left")
        .join(died, "bucket_start", "left")
    )
    return out.select(
        "bucket_start",
        "n_active",
        F.coalesce("n_born", F.lit(0)).alias("n_born"),
        F.coalesce("n_died", F.lit(0)).alias("n_died"),
    )


def exemplars(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    value_col: str = "v",
    id_col: str = "id",
    tier: str = "1h",
) -> DataFrame:
    """Per (keys, bucket): the max-value sample with its coordinates —
    deterministic under value ties via the total order
    ``(value, ts, id)`` (struct-max, replayable on any engine)."""
    b = bucket_col(tier, ts_col)
    pick = F.max(
        F.struct(
            F.col(value_col).alias("v"),
            F.col(ts_col).alias("ts"),
            F.col(id_col).alias("id"),
        )
    ).alias("_ex")
    out = df.groupBy(*keys, b.alias("bucket_start")).agg(
        pick, F.count(F.lit(1)).alias("n_samples")
    )
    return out.select(
        *keys,
        "bucket_start",
        F.col("_ex.v").alias("exemplar_value"),
        F.col("_ex.ts").alias("exemplar_ts"),
        F.col("_ex.id").alias("exemplar_id"),
        "n_samples",
    )


def series_limit(
    df: DataFrame,
    series_keys: list[str],
    scope_keys: list[str] | None = None,
    limit: int = 1000,
    ts_col: str = "ts",
) -> tuple[DataFrame, DataFrame]:
    """Per-scope series-cardinality limit — the Mimir/Cortex
    ``max_series_per_user`` admission rule in batch (and Prometheus'
    scrape-side ``sample_limit`` cousin): within each ``scope_keys``
    group, only the first ``limit`` distinct series (identified by
    ``series_keys``) to EVER appear are admitted; samples of every
    later-born series are rejected wholesale.  First-come order is
    ``(first_ts, series_keys…)`` — the lexicographic tiebreak makes
    admission a total order, so replays admit the identical set (the
    determinism rule exemplars uses).

    Returns ``(admitted, audit)``: ``admitted`` is the input rows of
    admitted series; ``audit`` is ONE row per rejected series
    ``(scope…, series…, first_ts, n_samples, rank)`` — the dead-letter
    discipline of operators/validate.py applied to cardinality
    (reject carries WHY: its admission rank vs the limit).

    Scale: one hash agg to per-series extents (the shuffle carries one
    row per series), a window over the SERIES table (#series rows, not
    #samples — partitioned by scope, never keyless over raw data), and
    one broadcast-or-shuffle semi join back.  The raw table is scanned
    once and never window-functioned.
    """
    if limit < 1:
        raise ValueError(f"limit must be >= 1, got {limit}")
    scope_keys = list(scope_keys or [])
    from pyspark.sql import Window as W

    extents = df.groupBy(*scope_keys, *series_keys).agg(
        F.min(ts_col).alias("first_ts"),
        F.count(F.lit(1)).alias("n_samples"),
    )
    part = (
        W.partitionBy(*[F.col(k) for k in scope_keys])
        if scope_keys
        else W.partitionBy(F.lit(1))
    )
    order = [F.col("first_ts"), *[F.col(k) for k in series_keys]]
    ranked = extents.withColumn("rank", F.row_number().over(part.orderBy(*order)))
    admitted_series = ranked.where(F.col("rank") <= limit).select(
        *scope_keys, *series_keys
    )
    audit = ranked.where(F.col("rank") > limit).select(
        *scope_keys, *series_keys, "first_ts", "n_samples", "rank"
    )
    admitted = df.join(admitted_series, [*scope_keys, *series_keys], "left_semi")
    return admitted, audit
