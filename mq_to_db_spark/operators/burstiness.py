"""Traffic-shape diagnostics: burstiness (index of dispersion) and
categorical mix entropy.

Two classic single-scan statistics the alerting plane reads alongside
rates:

* **Index of dispersion (Fano factor)** — variance/mean of the
  per-minute event count inside each day.  A Poisson (memoryless)
  arrival stream has Fano ≈ 1; bursty traffic (retry storms, batch
  jobs, thundering herds) reads ≫ 1 and regular/paced traffic ≪ 1.
  The minute grid is DENSE by construction: a day has exactly 1440
  minute slots, so silent minutes contribute zero counts through the
  constant n = 1440 — no grid join, no gap-fill pass.

* **Shannon mix entropy** — −Σ p·ln p over the event-type composition
  of each bucket, plus evenness (entropy / ln(k_observed)).  A
  monoculture bucket (one type firing) reads 0; a uniform mix reads
  ln k.  The drift signal behind "did the traffic mix change?" panels.

Exactness: every input is an exact BIGINT count; doubles appear only
in the final fixed-order arithmetic — the dispersion formula is a
literal chain over two exact sums, and the entropy folds its k terms
in the FIXED event-type literal order (the benford_chi2 discipline),
never an unordered SUM over rows.

Scale: ONE map-side-combined hash aggregation each; the entropy pivot
rides ``count_if`` columns, so the shuffle carries one row per (keys,
bucket) regardless of raw volume.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mq_to_db_spark.operators.rollup import bucket_col

#: minutes per day — the dense-grid denominator
MINUTES_PER_DAY = 1440


def dispersion_1d(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
) -> DataFrame:
    """Per ``(keys…, day)``: the per-minute count's mean, population
    variance, and Fano factor over the dense 1440-slot minute grid.
    Output ``(keys…, bucket_start, n_events, minutes_active, mean_per_min,
    var_per_min, fano)``."""
    per_min = (
        df.groupBy(
            *keys,
            bucket_col("1d", ts_col).alias("bucket_start"),
            bucket_col("1m", ts_col).alias("_minute"),
        )
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    n = F.lit(MINUTES_PER_DAY).cast("double")
    agg = per_min.groupBy(*keys, "bucket_start").agg(
        F.sum("_c").alias("n_events"),
        F.count(F.lit(1)).alias("minutes_active"),
        F.sum(F.col("_c") * F.col("_c")).alias("_sq"),
    )
    # silent minutes contribute 0 to both sums; the denominator is the
    # constant dense-grid size, so mean/var are over ALL 1440 slots
    mean = F.col("n_events").cast("double") / n
    var = F.col("_sq").cast("double") / n - mean * mean
    return agg.select(
        *keys,
        "bucket_start",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("minutes_active").cast("long").alias("minutes_active"),
        F.round(mean, 6).alias("mean_per_min"),
        F.round(var, 6).alias("var_per_min"),
        F.when(F.col("n_events") > 0, F.round(var / mean, 6)).alias("fano"),
    )


def entropy_mix(
    df: DataFrame,
    category_values: list[str],
    category_col: str = "event_type",
    tier: str = "1h",
    ts_col: str = "ts",
    keys: list[str] | None = None,
) -> DataFrame:
    """Per ``(keys…, bucket_start)``: Shannon entropy of the categorical
    mix over the FIXED ``category_values`` vocabulary (categories
    outside it are ignored — the vocabulary is part of the metric
    definition, like histogram bucket edges).  Output adds
    ``n_events``, ``k_observed``, ``entropy`` (nats) and ``evenness``
    (entropy / ln k_observed; 0-category and 1-category buckets read
    0)."""
    keys = keys or []
    cats = sorted(category_values)
    agg = (
        df.where(F.col(category_col).isin(cats))
        .groupBy(*keys, bucket_col(tier, ts_col).alias("bucket_start"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            *[
                F.count_if(F.col(category_col) == c).alias(f"_c_{i}")
                for i, c in enumerate(cats)
            ],
        )
    )
    n = F.col("n_events").cast("double")
    ent: Column = F.lit(0.0)
    k_obs: Column = F.lit(0)
    for i in range(len(cats)):
        c = F.col(f"_c_{i}")
        p = c.cast("double") / n
        ent = ent + F.when(c > 0, -(p * F.log(p))).otherwise(F.lit(0.0))
        k_obs = k_obs + F.when(c > 0, 1).otherwise(0)
    return agg.select(
        *keys,
        "bucket_start",
        F.col("n_events").cast("long").alias("n_events"),
        k_obs.cast("long").alias("k_observed"),
        F.round(ent, 6).alias("entropy"),
        F.when(
            k_obs > 1, F.round(ent / F.log(k_obs.cast("double")), 6)
        )
        .otherwise(F.lit(0.0))
        .alias("evenness"),
    )
