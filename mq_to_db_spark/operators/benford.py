"""Benford first-significant-digit audit — data-integrity forensics.

The classic anomaly screen for "does this numeric column look
organically generated?": values spanning several orders of magnitude
follow Benford's law, P(first digit = d) = log10(1 + 1/d); fabricated,
truncated, or copy-pasted data does not.  Metrics pipelines run it as
a data-quality expectation (the same governance family as
operators/expectations.py) over payment amounts, latencies, token
counts — anything multiplicative.

Exactness discipline: the input must be INTEGRAL (the engine's
integer-cents convention, operators/nativehist.py) so the first digit
is the first character of the BIGINT's decimal string — no log10
bucketing of doubles, no float formatting differences between engines.
Counts are BIGINTs; the only doubles are one division per digit
(observed share) and the Benford expectation log10(1+1/d) — nine
fixed literal arguments whose libm agreement the DDSketch contract
query already demonstrates (operators/sketch.py determinism note).
The chi-square statistic folds the nine per-digit terms in digit
order — a fixed-order chain, never an unordered SUM.

Scale design: ONE hash aggregation (map-side combined) over at most
9 × |groups| rows; the digit extraction is a pure string expression in
whole-stage codegen.  The chi² fold runs over a 9-element array per
group.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

#: P(first digit = d), d = 1..9 — log10(1 + 1/d)
BENFORD_P = [math.log10(1.0 + 1.0 / d) for d in range(1, 10)]


def first_digit(col) -> "F.Column":
    """First significant decimal digit of an integral column (sign
    stripped), NULL for zero/NULL input."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        c != 0, F.substring(F.abs(c).cast("string"), 1, 1).cast("int")
    )


def benford_digits(
    df: DataFrame, value_col: str, keys: list[str] | None = None
) -> DataFrame:
    """Per (keys…, digit 1-9): observed count, observed share, Benford
    expected share, and the absolute deviation.  Zero/NULL values are
    excluded (they carry no leading digit)."""
    keys = keys or []
    counts = (
        df.select(*keys, first_digit(value_col).alias("digit"))
        .where(F.col("digit").isNotNull())
        .groupBy(*keys, "digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    # ≤ 9 rows per group ride this window; its exchange is reused from
    # the counts aggregation when keys match the grouping prefix
    w_tot = F.sum("n_obs").over(W.partitionBy(*keys))
    expected = F.element_at(
        F.array(*[F.lit(p) for p in BENFORD_P]), F.col("digit")
    )
    return (
        counts.withColumn("_tot", w_tot)
        .select(
            *keys,
            "digit",
            F.col("n_obs").cast("long").alias("n_obs"),
            F.col("_tot").cast("long").alias("n_total"),
            F.round(F.col("n_obs").cast("double") / F.col("_tot").cast("double"), 6).alias(
                "obs_share"
            ),
            F.round(expected, 6).alias("benford_share"),
            F.round(
                F.abs(
                    F.col("n_obs").cast("double") / F.col("_tot").cast("double")
                    - expected
                ),
                6,
            ).alias("abs_dev"),
        )
    )


def benford_chi2(
    df: DataFrame, value_col: str, keys: list[str] | None = None
) -> DataFrame:
    """Per key group: the chi-square goodness-of-fit statistic against
    Benford — ``Σ_d (n_d - N·p_d)² / (N·p_d)`` folded in digit order
    (digits with zero observations contribute their full expectation).
    One row per group: ``(keys…, n_total, chi2)``."""
    keys = keys or []
    counts = (
        df.select(*keys, first_digit(value_col).alias("digit"))
        .where(F.col("digit").isNotNull())
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            *[
                F.count_if(F.col("digit") == d).alias(f"_d{d}")
                for d in range(1, 10)
            ],
        )
    )
    n = F.col("n_total").cast("double")
    chi2 = F.lit(0.0)
    for d in range(1, 10):
        exp_d = n * F.lit(BENFORD_P[d - 1])
        dev = F.col(f"_d{d}").cast("double") - exp_d
        chi2 = chi2 + dev * dev / exp_d
    return counts.select(
        *keys,
        F.col("n_total").cast("long").alias("n_total"),
        F.round(chi2, 6).alias("chi2"),
    )
