"""Welch's unequal-variance t-test — A/B comparison from exact moments.

The experimentation sibling of the seasonal/outlier plane: "did
variant A move the metric vs variant B today?"  Welch's t (unequal
variances, Satterthwaite degrees of freedom) is the standard
two-sample answer and needs only the per-group moments (n, Σv, Σv²)
— which this engine already accumulates as exact BIGINTs in its tiers,
so the test rides ONE conditional hash aggregate over raw rows, no
second pass, no window.

Exactness discipline: the caller supplies values in exact integer
units scaled so Σv² fits a BIGINT (milli-units for O(100) magnitudes;
the overflow boundary is documented at the call site, the same
contract as rollup's sumsq columns).  The float stage — means,
variances via ``Σ(v-m)² = Σv² - Σv·m``, the t statistic and the
Satterthwaite df — is a FIXED operation chain over those exact
integers, so the DuckDB oracle reproduces every double bit-for-bit
(the lm_perplexity / sax discipline).  No p-value column: the
incomplete-beta CDF is not engine-portable; consumers threshold |t|
against their chosen critical value, as dashboards do.

Degenerate groups (n < 2 or zero variance on both sides) yield NULL
``t_stat``/``dof`` rather than ±inf, keeping the surface hashable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def welch_t(
    df: DataFrame,
    keys: list[str],
    group_col: str,
    group_a: str,
    group_b: str,
    value_col: str | Column,
) -> DataFrame:
    """Per-``keys`` Welch t between ``group_a`` and ``group_b`` rows.

    ``value_col`` must be exact integer units (see module docstring).
    Returns ``keys..., n_a, n_b, mean_a, mean_b, t_stat, dof``.
    """
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    is_a = F.col(group_col) == group_a
    is_b = F.col(group_col) == group_b

    def moments(tag: Column, suffix: str):
        return [
            F.count_if(tag).alias(f"n_{suffix}"),
            F.coalesce(F.sum(F.when(tag, v)), F.lit(0)).alias(f"s_{suffix}"),
            F.coalesce(F.sum(F.when(tag, v * v)), F.lit(0)).alias(
                f"s2_{suffix}"
            ),
        ]

    g = (
        df.where(is_a | is_b)
        .groupBy(*keys)
        .agg(*moments(is_a, "a"), *moments(is_b, "b"))
    )

    def stats(suffix: str):
        n = F.col(f"n_{suffix}")
        s = F.col(f"s_{suffix}").cast("double")
        s2 = F.col(f"s2_{suffix}").cast("double")
        m = s / n
        var = (s2 - s * m) / (n - 1)  # sample variance from exact sums
        return m, var, n

    ma, va, na = stats("a")
    mb, vb, nb = stats("b")
    sea = va / na
    seb = vb / nb
    se2 = sea + seb
    t = (ma - mb) / F.sqrt(se2)
    dof = (se2 * se2) / (sea * sea / (na - 1) + seb * seb / (nb - 1))
    ok = (F.col("n_a") >= 2) & (F.col("n_b") >= 2) & (se2 > 0)
    return g.select(
        *keys,
        "n_a",
        "n_b",
        ma.alias("mean_a"),
        mb.alias("mean_b"),
        F.when(ok, t).alias("t_stat"),
        F.when(ok, dof).alias("dof"),
    )
