"""Rolling-origin forecast backtesting over tier series.

The engine ships forecasters (holt_linear / holt_winters_seasonal /
deriv_predict); production also needs the QA loop that says whether
they beat the do-nothing baselines — the M-competition discipline of
scoring every method against *naive* (persistence, ŷ_t = y_{t-1}) and
*seasonal-naive* (ŷ_t = y_{t-m}).  This operator evaluates both
baselines at every origin of a DENSE tier series and aggregates exact
per-period accuracy: the two numbers any fancier model must beat, and
the denominator of the standard MASE scale.

Metric choices are dictated by the engine's oracle-exactness
discipline (integer sums first, one fixed-order double at the end):

  * ``mae_*``     — Σ|e| / n with Σ|e| an exact BIGINT;
  * ``bias``      — Σe / n (signed, exact numerator);
  * ``wmape``     — Σ|e| / Σ|y| (weighted MAPE — the production
    alternative to sMAPE whose numerator/denominator are BOTH exact
    BIGINTs; a per-term sMAPE sum of doubles would be
    summation-order-dependent and could not hash-match a replay);
  * ``mase``      — Σ|e_seasonal| / Σ|e_naive| over the SAME
    evaluation rows (both forecasts defined), an exact-integer ratio;
    < 1 means seasonal-naive beats persistence.

Rows are evaluated only where BOTH lags exist (t > m), so every metric
shares one evaluation set.  Input must be a DENSE series (gap-fill /
zero-fill first — on a sparse series a row lag is not a time lag, the
same precondition as wow_delta/asap).

Scale: ONE keyed window sort produces both lags (same partition/order
spec), then one map-side-combined hash aggregation of exact BIGINTs per
(keys, period) — tier-sized input, never raw turns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = ["backtest_naive"]


def backtest_naive(
    tier: DataFrame,
    keys: list[str],
    ts_col: str = "bucket_start",
    value_col: str = "v",
    season: int = 24,
    period: str = "day",
) -> DataFrame:
    """Per ``(keys…, period_start)``: exact backtest metrics of the
    naive and seasonal-naive forecasters (see module docstring).

    Output: ``n_eval``, ``abs_err_naive``, ``abs_err_seasonal`` (exact
    BIGINT Σ|e|), ``mae_naive``, ``mae_seasonal``, ``bias_seasonal``,
    ``wmape_seasonal``, ``mase`` (6 dp doubles, NULL where the guard
    denominator is 0)."""
    if season < 1:
        raise ValueError(f"season must be >= 1, got {season}")
    w = W.partitionBy(*keys).orderBy(ts_col)
    v = F.col(value_col).cast("long")
    lagged = tier.select(
        *keys,
        F.col(ts_col),
        v.alias("_y"),
        F.lag(v, 1).over(w).alias("_f_naive"),
        F.lag(v, season).over(w).alias("_f_seas"),
    ).where(F.col("_f_naive").isNotNull() & F.col("_f_seas").isNotNull())
    e_n = F.col("_y") - F.col("_f_naive")
    e_s = F.col("_y") - F.col("_f_seas")
    agg = lagged.groupBy(
        *keys, F.date_trunc(period, F.col(ts_col)).alias("period_start")
    ).agg(
        F.count(F.lit(1)).alias("n_eval"),
        F.sum(F.abs(e_n)).alias("abs_err_naive"),
        F.sum(F.abs(e_s)).alias("abs_err_seasonal"),
        F.sum(e_s).alias("_err_seas"),
        F.sum(F.abs(F.col("_y"))).alias("_abs_y"),
    )
    n = F.col("n_eval").cast("double")
    return agg.select(
        *keys,
        "period_start",
        "n_eval",
        "abs_err_naive",
        "abs_err_seasonal",
        F.round(F.col("abs_err_naive").cast("double") / n, 6).alias("mae_naive"),
        F.round(F.col("abs_err_seasonal").cast("double") / n, 6).alias(
            "mae_seasonal"
        ),
        F.round(F.col("_err_seas").cast("double") / n, 6).alias("bias_seasonal"),
        F.round(
            F.try_divide(
                F.col("abs_err_seasonal").cast("double"),
                F.col("_abs_y").cast("double"),
            ),
            6,
        ).alias("wmape_seasonal"),
        F.round(
            F.try_divide(
                F.col("abs_err_seasonal").cast("double"),
                F.col("abs_err_naive").cast("double"),
            ),
            6,
        ).alias("mase"),
    )
