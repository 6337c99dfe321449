"""ASAP-style automatic smoothing-window selection for dashboard series.

ASAP (Rong & Bailis, "ASAP: Prioritizing Attention via Time Series
Smoothing", VLDB 2017) answers the dashboard question "how much should
this series be smoothed before a human looks at it?": pick the moving-
average window that minimizes *roughness* (the standard deviation of
the smoothed series' first differences) while *preserving deviations*
(the smoothed series' kurtosis must not drop below the original's —
long-tailed spikes survive smoothing).  The reference's Grafana panels
hardcode their `rate[1m]` smoothing windows per panel
(/root/reference/docker-compose/grafana/dashboards/mq-to-db.json);
this operator makes the choice a deterministic engine-side computation
over tier series.

Engine semantics (deterministic restriction of the paper's search):

  * candidates come from a FIXED ladder of window widths (default
    1,2,3,4,6,8,12,24 buckets — the divisors a 1h-tier dashboard
    offers), not the paper's autocorrelation-guided on-line search —
    the ladder makes the whole computation replayable by the SQL
    oracle, and for tier-sized inputs evaluating all rungs is cheaper
    than pruning;
  * the moving aggregate is the trailing window SUM ``s_w`` (emitted
    only at full windows).  Kurtosis is scale-invariant, so
    ``kurt(s_w) == kurt(sma_w)`` exactly; roughness is scale-EQUI-
    variant, so ``roughness(sma_w) = std(diff(s_w)) / w`` — both
    metrics are therefore computed from the INTEGER rolling sums, and
    every aggregation below is an exact DECIMAL/BIGINT power sum
    (order-independent), with one fixed-order double formula at the
    end — the engine's standard oracle-exactness discipline
    (operators/seasonal.py, correlate.py);
  * chosen window: among rungs whose kurtosis >= the original series'
    kurtosis (the ``w=1`` rung — always qualified, the paper's
    fallback), the minimum roughness, ties to the smaller ``w``.

Bounds: per-row 4th powers are exact up to ``s_w < 1e9`` (DECIMAL(38)
products; ANSI mode raises rather than corrupting on overflow) —
micro-unit-scale gauges should be pre-aggregated to tier counts first,
the same caveat as seasonal.with_seasonal.

Scale design: ONE sort exchange computes every rung's rolling sum and
lag diff (all window expressions share the (keys, ts) spec, so Catalyst
stacks them in one WindowExec pass), a ``stack`` unpivot (projection),
then ONE hash aggregation of |ladder| x |buckets| skinny integer rows;
the choose step is a per-key window over |ladder| rows.  Input is tier
rows, never raw turns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = ["ASAP_LADDER", "asap_metrics", "asap_smooth"]

#: default candidate widths (in buckets) for a 1h-tier series
ASAP_LADDER = (1, 2, 3, 4, 6, 8, 12, 24)


def asap_metrics(
    tier: DataFrame,
    keys: list[str],
    ts_col: str = "bucket_start",
    value_col: str = "value",
    ladder: tuple[int, ...] = ASAP_LADDER,
) -> DataFrame:
    """Per ``(keys…, w)``: the ASAP candidate table.

    Output columns: ``w``, ``n_s`` (full windows), ``n_d`` (diffs),
    ``kurt`` (excess kurtosis of the rolling sums, 6 dp, NULL when
    undefined), ``roughness`` (std of sma diffs = std(diff(s_w))/w,
    6 dp, NULL when n_d < 2) and ``chosen`` (the ASAP pick — exactly
    one true row per key when any rung has a defined roughness).
    """
    if not ladder or ladder[0] != 1:
        raise ValueError("ladder must start at 1 (the original series rung)")
    ord_w = W.partitionBy(*keys).orderBy(ts_col)
    df = tier.withColumn("_rn", F.row_number().over(ord_w))
    v = F.col(value_col).cast("long")
    for w in ladder:
        frame = ord_w.rowsBetween(-(w - 1), 0)
        df = df.withColumn(
            f"_s{w}",
            F.when(F.col("_rn") >= w, F.sum(v).over(frame)),
        )
    for w in ladder:
        df = df.withColumn(
            f"_d{w}", F.col(f"_s{w}") - F.lag(f"_s{w}").over(ord_w)
        )
    stack_args = ", ".join(f"{w}, _s{w}, _d{w}" for w in ladder)
    long = df.selectExpr(
        *keys, f"stack({len(ladder)}, {stack_args}) AS (w, s, d)"
    )
    sd = F.col("s").cast("decimal(38,0)")
    dd = F.col("d").cast("decimal(38,0)")
    agg = long.groupBy(*keys, "w").agg(
        F.count("s").alias("n_s"),
        F.sum(sd).alias("_s1"),
        F.sum(sd * sd).alias("_s2"),
        F.sum(sd * sd * sd).alias("_s3"),
        F.sum(sd * sd * sd * sd).alias("_s4"),
        F.count("d").alias("n_d"),
        F.sum(dd).alias("_d1"),
        F.sum(dd * dd).alias("_d2"),
    )
    # fixed-order double formulas over the exact sums (identical text in
    # the DuckDB oracle -> identical IEEE results)
    n = F.col("n_s").cast("double")
    s1, s2 = F.col("_s1").cast("double"), F.col("_s2").cast("double")
    s3, s4 = F.col("_s3").cast("double"), F.col("_s4").cast("double")
    mu = s1 / n
    m2 = s2 / n - mu * mu
    m4 = s4 / n - 4 * mu * (s3 / n) + 6 * mu * mu * (s2 / n) - 3 * mu * mu * mu * mu
    kurt = F.when((F.col("n_s") >= 2) & (m2 > 0), m4 / (m2 * m2) - 3)
    nd = F.col("n_d").cast("double")
    d1, d2 = F.col("_d1").cast("double"), F.col("_d2").cast("double")
    var_d = F.greatest((d2 - d1 * d1 / nd) / (nd - 1), F.lit(0.0))
    rough = F.when(F.col("n_d") >= 2, F.sqrt(var_d) / F.col("w"))
    m = agg.select(*keys, "w", "n_s", "n_d", kurt.alias("_kurt"), rough.alias("_rough"))
    # choose: min roughness among rungs preserving the w=1 kurtosis
    part = W.partitionBy(*keys)
    kurt1 = F.max(F.when(F.col("w") == 1, F.col("_kurt"))).over(part)
    qualified = (F.col("w") == 1) | (F.col("_kurt") >= kurt1)
    cand = F.when(
        qualified & F.col("_rough").isNotNull(),
        F.struct(F.col("_rough").alias("r"), F.col("w").alias("w")),
    )
    best = F.min(cand).over(part)
    chosen = cand.isNotNull() & (cand == best)
    return m.select(
        *keys,
        "w",
        "n_s",
        "n_d",
        F.round("_kurt", 6).alias("kurt"),
        F.round("_rough", 6).alias("roughness"),
        F.coalesce(chosen, F.lit(False)).alias("chosen"),
    )


def asap_smooth(
    tier: DataFrame,
    keys: list[str],
    ts_col: str = "bucket_start",
    value_col: str = "value",
    ladder: tuple[int, ...] = ASAP_LADDER,
) -> DataFrame:
    """The smoothed series at each key's chosen window: ``(keys…, ts,
    w, sma)`` — trailing mean over the ASAP-chosen width, emitted at
    full windows only.  Two passes over tier-sized input (metrics +
    re-smooth with the chosen width joined back by key)."""
    chosen = (
        asap_metrics(tier, keys, ts_col, value_col, ladder)
        .where("chosen")
        .select(*keys, F.col("w").alias("_w"))
    )
    ord_w = W.partitionBy(*keys).orderBy(ts_col)
    df = tier.withColumn("_rn", F.row_number().over(ord_w))
    v = F.col(value_col).cast("long")
    for w in ladder:
        frame = ord_w.rowsBetween(-(w - 1), 0)
        df = df.withColumn(
            f"_s{w}", F.when(F.col("_rn") >= w, F.sum(v).over(frame))
        )
    joined = (
        df.join(F.broadcast(chosen), keys, "inner")
        if keys
        else df.crossJoin(F.broadcast(chosen))
    )
    s_at = None
    for w in ladder:
        branch = F.when(F.col("_w") == w, F.col(f"_s{w}"))
        s_at = branch if s_at is None else F.coalesce(s_at, branch)
    return joined.select(
        *keys,
        F.col(ts_col),
        F.col("_w").alias("w"),
        F.round(s_at.cast("double") / F.col("_w"), 6).alias("sma"),
    ).where(F.col("sma").isNotNull())
