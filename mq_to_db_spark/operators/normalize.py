"""Robust per-group normalization: winsorization at exact picked
quantiles.

The metrics-plane preprocessing step upstream of every mean-based
rollup on heavy-tailed data (latency, token counts, payment amounts):
clamp each value into the group's [p_lo, p_hi] nearest-rank quantile
band so a handful of outliers stop dominating Σ/avg/stddev tiers.
TimescaleDB ships this as a hyperfunction-adjacent pattern; pandas as
``clip(lower=q05, upper=q95)``.

Quantile definition: the NEAREST-RANK (type-1) order statistic —
``rank = clamp(ceil(p·n), 1, n)`` over the ``(value, *tiebreak)``
ascending order.  A PICKED value, never interpolated — the
mad_outliers/theil_sen discipline that makes the DuckDB replay
hash-exact on any dtype.

Scale design — NO per-group buffer (deliberately not the
collect_list-then-element_at shape, whose buffer is O(group size) and
dies on a hot key at 100 TB):

  1. ONE sort-based window over (keys, bucket) ranks every row —
     fully spillable;
  2. the two boundary rows per group filter out of the ranked stream
     (a ~2·|groups|-row table);
  3. boundaries broadcast-join back; the clamp is a pure projection.

The ranked window is the same exchange the boundary aggregation
reuses, so the raw data shuffles exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from mq_to_db_spark.operators.rollup import bucket_col


def winsorize(
    df: DataFrame,
    keys: list[str],
    value_col: str = "value",
    tier: str = "1d",
    ts_col: str = "ts",
    p_lo: float = 0.05,
    p_hi: float = 0.95,
    tiebreak: tuple[str, ...] = (),
    out_col: str | None = None,
    broadcast_bounds: bool = True,
) -> DataFrame:
    """Clamp ``value_col`` into the group's [p_lo, p_hi] nearest-rank
    band per ``(keys…, bucket_start)``.  Appends ``out_col`` (default
    ``<value_col>_wins``) plus the group's ``lo``/``hi`` bounds; NULL
    values pass through unclamped (they hold no rank).

    ``broadcast_bounds``: right for bounded group counts (event_type ×
    day); set False for high-cardinality keys (conv × day at 10^9
    groups) so the join-back plans as a shuffle join instead of
    broadcasting a bounds table that no longer fits memory."""
    if not 0.0 <= p_lo < p_hi <= 1.0:
        raise ValueError(f"need 0 <= p_lo < p_hi <= 1, got {p_lo}, {p_hi}")
    out_col = out_col or f"{value_col}_wins"
    b = bucket_col(tier, ts_col)
    tagged = df.withColumn("_bkt", b)
    w = W.partitionBy(*keys, "_bkt").orderBy(
        F.col(value_col), *[F.col(t) for t in tiebreak]
    )
    ranked = (
        tagged.where(F.col(value_col).isNotNull())
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(W.partitionBy(*keys, "_bkt")))
    )
    lo_rank = F.greatest(F.least(F.ceil(F.lit(p_lo) * F.col("_n")), F.col("_n")), F.lit(1))
    hi_rank = F.greatest(F.least(F.ceil(F.lit(p_hi) * F.col("_n")), F.col("_n")), F.lit(1))
    bounds = (
        ranked.where((F.col("_rn") == lo_rank) | (F.col("_rn") == hi_rank))
        .groupBy(*keys, "_bkt")
        .agg(
            F.min(F.when(F.col("_rn") == lo_rank, F.col(value_col))).alias("lo"),
            F.max(F.when(F.col("_rn") == hi_rank, F.col(value_col))).alias("hi"),
        )
    )
    clamped = F.when(
        F.col(value_col).isNull(), F.lit(None).cast("double")
    ).otherwise(
        F.least(F.greatest(F.col(value_col).cast("double"), F.col("lo").cast("double")), F.col("hi").cast("double"))
    )
    bjoin = F.broadcast(bounds) if broadcast_bounds else bounds
    return (
        tagged.join(bjoin, [*keys, "_bkt"], "left")
        .withColumn(out_col, clamped)
        .withColumnRenamed("_bkt", "bucket_start")
    )
