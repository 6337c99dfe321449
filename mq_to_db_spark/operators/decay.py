"""Exponentially time-decayed scores — recency-weighted heavy hitters.

"Who matters *now*?" — the streaming-analytics answer weights each
contribution by 2^(-age/halflife) so stale volume fades instead of
being cliff-dropped by a window edge.  The reference counts messages
per consumer monotonically (internal/metrics/metrics.go — counters
never decay); this is the recency-aware ranking a 10^12-turn corpus
needs to surface currently-hot conversations/tools without rescanning
history.

Exactness discipline: ages are measured in WHOLE buckets (halflife an
integer number of buckets), so every decay factor is 2^(-k) with k a
small non-negative integer — constructed as ``1.0 / (1 << k)``, which
is EXACT in IEEE doubles (never ``pow``, whose libm rounding may
differ across engines).  Per key the per-bucket terms fold IN POSITION
ORDER (bucket ascending) via ``aggregate`` — the lm_perplexity /
sax fixed-order double-chain discipline — so scores replay
bit-identically in the DuckDB oracle's ``list_reduce``.

Scale shape: the raw table collapses to the (keys × buckets) tier in
ONE map-side-combined agg; the fold and ranking ride the tier, never
raw rows.  Per-key state is the key's own bucket count.  ZERO Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def decayed_scores(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    val_col: Column | None = None,
    bucket: str = "day",
    halflife_buckets: int = 7,
    asof: Column | None = None,
) -> DataFrame:
    """Per-key exponentially decayed score at ``asof`` (default: the
    corpus' last bucket).

    ``val_col`` is the per-row exact-integer contribution (default 1 —
    decayed counts).  Returns ``keys..., score``.
    """
    if halflife_buckets < 1:
        raise ValueError("halflife_buckets must be >= 1")
    v = val_col if val_col is not None else F.lit(1).cast("long")
    b = F.date_trunc(bucket, F.col(ts_col))
    tier = df.groupBy(*keys, b.alias("_b")).agg(F.sum(v).alias("_sc"))

    if asof is None:
        mx = tier.agg(F.max("_b").alias("_mx"))
        tier = tier.crossJoin(F.broadcast(mx))
        asof_col = F.col("_mx")
    else:
        asof_col = asof

    dd = F.datediff(asof_col, F.col("_b"))  # whole buckets of age
    k = ((dd - dd % halflife_buckets) / halflife_buckets).cast("int")
    # 1.0 / (1 << k): exact power-of-two decay (pyspark's shiftleft
    # helper takes only literal bit counts, so the column-exponent
    # shift goes through the SQL form)
    tier = tier.withColumn("_k", k)
    term = F.col("_sc").cast("double") / F.expr(
        "CAST(shiftleft(CAST(1 AS BIGINT), _k) AS DOUBLE)"
    )
    g = tier.groupBy(*keys).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("_b"), term.alias("t")))
        ).alias("_a")
    )
    score = F.aggregate(
        F.transform(F.col("_a"), lambda e: e["t"]),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return g.select(*keys, score.alias("score"))


def decayed_topk(
    df: DataFrame,
    keys: list[str],
    n: int,
    **kw,
) -> DataFrame:
    """Top-``n`` keys by decayed score with a deterministic
    (score DESC, keys ASC) rank.  The rank window runs over the
    |keys|-row score table — tier-sized, never raw rows."""
    from pyspark.sql import Window as W

    s = decayed_scores(df, keys, **kw)
    w = W.orderBy(F.desc("score"), *[F.asc(c) for c in keys])
    return (
        s.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= n)
    )
