"""Key-skew audit + salt plan — measure the hot keys, then defuse them.

The north rule demands skew handled EXPLICITLY: a 10^12-turn corpus
has conversations orders of magnitude hotter than the median, and
every conv-keyed shuffle (rollup, sessionize, dedup survivors) dies on
them unless salted.  This module is the measurement half of that
contract: ``skew_audit`` quantifies the imbalance (Gini coefficient,
top-1% / top-10% row share, median and max key size) and
``salt_plan`` turns the same counts tier into the per-key salt fan-out
the engine's salted repartition consumes — sizing from data, not
guesswork.

Scale shape: raw rows collapse to the (key → count) tier in ONE
map-side-combined agg.  Global ranks over that tier — needed for Gini
and the top-share cuts — are NOT a single-partition window: they are
the range-partitioned running count (rangewin.range_running_sum, the
epoch_shuffle discipline), so the audit parallelizes even over 10^9
distinct keys.  Everything else is exact BIGINT sums; the Gini's
float stage is a fixed literal chain over those integers
(``2·Σrank·c / (n·T) − (n+1)/n``), replayable bit-for-bit.  The
``Σ rank·c`` BIGINT stays in range while ``n_keys · total_rows``
< 2^63 — far beyond any per-table reality; the formula casts to
double before the product for headroom anyway.

``salt_plan``: ``n_salts = ceil(rows / target)`` per key, integer
arithmetic (``(c + target − 1) div target``), optionally capped —
each key's partitions then hold ≤ target rows, the dial executors are
sized against.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def key_counts(df: DataFrame, keys: list[str]) -> DataFrame:
    """The (keys → n_rows) tier: one map-side-combined hash agg."""
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))


def skew_audit(df: DataFrame, keys: list[str]) -> DataFrame:
    """One-row skew profile of ``df`` over ``keys``:
    ``n_keys, total_rows, max_key_rows, p50_key_rows, top1_share,
    top10_share, gini``."""
    from mq_to_db_spark.operators.rangewin import range_running_sum

    counts = key_counts(df, keys).withColumn("_one", F.lit(1).cast("long"))
    # global 1-based rank by (n_rows, keys...) — range-partitioned
    ranked = range_running_sum(
        counts, "n_rows", "_one", tiebreak=tuple(keys), out_col="_rank"
    )
    n = F.max("_rank")  # == n_keys (rank is a total order)
    t = F.sum("n_rows")
    s1 = F.sum(F.col("_rank") * F.col("n_rows"))
    agg = ranked.agg(
        n.alias("n_keys"),
        t.alias("total_rows"),
        s1.alias("_s1"),
        F.max("n_rows").alias("max_key_rows"),
    )
    ranked = ranked.crossJoin(F.broadcast(agg))
    k1 = F.greatest(F.lit(1).cast("long"), F.expr("n_keys div 100"))
    k10 = F.greatest(F.lit(1).cast("long"), F.expr("n_keys div 10"))
    med = F.expr("(n_keys + 1) div 2")
    out = ranked.groupBy(
        "n_keys", "total_rows", "_s1", "max_key_rows"
    ).agg(
        F.max(F.when(F.col("_rank") == med, F.col("n_rows"))).alias(
            "p50_key_rows"
        ),
        F.sum(
            F.when(F.col("_rank") > F.col("n_keys") - k1, F.col("n_rows"))
        ).alias("_top1"),
        F.sum(
            F.when(F.col("_rank") > F.col("n_keys") - k10, F.col("n_rows"))
        ).alias("_top10"),
    )
    nd = F.col("n_keys").cast("double")
    td = F.col("total_rows").cast("double")
    gini = (F.lit(2.0) * F.col("_s1").cast("double")) / (nd * td) - (
        (F.col("n_keys") + 1).cast("double") / nd
    )
    return out.select(
        "n_keys",
        "total_rows",
        "max_key_rows",
        "p50_key_rows",
        (F.col("_top1").cast("double") / td).alias("top1_share"),
        (F.col("_top10").cast("double") / td).alias("top10_share"),
        gini.alias("gini"),
    )


def salt_plan(
    df: DataFrame,
    keys: list[str],
    target_rows: int,
    max_salts: int | None = None,
) -> DataFrame:
    """Per-key salt fan-out: ``keys..., n_rows, n_salts`` with
    ``n_salts = ceil(n_rows / target_rows)`` (integer arithmetic),
    optionally capped at ``max_salts``."""
    if target_rows < 1:
        raise ValueError("target_rows must be >= 1")
    c = key_counts(df, keys)
    ns = F.expr(f"(n_rows + {target_rows - 1}) div {target_rows}")
    if max_salts is not None:
        ns = F.least(ns, F.lit(int(max_salts)).cast("long"))
    return c.select(*keys, "n_rows", ns.cast("int").alias("n_salts"))
