"""Population Stability Index — the distribution-drift gate.

PSI is the standard production-ML drift score: bucketize a metric,
compare each period's bucket shares ``p`` against a baseline's ``q``,
``PSI = Σ (p-q)·ln(p/q)`` (≥ 0.2 conventionally "significant drift").
For a training-data pipeline it is the gate that catches a corpus
whose value/length/score distribution silently shifted between
ingestion windows — the distributional sibling of the `oov_rate`
lexical gate and the `expectations` row-level gate.

Exactness discipline: buckets are LITERAL integer edges over exact
integer units — the bucket index is a sum of ``(v >= edge)``
comparisons, pure codegen, replayed as the identical CASE sum in SQL.
Counts are BIGINTs; shares use add-one (Laplace) smoothing
``(c+1)/(n+B)`` so empty buckets contribute finite terms with no
epsilon constants to disagree about.  The PSI sum folds IN BUCKET
ORDER via ``aggregate`` (the fixed-order double-chain discipline), so
the score replays bit-for-bit — ``ln`` parity between the JVM and
DuckDB holds throughout this contract (lm_perplexity, entropy,
survival precedents).

Scale shape: ONE hash agg over raw rows to (period × bucket) counts —
everything after rides that tier: the baseline is a re-aggregation of
the SAME counts (no second scan), the dense period×bucket grid is a
literal-array explode, and the fold is per-period.  ZERO Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucket_index(v: Column, edges: list[int]) -> Column:
    """Index into ``len(edges)+1`` buckets: Σ (v >= edge) — exact
    integer compares against literal edges."""
    idx = F.lit(0)
    for e in edges:
        idx = idx + (v >= F.lit(e)).cast("int")
    return idx


def psi(
    df: DataFrame,
    period_col: Column,
    value_col: Column,
    edges: list[int],
) -> DataFrame:
    """Per-period PSI of ``value_col``'s bucket distribution vs the
    all-periods baseline.  Returns ``period, n, psi``."""
    nb = len(edges) + 1
    counts = (
        df.select(
            period_col.alias("period"),
            bucket_index(value_col, edges).alias("b"),
        )
        .groupBy("period", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    base = counts.groupBy("b").agg(F.sum("c").alias("cq"))
    tot_q = counts.agg(F.sum("c").alias("nq"))

    # dense period × bucket grid from literals — zero-count buckets
    # must exist for their smoothed terms
    grid = (
        counts.select("period")
        .distinct()
        .crossJoin(
            F.broadcast(
                counts.sparkSession.range(nb).select(
                    F.col("id").cast("int").alias("b")
                )
            )
        )
    )
    full = (
        grid.join(counts, ["period", "b"], "left")
        .join(F.broadcast(base), "b", "left")
        .crossJoin(F.broadcast(tot_q))
        .select(
            "period",
            "b",
            F.coalesce("c", F.lit(0)).alias("c"),
            F.coalesce("cq", F.lit(0)).alias("cq"),
            "nq",
        )
    )
    per = full.groupBy("period").agg(
        F.sum("c").alias("n"),
        F.sort_array(
            F.collect_list(F.struct(F.col("b"), F.col("c"), F.col("cq"), F.col("nq")))
        ).alias("_a"),
    )
    terms = F.transform(
        F.col("_a"),
        lambda e: (
            (e["c"] + 1) / (F.col("n") + F.lit(nb))
            - (e["cq"] + 1) / (e["nq"] + F.lit(nb))
        )
        * F.log(
            ((e["c"] + 1) / (F.col("n") + F.lit(nb)))
            / ((e["cq"] + 1) / (e["nq"] + F.lit(nb)))
        ),
    )
    score = F.aggregate(terms, F.lit(0.0), lambda a, x: a + x)
    return per.select("period", "n", score.alias("psi"))
