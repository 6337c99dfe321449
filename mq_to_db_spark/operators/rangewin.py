"""Range-partitioned global window fill.

A keyless ``last(x, ignorenulls) OVER (ORDER BY t)`` forces Spark to a
single window partition — every row through one task.  This helper keeps
the same semantics at full parallelism:

  1. bucket rows by ``width_bucket`` over the [min, max] extent of the
     order column (one cheap columnar min/max job);
  2. run the LOCF window *per bucket* (hash-partitioned shuffle);
  3. patch each bucket's leading rows with a broadcast **prefix carry**:
     the last observation of every earlier bucket, computed by a tiny
     per-bucket agg + a prefix-LOCF over the (n_buckets)-row spine — the
     one place a single partition is trivially fine.

Used by the keyless as-of join (operators/asof.py), keyless gap-fill
interpolation (operators/gapfill.py), and the concurrency sweep-line's
global running sum (operators/concurrency.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def numeric_order_col(df: DataFrame, order_col: str) -> Column:
    """``order_col`` as a monotonic DOUBLE suitable for ``width_bucket``
    ranging.  Temporal columns go through an epoch cast — a plain
    ``.cast('double')`` raises on TIMESTAMP_NTZ (the type parquet
    timestamps read back as), and DATE can't cast to double at all.
    NTZ→LTZ interprets in the session timezone (UTC), which is monotonic
    and deterministic — all this is used for is range bucketing."""
    dt = dict(df.dtypes).get(order_col, "")
    c = F.col(order_col)
    if dt.startswith("timestamp") or dt == "date":
        return c.cast("timestamp_ltz").cast("double")
    return c.cast("double")


def range_locf(
    df: DataFrame,
    order_col: str,
    fill_col: str,
    tiebreak: tuple[str, ...] = (),
    out_col: str | None = None,
    n_buckets: int | None = None,
    reverse: bool = False,
) -> DataFrame:
    """Fill ``out_col`` (default: overwrite ``fill_col``) with the last
    non-null ``fill_col`` at-or-before each row in the global
    ``(order_col, *tiebreak)`` order — equivalent to a single global
    LOCF window, executed range-partitioned.  ``reverse=True`` fills
    with the first non-null observation at-or-*after* instead (NOCB —
    the "next" side of linear interpolation).

    Rows with NULL ``order_col`` receive no carry (they sit outside the
    range order)."""
    out_col = out_col or fill_col
    spark = df.sparkSession
    if n_buckets is None:
        n_buckets = max(spark.sparkContext.defaultParallelism, 1) * 4
    od = numeric_order_col(df, order_col)
    order_exprs = (
        [F.col(order_col).desc(), *[F.col(t).desc() for t in tiebreak]]
        if reverse
        else [F.col(order_col), *[F.col(t) for t in tiebreak]]
    )
    locf: Column = F.last(fill_col, ignorenulls=True)
    ext = df.agg(F.min(od).alias("mn"), F.max(od).alias("mx")).first()
    if ext.mn is None or ext.mn == ext.mx or n_buckets <= 1:
        # degenerate extent (≤1 distinct instant): single partition is
        # both unavoidable and harmless
        w = (
            W.partitionBy(F.lit(1))
            .orderBy(*order_exprs)
            .rowsBetween(W.unboundedPreceding, 0)
        )
        return df.withColumn(out_col, locf.over(w))
    rb = F.width_bucket(od, F.lit(ext.mn), F.lit(ext.mx), F.lit(n_buckets)).cast("int")
    tagged = df.withColumn("_rb", rb)
    w_in = (
        W.partitionBy("_rb")
        .orderBy(*order_exprs)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    filled = tagged.withColumn(out_col, locf.over(w_in))
    # boundary observation per bucket (ties on the order value break
    # arbitrarily, matching the window's tie behavior) → prefix carry
    boundary = F.min_by(fill_col, od) if reverse else F.max_by(fill_col, od)
    last_per_bucket = (
        tagged.filter(F.col(fill_col).isNotNull())
        .groupBy("_rb")
        .agg(boundary.alias("_lastv"))
    )
    spine = spark.range(1, n_buckets + 2).select(F.col("id").cast("int").alias("_rb"))
    w_carry = (
        W.orderBy(F.col("_rb").desc() if reverse else F.col("_rb"))
        .rowsBetween(W.unboundedPreceding, -1)
    )
    carry = (
        spine.join(last_per_bucket, "_rb", "left")
        .withColumn("_carry", F.last("_lastv", ignorenulls=True).over(w_carry))
        .select("_rb", "_carry")
    )
    return (
        filled.join(F.broadcast(carry), "_rb", "left")
        .withColumn(out_col, F.coalesce(F.col(out_col), F.col("_carry")))
        .drop("_rb", "_carry")
    )


def range_running_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    tiebreak: tuple[str, ...] = (),
    out_col: str = "running_sum",
    n_buckets: int | None = None,
) -> DataFrame:
    """Global cumulative ``SUM(value_col) OVER (ORDER BY order_col,
    *tiebreak ROWS UNBOUNDED PRECEDING..CURRENT)`` executed
    range-partitioned — the prefix-sum sibling of :func:`range_locf`.

    Same three-step shape: width_bucket ranging over the [min, max]
    extent, a per-bucket running sum (hash shuffle, full parallelism),
    then a broadcast prefix carry holding the SUM of every earlier
    bucket's total (computed on the tiny n_buckets-row spine).  NULL
    ``value_col`` rows contribute 0; NULL ``order_col`` rows receive no
    carry.  Used by the concurrency sweep-line, where a naive keyless
    window would drag every boundary event through one task."""
    return range_running_sums(
        df,
        order_col,
        {out_col: value_col},
        tiebreak=tiebreak,
        n_buckets=n_buckets,
    )


def range_running_sums(
    df: DataFrame,
    order_col: str,
    sums: dict[str, str],
    tiebreak: tuple[str, ...] = (),
    n_buckets: int | None = None,
) -> DataFrame:
    """N global cumulative sums over the SAME order in ONE
    range-partitioned pass — ``sums`` maps ``out_col -> value_col``.
    One extent job, one per-bucket window shuffle, and one broadcast
    prefix-carry join amortized across every requested sum (a caller
    looping :func:`range_running_sum` pays each of those per column)."""
    spark = df.sparkSession
    if n_buckets is None:
        n_buckets = max(spark.sparkContext.defaultParallelism, 1) * 4
    od = numeric_order_col(df, order_col)
    order_exprs = [F.col(order_col), *[F.col(t) for t in tiebreak]]
    ext = df.agg(F.min(od).alias("mn"), F.max(od).alias("mx")).first()
    if ext is None or ext.mn is None or ext.mn == ext.mx or n_buckets <= 1:
        w = (
            W.partitionBy(F.lit(1))
            .orderBy(*order_exprs)
            .rowsBetween(W.unboundedPreceding, 0)
        )
        out = df
        for out_col, value_col in sums.items():
            out = out.withColumn(out_col, F.sum(value_col).over(w))
        return out
    rb = F.width_bucket(od, F.lit(ext.mn), F.lit(ext.mx), F.lit(n_buckets)).cast("int")
    tagged = df.withColumn("_rb", rb)
    w_in = (
        W.partitionBy("_rb")
        .orderBy(*order_exprs)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    partial = tagged
    for out_col, value_col in sums.items():
        partial = partial.withColumn(out_col, F.sum(value_col).over(w_in))
    totals = tagged.groupBy("_rb").agg(
        *[
            F.sum(value_col).alias(f"_tot_{out_col}")
            for out_col, value_col in sums.items()
        ]
    )
    spine = spark.range(1, n_buckets + 2).select(F.col("id").cast("int").alias("_rb"))
    w_carry = W.orderBy("_rb").rowsBetween(W.unboundedPreceding, -1)
    carry = spine.join(totals, "_rb", "left")
    for out_col in sums:
        carry = carry.withColumn(
            f"_carry_{out_col}", F.sum(f"_tot_{out_col}").over(w_carry)
        )
    carry = carry.select(
        "_rb", *[f"_carry_{out_col}" for out_col in sums]
    )
    out = partial.join(F.broadcast(carry), "_rb", "left")
    for out_col in sums:
        out = out.withColumn(
            out_col,
            F.coalesce(F.col(out_col), F.lit(0))
            + F.coalesce(F.col(f"_carry_{out_col}"), F.lit(0)),
        )
    return out.drop("_rb", *[f"_carry_{out_col}" for out_col in sums])
