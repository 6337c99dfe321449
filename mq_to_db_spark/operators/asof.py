"""As-of (backward) join — the canonical time-series point-in-time join.

Spark has no ASOF JOIN; the naive emulation (range join + row_number, or
a per-key ``mapInPandas`` merge) either explodes candidate pairs or
leaves the JVM.  This operator uses the union + ordered-window
last-observation-carried-forward construction:

    tag rows (right=0, left=1) → union → one shuffle+sort on
    (by, on, side) → ``last(right_struct, ignorenulls)`` over an
    unbounded-preceding window → keep left rows.

Cost: ONE shuffle of |L|+|R| rows and one sort — no pair expansion, no
Python, and the window sort reuses the shuffle's partitioning.  A right
row at exactly ``on == left.on`` matches (≤ semantics) because right
sorts before left on the tie-break side column.  All carried right
columns travel in ONE struct, so they always come from the same right
row even when individual right values are NULL.

The **keyless** form (``by=[]``) cannot use a global window (that would
serialize |L|+|R| rows through one task).  Instead it range-partitions
on the time column (``width_bucket`` over the [min, max] extent) and
runs the same LOCF window *per range*, then patches each range's
leading rows with a broadcast **boundary carry**: the last right
observation of every earlier range, computed by a tiny per-range agg +
prefix-LOCF over the (n_buckets)-row spine.  Two extra cheap jobs
(min/max extent, per-range last) buy full parallelism on the big
shuffle.

``tolerance`` (e.g. ``"1 hour"``) nulls matches older than the bound,
matching ``pandas.merge_asof`` / DuckDB ``ASOF JOIN`` + filter
semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: list[str] | None = None,
    value_cols: list[str] | None = None,
    tolerance: str | None = None,
    suffix: str = "_right",
    range_buckets: int | None = None,
) -> DataFrame:
    """For every left row, attach the latest right row with
    ``right.on <= left.on`` (per ``by`` group).

    ``value_cols``: right columns to carry (default: all non-key,
    non-``on`` columns).  The matched right timestamp is exposed as
    ``{on}{suffix}``; unmatched (or out-of-tolerance) rows keep NULLs.
    ``range_buckets``: parallelism of the keyless path (default
    4 × defaultParallelism); ignored when ``by`` is given.
    """
    by = list(by or [])
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (*by, on)]

    r_struct = F.struct(
        *[F.col(c).alias(c) for c in value_cols], F.col(on).alias("_on")
    )
    struct_type = right.select(r_struct.alias("_r")).schema["_r"].dataType

    l_cols = [c for c in left.columns]
    l_tag = left.select(
        *[F.col(c) for c in l_cols],
        F.lit(1).alias("_side"),
        F.lit(None).cast(struct_type).alias("_r"),
    )
    r_tag = right.filter(F.col(on).isNotNull()).select(
        # right rows with NULL `on` can never satisfy right.on <= left.on
        # (and would otherwise sort nulls-first and be carried forward)
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in l_cols
            if c not in (*by, on)
        ],
        *[F.col(c) for c in (*by, on)],
        F.lit(0).alias("_side"),
        r_struct.alias("_r"),
    ).select(*[c for c in l_cols], "_side", "_r")  # align column order

    unioned = l_tag.unionByName(r_tag)
    if by:
        w = (
            W.partitionBy(*by)
            .orderBy(on, "_side")
            .rowsBetween(W.unboundedPreceding, 0)
        )
        filled = unioned.withColumn("_m", F.last("_r", ignorenulls=True).over(w))
    else:
        from mq_to_db_spark.operators.rangewin import range_locf

        filled = range_locf(
            unioned, on, "_r", tiebreak=("_side",), out_col="_m",
            n_buckets=range_buckets,
        )
    out = filled.filter(F.col("_side") == 1)

    matched = F.col("_m")
    if tolerance is not None:
        in_tol = matched["_on"] >= F.col(on) - F.expr(f"INTERVAL {tolerance}")
        matched = F.when(in_tol, F.col("_m"))
    return out.select(
        *[F.col(c) for c in l_cols],
        *[matched[c].alias(f"{c}{suffix}") for c in value_cols],
        matched["_on"].alias(f"{on}{suffix}"),
    )
