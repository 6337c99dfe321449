"""Concurrency curve: how many intervals are active at each grid instant.

The reference exposes "in-flight messages" only as a point-in-time gauge
(`mq_to_db_consumer_running` / `storage_workers_running`,
/root/reference/internal/metrics/metrics.go:62-118, scraped every 5 s);
over an *historical* interval table (sessions, conversations, tool
invocations) the same question — "how many were running at time t?" —
needs an interval-overlap count.

The naive plan is a range join (grid × intervals on ``start ≤ g ≤ end``):
O(|grid|·|intervals|) pairs before filtering, hopeless at 10^12 turns.
This operator is the classic **sweep line**, expressed entirely in
narrow-row DataFrame ops:

  1. explode each interval into two boundary events: ``(+1, start)`` and
     ``(-1, end + 1 µs)`` (end-inclusive semantics) — a projection, no
     shuffle;
  2. collapse identical boundary timestamps with one hash aggregation
     (makes the running order unambiguous and shrinks the sweep to
     distinct instants);
  3. global running sum over boundary time via
     :func:`~mq_to_db_spark.operators.rangewin.range_running_sum` —
     range-partitioned prefix sum, NOT a single-partition window;
  4. as-of join the query grid to the last boundary at-or-before each
    grid instant (one more bounded shuffle; missing ⇒ 0 active).

Every shuffle in the plan carries ≤ 16-byte rows (timestamp + delta).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .asof import asof_join
from .rangewin import range_running_sum


def sweepline_counts(
    intervals: DataFrame,
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    n_buckets: int | None = None,
) -> DataFrame:
    """Step-function table ``(t, active)``: the number of intervals with
    ``start ≤ t ≤ end``, evaluated at every boundary instant (the value
    holds until the next boundary).  Intervals with NULL bounds or
    ``end < start`` are dropped."""
    iv = intervals.filter(
        F.col(start_col).isNotNull()
        & F.col(end_col).isNotNull()
        & (F.col(end_col) >= F.col(start_col))
    )
    opens = iv.select(F.col(start_col).alias("t"), F.lit(1).alias("d"))
    closes = iv.select(
        (F.col(end_col) + F.expr("INTERVAL 1 MICROSECOND")).alias("t"),
        F.lit(-1).alias("d"),
    )
    deltas = opens.unionByName(closes).groupBy("t").agg(F.sum("d").alias("d"))
    curve = range_running_sum(deltas, "t", "d", out_col="active", n_buckets=n_buckets)
    return curve.select("t", F.col("active").cast("long").alias("active"))


def concurrency_at_grid(
    intervals: DataFrame,
    grid: DataFrame,
    grid_col: str = "grid_ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    n_buckets: int | None = None,
) -> DataFrame:
    """Sample the sweep-line step function at each ``grid`` instant:
    ``(grid_col, active)`` where ``active`` counts intervals with
    ``start ≤ g ≤ end`` (0 where nothing is active)."""
    curve = sweepline_counts(intervals, start_col, end_col, n_buckets=n_buckets)
    sampled = asof_join(
        grid.select(F.col(grid_col).alias("t")),
        curve.withColumnRenamed("active", "a"),
        on="t",
        value_cols=["a"],
        range_buckets=n_buckets,
    )
    return sampled.select(
        F.col("t").alias(grid_col),
        F.coalesce(F.col("a_right"), F.lit(0)).cast("long").alias("active"),
    )


def time_grid(
    df: DataFrame,
    ts_col: str = "ts",
    step: str = "10 minutes",
    align: str = "day",
    out_col: str = "grid_ts",
) -> DataFrame:
    """Dense instant grid spanning ``df``'s [min, max] extent of
    ``ts_col``, left edge floored to ``align``: one two-value agg (the
    only driver action), then a distributed ``sequence`` explode —
    the same grid shape the gap-fill operator generates."""
    ext = df.agg(
        F.date_trunc(align, F.min(ts_col)).alias("lo"), F.max(ts_col).alias("hi")
    )
    return ext.select(
        F.explode(F.sequence("lo", "hi", F.expr(f"INTERVAL {step}"))).alias(out_col)
    ).repartition(df.sparkSession.sparkContext.defaultParallelism, out_col)
