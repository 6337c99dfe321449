"""Range (point-in-interval) join with a bucketized equi-join prefilter.

A naive ``l.ts BETWEEN r.start AND r.end`` join has no equi-key, so Spark
plans BroadcastNestedLoopJoin — O(|L|·|R|) and only viable when one side
broadcasts.  The scale construction here turns it into an equi-join:

  * pick a bucket granularity (e.g. ``1 hour``);
  * each right interval explodes to the buckets it covers
    (``sequence(floor(start), floor(end)) + explode`` — generated, never
    materialized as input);
  * each left point maps to exactly ONE bucket, so the equi-join on
    ``(by…, bucket)`` yields each candidate (l, r) pair at most once —
    no post-join dedup — and the exact predicate filters residuals.

Cost: one shuffle of |L| + |R|·(avg interval/bucket) rows.  Choose
``bucket`` near the typical interval length: too coarse → more residual
filtering per bucket; too fine → more right-side expansion.  A single
pathological interval spanning the whole timeline expands to
timeline/bucket rows — bounded, and AQE's skew split handles the hot
bucket (the skew guard the north_rule asks to be explicit about).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TRUNC = {"1 minute": "minute", "1 hour": "hour", "1 day": "day"}


def range_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    by: list[str] | None = None,
    bucket: str = "1 hour",
    end_inclusive: bool = False,
) -> DataFrame:
    """Match each left point to every right interval containing it:
    ``start <= ts < end`` (or ``<= end`` with ``end_inclusive``), plus
    optional ``by`` equi-keys.  Inner join; left columns + right columns.
    """
    if bucket not in _TRUNC:
        raise ValueError(f"bucket must be one of {sorted(_TRUNC)}")
    unit = _TRUNC[bucket]
    by = list(by or [])

    l_b = left.withColumn("_bucket", F.date_trunc(unit, F.col(ts_col)))
    # degenerate intervals (end < start, or NULL bounds) match nothing;
    # without this filter sequence() would throw on a negative range and
    # fail the whole job for one malformed row
    right = right.filter(F.col(end_col) >= F.col(start_col))
    r_b = right.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.date_trunc(unit, F.col(start_col)),
                F.date_trunc(unit, F.col(end_col)),
                F.expr(f"INTERVAL {bucket}"),
            )
        ),
    )
    cond = (F.col(ts_col) >= F.col(start_col)) & (
        F.col(ts_col) <= F.col(end_col)
        if end_inclusive
        else F.col(ts_col) < F.col(end_col)
    )
    return l_b.join(r_b, [*by, "_bucket"]).filter(cond).drop("_bucket")
