"""PromQL-style vector matching: binary ops between two series sets.

The reference's dashboards divide one scraped series by another
(`rate(..._messages_total{ack}[1m]) / rate(..._messages_total[1m])`,
/root/reference/docker-compose/grafana/dashboards/mq-to-db.json) —
Prometheus evaluates that with *vector matching*: samples pair up when
their label sets agree on the matching labels (`on(...)` /
`ignoring(...)`), with `group_left` for many-to-one joins and
`and` / `or` / `unless` as label-set algebra.  Over a rolled-up tier
table the same semantics are plain relational operations — each
evaluates as ONE equi-join (or left-semi / left-anti / outer union)
on (bucket_start, matching labels), broadcastable when one side is a
small recording rule, AQE-skew-safe otherwise; never a Python UDF.

Series tables are tier-shaped: ``bucket_start`` + label columns + one
value column.  At 10^12 turns both sides are tier-sized (buckets ×
series), orders of magnitude below raw — the joins here are the cheap
stage of any dashboard expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_OPS = {
    "+": lambda a, b: a + b,
    "-": lambda a, b: a - b,
    "*": lambda a, b: a * b,
    # PromQL division never raises: x/0 is +Inf/NaN there; tier math
    # wants NULL (absent sample) — try_divide gives NULL, documented.
    "/": lambda a, b: F.try_divide(a, b),
    "%": lambda a, b: a % b,
    ">": lambda a, b: a > b,
    "<": lambda a, b: a < b,
    ">=": lambda a, b: a >= b,
    "<=": lambda a, b: a <= b,
    "==": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
}


def _match_cols(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | None,
    ignoring: list[str] | None,
    value_col: str = "value",
) -> list[str]:
    if on is not None and ignoring is not None:
        raise ValueError("pass either on= or ignoring=, not both")
    if on is not None:
        cols = ["bucket_start", *[c for c in on if c != "bucket_start"]]
    else:
        # labels = shared columns minus the ignored ones; the sample
        # value is never a label (PromQL matches on label sets)
        skip = set(ignoring or []) | {value_col}
        cols = [
            c
            for c in left.columns
            if c in set(right.columns) and c not in skip
        ]
        if "bucket_start" not in cols:
            raise ValueError("bucket_start must participate in the match")
    missing = [c for c in cols if c not in left.columns or c not in right.columns]
    if missing:
        raise ValueError(f"matching labels absent from a side: {missing}")
    return cols


def vector_binop(
    left: DataFrame,
    right: DataFrame,
    op: str,
    value_col: str = "value",
    on: list[str] | None = None,
    ignoring: list[str] | None = None,
    group_left: bool = False,
    out_col: str = "value",
) -> DataFrame:
    """``left <op> right`` with PromQL matching semantics.

    One-to-one by default: rows pair on ``(bucket_start, match labels)``
    (``on=`` names them; ``ignoring=`` takes the shared columns minus the
    listed ones); unmatched rows drop (inner join), exactly Prometheus.
    ``group_left=True`` allows many-to-one: every left row joins the
    single right row sharing its match labels and KEEPS its extra label
    columns (the PromQL ``group_left`` label-copy direction).  The
    result carries the match labels, the left side's surviving labels,
    and ``out_col``.

    Plan: one equi-join on the match labels — broadcast when the right
    side (typically a coarse recording rule, e.g. per-bucket totals) is
    small, shuffle otherwise; comparison ops return booleans (the
    PromQL ``bool`` modifier shape) rather than filtering, so the
    result is oracle-comparable row-for-row.
    """
    if op not in _OPS:
        raise ValueError(f"unsupported op {op!r}; one of {sorted(_OPS)}")
    cols = _match_cols(left, right, on, ignoring, value_col)
    l_val = F.col(f"_l_{value_col}")
    r_val = F.col(f"_r_{value_col}")
    l = left.withColumnRenamed(value_col, f"_l_{value_col}")
    r = right.withColumnRenamed(value_col, f"_r_{value_col}")
    if not group_left:
        # one-to-one: any extra (non-match, non-value) labels on either
        # side would make the pairing ambiguous — keep only match labels
        l = l.select(*cols, f"_l_{value_col}")
    r = r.select(*cols, f"_r_{value_col}")
    out = l.join(r, cols, "inner")
    expr: Column = _OPS[op](l_val, r_val)
    return out.withColumn(out_col, expr).drop(f"_l_{value_col}", f"_r_{value_col}")


def vector_and(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | None = None,
    ignoring: list[str] | None = None,
) -> DataFrame:
    """PromQL ``and``: left rows whose match labels exist in right —
    LEFT SEMI, left's values/labels survive untouched."""
    cols = _match_cols(left, right, on, ignoring)
    return left.join(right.select(*cols).distinct(), cols, "left_semi")


def vector_unless(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | None = None,
    ignoring: list[str] | None = None,
) -> DataFrame:
    """PromQL ``unless``: left rows whose match labels do NOT exist in
    right — LEFT ANTI."""
    cols = _match_cols(left, right, on, ignoring)
    return left.join(right.select(*cols).distinct(), cols, "left_anti")


def vector_or(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | None = None,
    ignoring: list[str] | None = None,
) -> DataFrame:
    """PromQL ``or``: all left rows, plus right rows whose match labels
    have no left counterpart.  Both sides must share a schema (same
    labels + value column) — the PromQL condition that the union is
    well-formed."""
    if sorted(left.columns) != sorted(right.columns):
        raise ValueError("or requires both sides to share a schema")
    cols = _match_cols(left, right, on, ignoring)
    right_only = right.join(left.select(*cols).distinct(), cols, "left_anti")
    return left.unionByName(right_only)
