"""Table-level data-quality expectations — the dbt-test / Great
Expectations audit surface over raw and tier tables.

operators/validate.py routes individual bad ROWS to the dead letter
(the reference's per-message Reject, messages.go:60-151); this module
answers the TABLE-level question its health plane implies
(internal/metrics — is the store healthy?): does the whole table
satisfy the declared invariants, and exactly how many rows violate
each one.  The output is an audit DataFrame — one row per expectation
with an exact BIGINT violation count — the shape a CI gate or a
freshness dashboard consumes.

Expectation kinds:

  * ``not_null(col)`` / ``accepted_values(col, vals)`` /
    ``in_range(col, lo, hi)`` / ``expect(name, predicate)`` — pure
    per-row predicates; ALL of them fold into ONE aggregation over a
    single scan (each is a ``count_if`` of the violation predicate).
  * ``unique(cols…)`` — ``count(*) − count(distinct struct(cols))``;
    joins the same single aggregate (Spark expands multiple distinct
    aggregates over one scan).
  * ``monotonic(col, keys, order_by)`` — needs a lag window per
    distinct (keys, order) spec; computed in its own pass and unioned
    into the report (the one expectation class that cannot fold into
    the scan — declared in the plan note below).

Exactness: every count is BIGINT (order-independent), ``pass`` is an
integer comparison — the whole report hash-replays on any engine.

Scale: N fold-able expectations cost ONE map-side-combined aggregate
over the table regardless of N; each ``monotonic`` adds one
keys-partitioned window exchange.  The report itself is N rows.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "not_null",
    "unique",
    "accepted_values",
    "in_range",
    "expect",
    "monotonic",
    "expectations_report",
]


@dataclass(frozen=True)
class _Agg:
    name: str
    kind: str
    violations: Column  # aggregate expression producing a BIGINT


@dataclass(frozen=True)
class _Monotonic:
    name: str
    kind: str
    col: str
    keys: tuple[str, ...]
    order_by: tuple[str, ...]
    strict: bool


def not_null(col: str) -> _Agg:
    return _Agg(
        f"not_null({col})",
        "not_null",
        F.count_if(F.col(col).isNull()),
    )


def unique(*cols: str) -> _Agg:
    key = F.struct(*[F.col(c) for c in cols])
    return _Agg(
        f"unique({', '.join(cols)})",
        "unique",
        F.count(F.lit(1)) - F.count_distinct(key),
    )


def accepted_values(col: str, values: Sequence) -> _Agg:
    vals = ", ".join(repr(v) for v in values)
    return _Agg(
        f"accepted_values({col} in [{vals}])",
        "accepted_values",
        F.count_if(~F.col(col).isin(list(values)) | F.col(col).isNull()),
    )


def in_range(col: str, lo, hi) -> _Agg:
    c = F.col(col)
    return _Agg(
        f"in_range({col} in [{lo!r}, {hi!r}])",
        "in_range",
        F.count_if(c.isNull() | (c < F.lit(lo)) | (c > F.lit(hi))),
    )


def expect(name: str, violation: Column) -> _Agg:
    """Escape hatch: count rows where ``violation`` holds."""
    return _Agg(name, "custom", F.count_if(violation))


def monotonic(
    col: str,
    keys: Sequence[str] = (),
    order_by: Sequence[str] = (),
    strict: bool = False,
) -> _Monotonic:
    k = ", ".join(keys) or "<global>"
    return _Monotonic(
        f"monotonic({col} per {k})",
        "monotonic",
        col,
        tuple(keys),
        tuple(order_by) or (col,),
        strict,
    )


def expectations_report(df: DataFrame, exps: list) -> DataFrame:
    """Evaluate every expectation; return ``(expectation, kind,
    n_violations, n_rows, pass)`` — deterministic report order is the
    caller's declaration order (an ``ord`` sort key survives the
    union)."""
    if not exps:
        raise ValueError("exps must declare at least one expectation")
    bad = [e for e in exps if not isinstance(e, (_Agg, _Monotonic))]
    if bad:
        raise TypeError(f"not expectations: {bad!r}")
    names = [e.name for e in exps]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate expectation names: {sorted(names)}")
    aggs = [(i, e) for i, e in enumerate(exps) if isinstance(e, _Agg)]
    monos = [(i, e) for i, e in enumerate(exps) if isinstance(e, _Monotonic)]

    parts: list[DataFrame] = []
    if aggs:
        one = df.agg(
            F.count(F.lit(1)).alias("_n"),
            *[e.violations.cast("long").alias(f"_v{i}") for i, e in aggs],
        )
        cells: list[Column] = []
        for i, e in aggs:
            cells += [F.lit(e.name), F.lit(e.kind), F.lit(i), F.col(f"_v{i}")]
        parts.append(
            one.select(
                F.stack(F.lit(len(aggs)), *cells).alias(
                    "expectation", "kind", "ord", "n_violations"
                ),
                F.col("_n").alias("n_rows"),
            ).select("expectation", "kind", "ord", "n_violations", "n_rows")
        )
    for i, m in monos:
        from pyspark.sql import Window as W

        part = (
            W.partitionBy(*[F.col(k) for k in m.keys])
            if m.keys
            else W.partitionBy(F.lit(1))
        )
        w = part.orderBy(*[F.col(c) for c in m.order_by])
        prev = F.lag(m.col).over(w)
        viol = (
            (F.col(m.col) <= prev) if m.strict else (F.col(m.col) < prev)
        ) & prev.isNotNull()
        parts.append(
            df.withColumn("_bad", viol).agg(
                F.lit(m.name).alias("expectation"),
                F.lit(m.kind).alias("kind"),
                F.lit(i).alias("ord"),
                F.count_if(F.col("_bad")).alias("n_violations"),
                F.count(F.lit(1)).alias("n_rows"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "expectation",
        "kind",
        "n_violations",
        "n_rows",
        (F.col("n_violations") == 0).alias("pass"),
        F.col("ord"),
    ).orderBy("ord").drop("ord")
