"""PromQL label-manipulation utilities + ``count_values``.

The reference's Grafana dashboards rewrite and regroup series labels
(legend formats, ``label_replace`` in recording rules); over a tier
table those are pure projections — zero shuffle, whole-stage codegen —
plus one hash agg for ``count_values``.  Thin by design: the value is
PromQL-surface completeness with exact Prometheus semantics (anchored
full-match, untouched-on-miss), not cleverness.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def label_replace(
    df: DataFrame,
    dst_label: str,
    replacement: str,
    src_label: str,
    regex: str,
) -> DataFrame:
    """PromQL ``label_replace(v, dst, replacement, src, regex)``: when
    ``regex`` matches the ENTIRE ``src_label`` value, ``dst_label``
    becomes ``replacement`` with ``$1..$9`` capture references
    substituted; otherwise the row keeps its existing ``dst_label``
    (or NULL if the column is new).  Pure anchored regexp expressions —
    validated eagerly driver-side so a bad pattern fails at plan time."""
    re.compile(regex)  # surface invalid patterns now, not per-task
    anchored = f"^(?:{regex})$"
    src = F.col(src_label)
    existing = F.col(dst_label) if dst_label in df.columns else F.lit(None).cast("string")
    matched = src.isNotNull() & src.rlike(anchored)
    rewritten = F.regexp_replace(src, F.lit(anchored), F.lit(replacement))
    return df.withColumn(dst_label, F.when(matched, rewritten).otherwise(existing))


def label_join(
    df: DataFrame,
    dst_label: str,
    separator: str,
    *src_labels: str,
) -> DataFrame:
    """PromQL ``label_join``: ``dst_label`` = src labels joined with
    ``separator`` (NULL sources contribute empty, like Prometheus's
    absent-label-is-empty-string rule)."""
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("")) for c in src_labels]
    return df.withColumn(dst_label, F.concat_ws(separator, *parts))


def count_values(
    df: DataFrame,
    label_out: str,
    value_col: str,
    keys: list[str] | None = None,
) -> DataFrame:
    """PromQL ``count_values("label", v)``: how many series/samples carry
    each exact value, the value itself becoming a label — the canonical
    "how many replicas run build X" query.  One hash agg; the value is
    stringified exactly like Prometheus exposes it (integral doubles
    print bare)."""
    keys = list(keys or [])
    v = F.col(value_col)
    as_label = F.when(
        v.cast("double") == v.cast("double").cast("long").cast("double"),
        v.cast("double").cast("long").cast("string"),
    ).otherwise(v.cast("double").cast("string"))
    return (
        df.withColumn(label_out, as_label)
        .groupBy(*keys, label_out)
        .agg(F.count(F.lit(1)).alias("n"))
    )
