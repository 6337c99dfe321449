"""Validate → accept/dead-letter split (error routing, not propagation).

Mirrors the reference's per-message job semantics
(/root/reference/internal/repository/messages.go:60-151): parse failure →
``Reject(requeue=false)`` → dead-letter exchange; invalid payload →
reject; only valid rows continue to the store stage.  Its
``ValidDataConn()`` conjunctive non-empty check
(internal/messages/sql.go:40-45) becomes a boolean Column predicate; its
``Results.Reason`` strings (messages.go:76,100,126,144) become the
``reason`` column of the dead-letter table.

Spark-first: one pass computes the first failing reason per row
(deterministic precedence, like the reference's sequential checks);
``valid`` / ``rejected`` are two filters over the same cached projection —
Catalyst pushes both into a single scan when the caller materializes them
in one job.  Duplicate-key detection ((conv_id, turn_idx) is the MessageID
analogue, consumer.go:83) needs a shuffle: a window count over the natural
key; rows beyond the first (ordered by ts) are routed to the dead letter,
matching at-least-once redelivery de-duplication.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from mq_to_db_spark.config import (
    REASON_BAD_ROLE,
    REASON_BAD_TURN_IDX,
    REASON_DUP_KEY,
    REASON_NULL_KEY,
    REASON_NULL_TS,
    VALID_ROLES,
)


def with_reject_reason(df: DataFrame, check_duplicates: bool = True) -> DataFrame:
    """Add a ``reason`` column: null for valid rows, else the first
    failing check (precedence mirrors the reference's check order)."""
    reason = (
        F.when(F.col("conv_id").isNull() | (F.col("conv_id") == ""), REASON_NULL_KEY)
        .when(F.col("ts").isNull(), REASON_NULL_TS)
        .when(F.col("turn_idx").isNull() | (F.col("turn_idx") < 0), REASON_BAD_TURN_IDX)
        .when(~F.col("role").isin(*VALID_ROLES), REASON_BAD_ROLE)
    )
    out = df.withColumn("reason", reason)
    if check_duplicates:
        # Redelivery dedup on the natural key: keep the first delivery
        # (ordered by ts, then arrival order), reject the rest.  Only
        # rows passing the cheap checks participate in the shuffle.
        # tie-break on (text, role) so equal-ts redeliveries dedup
        # deterministically (identical copies → either is correct).
        w = W.partitionBy("conv_id", "turn_idx").orderBy(
            F.col("ts").asc_nulls_last(), F.col("text").asc_nulls_last(), F.col("role")
        )
        out = out.withColumn(
            "_rn", F.when(F.col("reason").isNull(), F.row_number().over(w))
        ).withColumn(
            "reason",
            F.when(F.col("reason").isNotNull(), F.col("reason")).when(
                F.col("_rn") > 1, REASON_DUP_KEY
            ),
        ).drop("_rn")
    return out


def split_valid_rejected(
    df: DataFrame, check_duplicates: bool = True
) -> tuple[DataFrame, DataFrame]:
    """Return (valid, rejected).  ``rejected`` carries the input schema
    plus ``reason`` — the dead-letter table (FIXTURES.md §2); ``valid``
    has the clean input schema."""
    tagged = with_reject_reason(df, check_duplicates=check_duplicates)
    valid = tagged.filter(F.col("reason").isNull()).drop("reason")
    rejected = tagged.filter(F.col("reason").isNotNull())
    return valid, rejected
