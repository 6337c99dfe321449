"""JSON-lines transcript ingestion with strict-parse dead-lettering.

The reference's ingest boundary is a strict JSON parse: a payload that
does not unmarshal into the typed struct is REJECTED to the dead-letter
exchange, never silently coerced (internal/messages/sql.go:13-25 — a
type-mismatched field is a hard parse error, proven by
internal/messages/sql_test.go:45-50; reject routing in
internal/repository/messages.go:70-84).  This module is that boundary
for file-shaped transcript feeds: a JSONL dump becomes (valid turns,
dead-letter rows with a reason), composing the engine's existing
validation taxonomy (operators/validate.py, A10) with one new
file-boundary reason:

  * ``malformed_json`` — the line is not a JSON object, OR a field's
    JSON value has the wrong type: PERMISSIVE `from_json` populates the
    corrupt-record column for BOTH, so type mismatches route here (the
    reference's hard-parse-error outcome, one coarse reason);
  * only fields that are genuinely *missing* or JSON ``null`` (plus
    unparseable ISO timestamps) surface as NULL fields, which the
    downstream taxonomy names precisely (``null_ts``,
    ``negative_or_null_turn_idx``, ``null_or_empty_conv_id``,
    ``unknown_role``) — same rejection outcome, finer diagnosis.

Scale shape: `spark.read.text` (splittable line reader) → one
`from_json` projection (JVM Jackson, no Python) → the taxonomy filter.
Pure narrow pipeline; dead-letter rows carry the ORIGINAL line so the
reject table is replayable after a fix, like the reference's requeue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mq_to_db_spark.operators.validate import split_valid_rejected

__all__ = ["JSONL_TRANSCRIPT_SCHEMA", "parse_transcript_lines", "read_transcripts_jsonl"]

#: the strict wire schema: ts arrives as an ISO-8601 string (JSON has no
#: timestamp type); everything else matches the engine's input_hint
JSONL_TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.StringType()),
    ]
)

#: reject reason for lines the strict parse refuses outright: not a
#: JSON object, or a type-mismatched field (PERMISSIVE from_json sets
#: the corrupt-record column for both)
MALFORMED_JSON = "malformed_json"


def parse_transcript_lines(
    lines: DataFrame, line_col: str = "value", check_duplicates: bool = True
) -> tuple[DataFrame, DataFrame]:
    """``lines`` (one string column) → (valid turns, dead-letter rows).

    The dead-letter frame carries the transcript columns (NULL where
    unparseable), ``reason``, and ``raw`` — the original line, so the
    reject table replays after an upstream fix (the requeue analogue).

    ``check_duplicates=False`` skips the natural-key dedup window — the
    STREAMING mode (windows are illegal on unbounded streams; the
    streaming plane owns redelivery dedup via its stateful machinery).
    """
    # PERMISSIVE from_json returns an all-NULL struct (not a NULL
    # struct) for a non-JSON line — the corrupt-record column is the
    # reliable malformed detector: it carries the original text iff
    # the line failed to parse as a JSON object
    schema_with_corrupt = T.StructType(
        [*JSONL_TRANSCRIPT_SCHEMA.fields, T.StructField("_corrupt", T.StringType())]
    )
    parsed = lines.select(
        F.from_json(
            F.col(line_col),
            schema_with_corrupt,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        ).alias("_j"),
        F.col(line_col).alias("raw"),
    )
    rows = parsed.select(
        F.col("_j.conv_id").alias("conv_id"),
        F.col("_j.turn_idx").alias("turn_idx"),
        F.col("_j.role").alias("role"),
        F.col("_j.text").alias("text"),
        F.col("_j.tool").alias("tool"),
        # strict ISO timestamp: unparseable strings -> NULL -> null_ts
        F.try_to_timestamp(F.col("_j.ts")).alias("ts"),
        F.col("_j._corrupt").isNotNull().alias("_malformed"),
        "raw",
    )
    ok = rows.filter(~F.col("_malformed")).drop("_malformed")
    malformed = (
        rows.filter(F.col("_malformed"))
        .drop("_malformed")
        .withColumn("reason", F.lit(MALFORMED_JSON))
    )
    # the validation taxonomy tolerates (and passes through) extra
    # columns, so `raw` rides along and rejects keep their original
    # line with no join; valid drops it
    valid, rejected = split_valid_rejected(ok, check_duplicates=check_duplicates)
    valid = valid.drop("raw")
    dead = rejected.select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts", "reason", "raw"
    ).unionByName(
        malformed.select(
            "conv_id", "turn_idx", "role", "text", "tool", "ts", "reason", "raw"
        )
    )
    return valid, dead


def read_transcripts_jsonl(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL transcript feed from ``path`` → (valid, dead_letter)."""
    return parse_transcript_lines(spark.read.text(path))
