"""SQL-message payload type — direct parity with the reference's message
layer, verified against the reference's OWN golden test data.

The reference's only typed payload is the ``SQL`` message
(/root/reference/internal/messages/sql.go:12-26): a JSON envelope carrying
connection fields and a SQL sentence, with strict-typed parsing (a string
where a bool is expected is a hard error, sql_test.go:45-50), a
connection-validity predicate (sql.go:40-45), and byte-exact JSON/YAML
serializations (golden outputs sql_test.go:110,147-159).  This module
re-expresses that layer Spark-native and its tests assert THE SAME golden
bytes and truth tables, so a reference user's payloads behave identically.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: exact field names/order of the reference struct (incl. the historical
#: "ADITIONAL" single-d spelling, kept deliberately — sql.go:23 comment)
SQL_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("TYPE", T.StringType()),
        T.StructField(
            "CONTENT",
            T.StructType(
                [
                    T.StructField("SERVER", T.StringType()),
                    T.StructField("DB", T.StringType()),
                    T.StructField("USER", T.StringType()),
                    T.StructField("PASS", T.StringType()),
                    T.StructField("SENTENCE", T.StringType()),
                ]
            ),
        ),
        T.StructField("DATE", T.StringType()),  # a STRING in the reference
        T.StructField("APPID", T.StringType()),
        T.StructField("ADITIONAL", T.StringType()),
        T.StructField("ACK", T.BooleanType()),
        T.StructField("RESPONSE", T.StringType()),
    ]
)

_FIELDS = [f.name for f in SQL_PAYLOAD_SCHEMA.fields]


def parse_sql_payload(col: Column | str) -> Column:
    """``NewSQL`` analogue (sql.go:29-36): declared-schema JSON parse."""
    c = F.col(col) if isinstance(col, str) else col
    return F.from_json(c, SQL_PAYLOAD_SCHEMA)


def strict_parse_reason(raw: Column | str, parsed: Column) -> Column:
    """The reference's strict-typing semantics as a reject *reason*
    (NULL = parse OK).  Go's json.Unmarshal hard-fails when ``ACK`` holds
    a string (sql_test.go:45-50); Spark's ``from_json`` is permissive
    (nulls the field), so strictness is re-established by a routing
    predicate (SURVEY.md §7): ``ACK`` parses as a *string* but not as a
    *boolean* ⇒ type mismatch; unparseable JSON ⇒ corrupt."""
    c = F.col(raw) if isinstance(raw, str) else raw
    ack_as_str = F.from_json(c, "ACK string")["ACK"]
    return (
        F.when(parsed.isNull(), F.lit("corrupt_json"))
        # a genuine JSON boolean never leaves parsed.ACK NULL, so
        # NULL-boolean + non-NULL-string ⇒ the value was a string (the
        # reference rejects even "false", sql_test.go:46)
        .when(
            parsed["ACK"].isNull() & ack_as_str.isNotNull(),
            F.lit("ack_not_boolean"),
        )
    )


def valid_data_conn(parsed: Column) -> Column:
    """``ValidDataConn`` (sql.go:40-45): SERVER, DB, USER, PASS all
    non-empty (NULL counts as empty, as Go's zero value does)."""
    c = parsed["CONTENT"]
    checks = [
        c[f].isNotNull() & (c[f] != "") for f in ("SERVER", "DB", "USER", "PASS")
    ]
    out = checks[0]
    for ch in checks[1:]:
        out = out & ch
    return out


def sql_payload_to_json(parsed: Column) -> Column:
    """``ToJSON`` (sql.go:48-54): canonical field order, no spaces, nulls
    kept — byte-identical to Go's json.Marshal of the struct."""
    return F.to_json(
        F.struct(*[parsed[f].alias(f) for f in _FIELDS]),
        {"ignoreNullFields": "false"},
    )


def sql_payload_to_yaml(row: dict) -> str:
    """``ToYAML`` (sql.go:57-63) — driver-side, matching Go yaml.v3's
    style for these payloads (4-space nested indent, double-quoted
    strings that would otherwise read as YAML scalars like ``"null"``) —
    byte-identical to the reference's golden block (sql_test.go:147-159).
    """

    def scalar(v) -> str:
        if isinstance(v, bool):
            return "true" if v else "false"
        if v is None:
            return "null"
        s = str(v)
        if s.lower() in ("null", "~", "true", "false", "yes", "no", "") or s.isdigit():
            return f'"{s}"'
        return s

    content = row.get("CONTENT") or {}
    lines = [f"TYPE: {scalar(row.get('TYPE'))}", "CONTENT:"]
    for f in ("SERVER", "DB", "USER", "PASS", "SENTENCE"):
        lines.append(f"    {f}: {scalar(content.get(f))}")
    for f in ("DATE", "APPID", "ADITIONAL", "ACK", "RESPONSE"):
        lines.append(f"{f}: {scalar(row.get(f))}")
    return "\n".join(lines) + "\n"
