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

import pandas as pd
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
    """Cheap JVM-side strictness pre-filter as a reject *reason* (NULL =
    passes this filter).  Catches unparseable JSON and the boolean-field
    mismatch the reference's own test exercises (sql_test.go:45-50);
    Spark's ``from_json`` silently *coerces* other scalar mismatches
    (number→string etc.), which this expression cannot see — use
    :func:`strict_parse_reason_exact` for the reference's full
    json.Unmarshal strictness.

    Caveat on the *reason string*: a type mismatch on some other field
    (e.g. CONTENT given as a string) makes the permissive parse null the
    whole row, so parsed.ACK is NULL while the raw ACK re-parse
    succeeds — such rows are correctly rejected but labeled
    ``ack_not_boolean``.  The cheap pre-filter's reason is approximate;
    only :func:`strict_parse_reason_exact` reports field-accurate
    reasons."""
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


def strict_parse_reason_exact() -> Column:
    """The reference's FULL json.Unmarshal strictness (every field) as an
    Arrow-batched checker: ``strict_parse_reason_exact()(raw_col)`` →
    reason string or NULL.

    Go rejects any JSON value whose type differs from the struct field —
    a number where a string is declared, a string where the CONTENT
    object is declared, etc. — cases Spark's permissive reader silently
    coerces.  Token-level typing needs a real JSON parse, so this is a
    vectorized pandas UDF (validation/control-plane path, not the
    transcript hot path; per-message ``json.loads``, no per-field
    Python beyond isinstance checks)."""
    import json

    _str_fields = ("TYPE", "DATE", "APPID", "ADITIONAL", "RESPONSE")
    _content_fields = ("SERVER", "DB", "USER", "PASS", "SENTENCE")

    def _check(m: str):
        try:
            d = json.loads(m)
        except Exception:
            return "corrupt_json"
        if not isinstance(d, dict):
            return "not_an_object"
        for f in _str_fields:
            if f in d and d[f] is not None and not isinstance(d[f], str):
                return f"{f.lower()}_not_string"
        if "ACK" in d and d["ACK"] is not None and not isinstance(d["ACK"], bool):
            return "ack_not_boolean"
        content = d.get("CONTENT")
        if content is not None:
            if not isinstance(content, dict):
                return "content_not_object"
            for f in _content_fields:
                v = content.get(f)
                if v is not None and not isinstance(v, str):
                    return f"content_{f.lower()}_not_string"
        return None

    @F.pandas_udf(T.StringType())
    def _udf(raw: pd.Series) -> pd.Series:
        return raw.map(lambda m: None if m is None else _check(m))

    return _udf


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
        import json as _json
        import re as _re

        if isinstance(v, bool):
            return "true" if v else "false"
        if v is None:
            return "null"
        s = str(v)
        needs_quote = (
            s.lower() in ("null", "~", "true", "false", "yes", "no", "")
            or _re.fullmatch(r"[-+]?\d+(\.\d+)?([eE][-+]?\d+)?", s) is not None
            or ": " in s
            or s.endswith(":")  # a plain scalar ending in ':' parses as a map key
            or " #" in s
            or "\n" in s
            or s != s.strip()
            or s[0] in "-?*&!|>%@`\"'{}[],#"
        )
        if needs_quote:
            # YAML double-quoted style; json escaping is a compatible subset
            return _json.dumps(s, ensure_ascii=False)
        return s

    content = row.get("CONTENT") or {}
    lines = [f"TYPE: {scalar(row.get('TYPE'))}", "CONTENT:"]
    for f in ("SERVER", "DB", "USER", "PASS", "SENTENCE"):
        lines.append(f"    {f}: {scalar(content.get(f))}")
    for f in ("DATE", "APPID", "ADITIONAL", "ACK", "RESPONSE"):
        lines.append(f"{f}: {scalar(row.get(f))}")
    return "\n".join(lines) + "\n"
