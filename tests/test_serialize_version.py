"""Golden serialization + version/health tests (SURVEY.md §5 point 1 —
mirrors the reference's byte-exact golden outputs,
/root/reference/internal/messages/sql_test.go:110,147-159)."""

from __future__ import annotations

import datetime as dt
import json

from pyspark.sql import functions as F

from mq_to_db_spark.functions.serialize import (
    parse_turn_json,
    result_json,
    with_turn_json,
)
from mq_to_db_spark.version import (
    build_info_df,
    get_version_info,
    get_version_info_extended,
    health_check,
)


def _one_turn_df(spark):
    return spark.createDataFrame(
        [
            (
                "conv-00000001",
                3,
                "assistant",
                "naïve café 🚀",
                None,
                dt.datetime(2025, 1, 2, 3, 4, 5, 123456),
            )
        ],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )


def test_turn_json_golden(spark):
    """Byte-exact golden output — field order fixed, nulls kept, ts at
    microsecond precision."""
    got = with_turn_json(_one_turn_df(spark)).select("json").collect()[0][0]
    want = (
        '{"conv_id":"conv-00000001","turn_idx":3,"role":"assistant",'
        '"text":"naïve café 🚀","tool":null,'
        '"ts":"2025-01-02T03:04:05.123456"}'
    )
    assert got == want


def test_turn_json_roundtrip(spark, transcripts):
    """decode(encode(turn)) == turn for every field on real fixture rows
    (the serialization analogue of the codec text-equality invariant)."""
    j = with_turn_json(transcripts)
    back = j.select(parse_turn_json(F.col("json")).alias("t")).select("t.*")
    assert back.exceptAll(transcripts).count() == 0
    assert transcripts.exceptAll(back).count() == 0


def test_result_json_golden(spark):
    df = spark.createDataFrame(
        [("worker-1", 42, "ok", None)],
        "by string, rows long, reason string, error string",
    )
    got = df.select(
        result_json("by", "rows", "reason", "error").alias("j")
    ).collect()[0][0]
    assert got == '{"by":"worker-1","rows_affected":42,"reason":"ok","error":null}'


def test_version_strings_and_build_info(spark):
    assert get_version_info().startswith("mq_to_db_spark v")
    ext = get_version_info_extended()
    assert "pyspark" in ext and "python" in ext
    row = build_info_df(spark).collect()[0]
    assert row.name == "mq_to_db_spark"
    assert json.loads(json.dumps(row.asDict()))  # serializable


def test_health_check(spark):
    assert health_check(spark) is True


def test_turn_yaml_golden(spark):
    """B4 analogue: byte-exact YAML golden output (mirrors the
    reference's ToYAML golden block, sql_test.go:147-159)."""
    from mq_to_db_spark.functions.serialize import turn_yaml_rows

    rows = [r.asDict() for r in _one_turn_df(spark).collect()]
    got = turn_yaml_rows(rows)
    want = (
        "- conv_id: conv-00000001\n"
        "  turn_idx: 3\n"
        "  role: assistant\n"
        "  text: naïve café 🚀\n"
        "  tool: null\n"
        "  ts: 2025-01-02 03:04:05.123456\n"
    )
    assert got == want


def test_openmetrics_exposition_escaping_and_format(spark):
    import datetime as dt

    from mq_to_db_spark.functions.serialize import with_openmetrics

    df = spark.createDataFrame(
        [('api "v1"\\prod', dt.datetime(2024, 1, 1, 5), 42)],
        "event_type string, bucket_start timestamp, n_events long",
    )
    [r] = with_openmetrics(df, "events_total", ["event_type"], "n_events").collect()
    # label escaped per the exposition spec; ts in whole epoch seconds
    assert r.exposition == (
        'events_total{event_type="api \\"v1\\"\\\\prod"} 42 1704085200'
    )


# ------------------------------------------------------- openmetrics parse


def test_openmetrics_roundtrip_nasty_labels(spark):
    """parse(expose(row)) == row for label values exercising every
    escape class: quotes, backslashes, commas, braces, spaces, the
    literal sequence '} ' inside a value, and backslash-before-quote."""
    import pandas as pd

    from mq_to_db_spark.functions.serialize import (
        parse_openmetrics,
        with_openmetrics,
    )

    vals = [
        'plain',
        'with "quotes"',
        "back\\slash",
        "trailing\\",
        '\\"both\\"',
        "comma,and{brace}",
        'evil"} 5"} tail',
        "sp ace",
        "",
    ]
    pdf = pd.DataFrame(
        {
            "event_type": vals,
            "bucket_start": [
                pd.Timestamp("2024-01-01") + pd.Timedelta(hours=i)
                for i in range(len(vals))
            ],
            "n_events": [i * 7 + 1 for i in range(len(vals))],
        }
    )
    df = spark.createDataFrame(pdf).withColumn(
        "n_events", F.col("n_events").cast("long")
    )
    exposed = with_openmetrics(df, "events_total", ["event_type"], "n_events")
    parsed = parse_openmetrics(exposed)
    rows = parsed.collect()
    assert len(rows) == len(vals)
    for r in rows:
        assert r.om_metric == "events_total"
        assert r.om_labels["event_type"] == r.event_type, r.exposition
        assert r.om_value == r.n_events
        assert r.om_ts == r.bucket_start  # whole-second timestamps


def test_openmetrics_parse_malformed_is_null_not_error(spark):
    from mq_to_db_spark.functions.serialize import parse_openmetrics

    df = spark.createDataFrame(
        [("not a metric line",), ("{} 1",), ("m{k=unquoted} 1 2",)],
        "exposition string",
    )
    rows = parse_openmetrics(df).collect()
    assert all(r.om_metric is None or r.om_labels == {} for r in rows)


def test_openmetrics_parse_plan_is_jvm_only(spark):
    """No Python UDF crossing: the parse is regexp/replace/transform
    expressions only."""
    from mq_to_db_spark.functions.serialize import parse_openmetrics

    df = spark.createDataFrame(
        [('m{k="v"} 1 1700000000',)], "exposition string"
    )
    plan = parse_openmetrics(df)._jdf.queryExecution().executedPlan().toString()
    assert "PythonUDF" not in plan and "ArrowEval" not in plan, plan
