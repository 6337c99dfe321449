"""PromQL vector matching vs pandas oracles (SURVEY.md §5)."""

import pandas as pd
import pytest

from pyspark.sql import functions as F

from mq_to_db_spark.operators.rollup import bucket_col
from mq_to_db_spark.operators.vectormatch import (
    vector_and,
    vector_binop,
    vector_or,
    vector_unless,
)
from tests.conftest import assert_pdf_equal


@pytest.fixture(scope="module")
def per_role(spark, transcripts):
    return (
        transcripts.groupBy(
            bucket_col("1h").alias("bucket_start"), "role"
        )
        .agg(F.count(F.lit(1)).cast("double").alias("value"))
        .cache()
    )


@pytest.fixture(scope="module")
def totals(spark, transcripts):
    return (
        transcripts.groupBy(bucket_col("1h").alias("bucket_start"))
        .agg(F.count(F.lit(1)).cast("double").alias("value"))
        .cache()
    )


def _pdf(per_role):
    return per_role.toPandas()


def test_group_left_ratio_matches_pandas(per_role, totals):
    got = vector_binop(
        per_role, totals, "/", on=["bucket_start"], group_left=True,
        out_col="share",
    ).toPandas()
    pr, tot = per_role.toPandas(), totals.toPandas()
    want = pr.merge(tot, on="bucket_start", suffixes=("", "_tot"))
    want["share"] = want["value"] / want["value_tot"]
    want = want[["bucket_start", "role", "share"]]
    got = got[["bucket_start", "role", "share"]]
    assert_pdf_equal(got, want, ["bucket_start", "role"])
    # shares per bucket sum to 1
    s = got.groupby("bucket_start")["share"].sum()
    assert ((s - 1.0).abs() < 1e-9).all()


def test_one_to_one_difference(per_role):
    user = per_role.filter(F.col("role") == "user").drop("role")
    asst = per_role.filter(F.col("role") == "assistant").drop("role")
    got = vector_binop(user, asst, "-", on=["bucket_start"], out_col="d").toPandas()
    pr = _pdf(per_role.filter(F.col("role").isin("user", "assistant")))
    piv = pr.pivot_table(index="bucket_start", columns="role", values="value")
    want = (piv["user"] - piv["assistant"]).dropna().rename("d").reset_index()
    assert_pdf_equal(got, want, ["bucket_start"])


def test_comparison_returns_bool_not_filter(per_role, totals):
    got = vector_binop(
        per_role, totals, ">", on=["bucket_start"], group_left=True, out_col="gt"
    )
    assert dict(got.dtypes)["gt"] == "boolean"
    assert got.count() == per_role.count()


def test_and_unless_partition(per_role):
    user = per_role.filter(F.col("role") == "user").drop("role")
    tool = per_role.filter(F.col("role") == "tool").drop("role")
    both = vector_and(user, tool, on=["bucket_start"])
    only = vector_unless(user, tool, on=["bucket_start"])
    # and + unless partition the left side
    assert both.count() + only.count() == user.count()
    u, t = set(
        r[0] for r in user.select("bucket_start").collect()
    ), set(r[0] for r in tool.select("bucket_start").collect())
    assert set(r[0] for r in both.select("bucket_start").collect()) == u & t
    assert set(r[0] for r in only.select("bucket_start").collect()) == u - t
    # values pass through untouched
    assert_pdf_equal(
        both.unionByName(only).toPandas(), user.toPandas(), ["bucket_start"]
    )


def test_or_prefers_left(per_role):
    user = per_role.filter(F.col("role") == "user").drop("role")
    tool = per_role.filter(F.col("role") == "tool").drop("role")
    got = vector_or(user, tool, on=["bucket_start"]).toPandas()
    u, t = user.toPandas(), tool.toPandas()
    right_only = t[~t["bucket_start"].isin(u["bucket_start"])]
    want = pd.concat([u, right_only], ignore_index=True)
    assert_pdf_equal(got, want, ["bucket_start"])


def test_ignoring_equivalence(per_role, totals):
    """ignoring the non-shared labels == on the shared ones."""
    a = vector_binop(
        per_role, totals, "/", on=["bucket_start"], group_left=True
    ).toPandas()
    b = vector_binop(
        per_role, totals, "/", ignoring=[], group_left=True
    ).toPandas()
    assert_pdf_equal(a, b, ["bucket_start", "role"])


def test_validation_errors(per_role, totals):
    with pytest.raises(ValueError, match="not both"):
        vector_binop(per_role, totals, "/", on=["bucket_start"], ignoring=["x"])
    with pytest.raises(ValueError, match="unsupported op"):
        vector_binop(per_role, totals, "**")
    with pytest.raises(ValueError, match="absent"):
        vector_binop(per_role, totals, "/", on=["bucket_start", "role"])
    with pytest.raises(ValueError, match="share a schema"):
        vector_or(per_role, totals, on=["bucket_start"])
