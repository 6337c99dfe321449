"""Text-analysis functions over the driver's documents table + synthetic
edge cases."""

import pytest
from pyspark.sql import functions as F

from mq_to_db_spark.functions.text import (
    fingerprint_md5,
    fingerprint_rolling,
    lang_id,
    quality_features,
    quality_score,
    token_count_bpe,
    token_count_ws,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


def test_token_count_ws_cases(spark):
    df = spark.createDataFrame(
        [("a b  c",), ("",), ("   ",), (None,), ("one",)], "text string"
    )
    got = [r[0] for r in df.select(token_count_ws("text")).collect()]
    assert got == [3, 0, 0, 0, 1]


def test_token_count_bpe_reasonable(spark):
    df = spark.createDataFrame([("Hello, world! It's 2024.",)], "text string")
    n = df.select(token_count_bpe("text")).collect()[0][0]
    # Hello , world ! It 's 202 4 . → 9 pieces (digits split in ≤3 runs,
    # cl100k-style)
    assert n == 9


def test_lang_id(spark):
    rows = [
        ("the cat sat on the mat and it was good", "en"),
        ("der Hund ist nicht mit der Katze", "de"),
        ("le chat est dans la maison pour le moment", "fr"),
        ("el perro es un animal que vive en la casa", "es"),
        ("日本語のテキストです。これはテストです。", "cjk"),
        ("zzz qqq xxx", "unknown"),
        ("", "unknown"),
        (None, "unknown"),
    ]
    df = spark.createDataFrame([(t,) for t, _ in rows], "text string")
    got = [r[0] for r in df.select(lang_id("text")).collect()]
    assert got == [want for _, want in rows]


def test_quality_score_ordering(spark):
    good = "The quick brown fox jumps over the lazy dog and it was a good day for all of them."
    bad = "$$$ ### !!! 123 456 789 @@@ %%%"
    df = spark.createDataFrame([(good,), (bad,)], "text string")
    g, b = [r[0] for r in df.select(quality_score("text")).collect()]
    assert g > b
    assert 0.0 <= b <= g <= 1.0


def test_quality_features_ranges(docs):
    feats = quality_features("text")
    row = docs.select(*[v.alias(k) for k, v in feats.items()]).agg(
        F.max("q_punct_ratio"), F.min("q_len"), F.max("q_stopword_ratio")
    ).collect()[0]
    assert 0 <= row[0] <= 1
    assert row[1] >= 0


def test_fingerprint_md5_normalization(spark):
    df = spark.createDataFrame(
        [("Hello,   World!",), ("hello world",), ("different text",)], "text string"
    )
    fps = [r[0] for r in df.select(fingerprint_md5("text")).collect()]
    assert fps[0] == fps[1] != fps[2]


def test_fingerprint_rolling_similarity(spark):
    # winnowing-style min-hash: identical text → identical fingerprint
    df = spark.createDataFrame(
        [("the quick brown fox jumps over the lazy dog",),
         ("The quick brown fox jumps over the lazy dog!",),
         ("completely unrelated content here",)],
        "text string",
    )
    fps = [r[0] for r in df.select(fingerprint_rolling("text").alias("f")).collect()]
    assert fps[0] == fps[1]  # normalization-invariant
    assert fps[0] != fps[2]


def test_against_documents_nchars(docs):
    # documents.n_chars is the generator's own length — our length matches
    bad = docs.filter(F.length("text") != F.col("n_chars")).count()
    assert bad == 0
