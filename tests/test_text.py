"""Tests for text-analysis operators (tokens / quality / langid /
fingerprint)."""

from __future__ import annotations

import pyspark.sql.functions as F

from healthcare_data_warehouse_spark.operators.text import (
    bpe_ish_token_count,
    fingerprint,
    lang_id,
    quality_features,
    token_count,
)


def test_token_count(spark):
    df = spark.createDataFrame([("one two  three",), ("single",)], ["text"])
    got = [r["n"] for r in df.select(token_count("text").alias("n")).collect()]
    assert got == [3, 1]


def test_bpe_ish_token_count_splits_subwords(spark):
    df = spark.createDataFrame([("hello, world42 x",)], ["text"])
    n = df.select(bpe_ish_token_count("text").alias("n")).collect()[0]["n"]
    # hello , world 42 x  (punctuation and digit boundaries split)
    assert n == 5


def test_lang_id_picks_profile(spark):
    rows = [("the cat and the dog of a house",),   # en stopwords
            ("el la de que y el la",),              # es stopwords
            ("zzz qqq www",)]                       # no hits → und
    df = spark.createDataFrame(rows, ["text"])
    got = [r["p"] for r in df.select(lang_id("text").alias("p")).collect()]
    assert got == ["en", "es", "und"]


def test_fingerprint_whitespace_and_case_insensitive(spark):
    df = spark.createDataFrame(
        [("Hello   World",), ("hello world",), ("different",)], ["text"]
    )
    got = [r["f"] for r in df.select(fingerprint("text").alias("f")).collect()]
    assert got[0] == got[1] != got[2]


def test_quality_features_values(spark):
    df = spark.createDataFrame([(7, "the aaaa bb")], ["doc_id", "text"])
    r = quality_features(df).collect()[0]
    assert r["char_len"] == 11
    assert r["word_count"] == 3
    assert abs(r["avg_word_len"] - 3.0) < 1e-12   # 9 non-space chars / 3
    assert abs(r["stopword_ratio"] - 1 / 3) < 1e-12
