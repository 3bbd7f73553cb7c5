"""Text-analysis column functions."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_etl_self_service_spark.functions.text import (
    bpe_ish_token_count,
    fingerprint,
    langid,
    token_count,
    word_shingles,
)


def _one(spark, text, col):
    return (
        spark.createDataFrame([(text,)], "text string")
        .select(col.alias("v"))
        .collect()[0]
        .v
    )


def test_token_count_collapses_whitespace(spark):
    assert _one(spark, "  a  b\tc\nd ", token_count(F.col("text"))) == 4


def test_word_shingles_short_doc_guard(spark):
    assert _one(spark, "a b", word_shingles(F.col("text"), k=3)) == []
    assert _one(spark, "a b c d", word_shingles(F.col("text"), k=3)) == ["a b c", "b c d"]


def test_shingles_are_distinct(spark):
    assert _one(spark, "x y x y x y", word_shingles(F.col("text"), k=2)) == ["x y", "y x"]


def test_fingerprint_normalization(spark):
    a = _one(spark, "  Hello   World ", fingerprint(F.col("text")))
    b = _one(spark, "hello world", fingerprint(F.col("text")))
    assert a == b and len(a) == 32


def test_langid_picks_stopword_language(spark):
    assert _one(spark, "the cat and the hat of a dog", langid(F.col("text"))) == "en"
    assert _one(spark, "der hund und die katze ist da", langid(F.col("text"))) == "de"
    assert _one(spark, "xyzzy qwerty plugh", langid(F.col("text"))) == "und"


def test_bpe_ish_counts_long_words_more(spark):
    assert _one(spark, "hi there", bpe_ish_token_count(F.col("text"))) == 1 + 2
    assert _one(spark, "internationalization", bpe_ish_token_count(F.col("text"))) == 5
