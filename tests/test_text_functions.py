"""Text/vector function library tests."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from iot_simulator_datalake_spark.functions import (
    cosine_similarity, fingerprint, language_id, ngrams, quality_score,
    regex_token_count, tokens)


def one(spark, text):
    return spark.createDataFrame([(text,)], ["text"])


def test_tokens_lowercase_and_drop_empty(spark):
    out = one(spark, "  Hello   WORLD  ").select(
        tokens("text").alias("t")).collect()[0]["t"]
    assert out == ["hello", "world"]


def test_ngrams_window_and_short_docs(spark):
    df = one(spark, "a b c d")
    out = df.select(ngrams(tokens("text"), 3).alias("g")).collect()[0]["g"]
    assert out == ["a b c", "b c d"]
    short = one(spark, "a b").select(
        ngrams(tokens("text"), 3).alias("g")).collect()[0]["g"]
    assert short == ["a b"]                    # whole doc as one shingle


def test_language_id_lexicon_match(spark):
    df = spark.createDataFrame(
        [("the cat is in the house and it is small",),
         ("der hund ist nicht ein problem mit der katze",),
         ("zzz qqq xxx",)], ["text"])
    out = [r["lang"] for r in df.select(
        language_id("text").alias("lang")).collect()]
    assert out == ["en", "de", "und"]


def test_quality_score_bounds(spark):
    df = spark.createDataFrame(
        [("the quick brown fox is one of the best known sentences",),
         ("x",)], ["text"])
    scores = [r["q"] for r in
              df.select(quality_score("text").alias("q")).collect()]
    assert all(0.0 <= s <= 1.0 for s in scores)
    assert scores[0] > scores[1]


def test_regex_token_count(spark):
    out = one(spark, "don't count 123 twice!").select(
        regex_token_count("text").alias("n")).collect()[0]["n"]
    # don / ' / t / count / 123 / twice / !
    assert out == 7


def test_fingerprint_order_insensitive(spark):
    a = one(spark, "alpha beta gamma").select(
        fingerprint("text").alias("f")).collect()[0]["f"]
    b = one(spark, "gamma  ALPHA beta").select(
        fingerprint("text").alias("f")).collect()[0]["f"]
    c = one(spark, "alpha beta delta").select(
        fingerprint("text").alias("f")).collect()[0]["f"]
    assert a == b != c


def test_cosine_similarity_known_values(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [0.0, 1.0]), ([1.0, 2.0], [2.0, 4.0])], ["a", "b"])
    out = [r["c"] for r in df.select(
        cosine_similarity(F.col("a"), F.col("b")).alias("c")).collect()]
    assert out[0] == 0.0
    assert math.isclose(out[1], 1.0, abs_tol=1e-6)
