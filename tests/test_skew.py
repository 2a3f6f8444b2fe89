"""Salted aggregation / join correctness (results must equal the
unsalted equivalents on skewed data)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from iot_simulator_datalake_spark.operators.skew import (salted_agg,
                                                         salted_join)


@pytest.fixture(scope="module")
def skewed(spark):
    rng = random.Random(1)
    # one hot key with 5k rows, 50 cold keys
    rows = [("hot", rng.uniform(0, 10)) for _ in range(5000)] + \
           [(f"k{i % 50}", rng.uniform(0, 10)) for i in range(2000)]
    return spark.createDataFrame(rows, ["k", "v"]).cache()


def test_salted_agg_matches_plain(skewed):
    salted = salted_agg(
        skewed, ["k"],
        partials={"n": F.count(F.lit(1)),
                  "sum": F.sum(F.col("v").cast("decimal(25,4)"))},
        combines={"n": F.sum("n"), "sum": F.sum("sum")})
    plain = skewed.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("v").cast("decimal(25,4)")).alias("sum"))
    s = {r["k"]: (r["n"], r["sum"]) for r in salted.collect()}
    p = {r["k"]: (r["n"], r["sum"]) for r in plain.collect()}
    assert s == p


def test_salted_join_matches_plain(skewed, spark):
    dim = spark.createDataFrame(
        [("hot", "HOT"), ("k1", "K1"), ("k2", "K2")], ["k", "label"])
    salted = salted_join(skewed, dim, "k", how="inner", salts=4)
    plain = skewed.join(dim, "k", "inner")
    assert salted.count() == plain.count()
    s = salted.groupBy("k", "label").count()
    p = plain.groupBy("k", "label").count()
    assert {tuple(r) for r in s.collect()} == {tuple(r) for r in p.collect()}
