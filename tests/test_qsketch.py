"""Tests for operators/qsketch.py — the mergeable bottom-k quantile
sketch.  The load-bearing property is the semilattice law (merging
hour-level sketches gives BIT-IDENTICAL day sketches to sketching the
raw day directly); it's what lets a 100 TB rollup follow any merge
tree, and what the DuckDB oracle replay relies on."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iot_simulator_datalake_spark.operators.qsketch import (
    bottom_k, sample_quantiles, sketch_hash)
from iot_simulator_datalake_spark.queries import load

SF = "/root/testdata/sf0.001"
K = 16


def _base(spark):
    e = load(spark, SF, "events")
    return (e.filter(F.col("value").isNotNull())
            .select(F.date_trunc("day", "ts").alias("day"),
                    F.date_trunc("hour", "ts").alias("hr"),
                    "value", "event_id",
                    sketch_hash(F.col("event_id")).alias("h")))


def test_merge_semilattice_on_real_data(spark):
    # bottom_k(bottom_k per hour, day) == bottom_k(raw, day): the
    # hour-level cut may never evict a row the day-level sample needs
    # (smallest-k hashes of the union are smallest-k of each part)
    base = _base(spark)
    merged = bottom_k(bottom_k(base, ["day", "hr"], K).drop("hr"),
                      ["day"], K)
    direct = bottom_k(base.drop("hr"), ["day"], K)
    ms = {(r["day"], r["event_id"]) for r in merged.collect()}
    ds = {(r["day"], r["event_id"]) for r in direct.collect()}
    assert ms == ds and len(ms) > 0


def test_merge_is_idempotent(spark):
    # re-cutting an already-cut sketch changes nothing (k-bounded
    # groups pass through) — re-running a merge level must be a no-op
    day = bottom_k(_base(spark).drop("hr"), ["day"], K)
    again = bottom_k(day, ["day"], K)
    assert sorted(r["event_id"] for r in again.collect()) == \
        sorted(r["event_id"] for r in day.collect())


def test_bottom_k_rejects_bad_k(spark):
    with pytest.raises(ValueError):
        bottom_k(_base(spark), ["day"], 0)


def test_sample_quantiles_positions(spark):
    # type-1 order statistics on a fully-sampled group: with m=10 the
    # picked positions are floor((m-1)p/100)+1 → p0=v[1], p50=v[5],
    # p100=v[10]
    rows = [("g", float(v), v) for v in range(1, 11)]
    df = spark.createDataFrame(rows, ["g", "value", "id"])
    out = sample_quantiles(df, ["g"], "value", "id",
                           (0, 50, 100)).collect()[0]
    assert out["m"] == 10
    assert (out["p0_est"], out["p50_est"], out["p100_est"]) \
        == (1.0, 5.0, 10.0)


def test_quantiles_singleton_group(spark):
    # m=1: every percentile picks position 1 — no division/index edge
    df = spark.createDataFrame([("g", 7.0, 1)], ["g", "value", "id"])
    out = sample_quantiles(df, ["g"], "value", "id", (50, 90)).collect()[0]
    assert out["m"] == 1 and out["p50_est"] == 7.0 and out["p90_est"] == 7.0
