"""End-to-end medallion pipeline test (batch mode) against the
dirty-JSON landing fixture — SURVEY §5.2.3 golden invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iot_simulator_datalake_spark.engine import Engine
from iot_simulator_datalake_spark.pipeline import (
    attach_reference_checks, build_registry)


@pytest.fixture(scope="module")
def pipeline(spark, iot_landing, tmp_path_factory):
    landing, kept = iot_landing
    eng = Engine(spark, build_registry(streaming=False),
                 config={"iot_events_path": str(landing)},
                 warehouse=tmp_path_factory.mktemp("wh"))
    eng.run()
    attach_reference_checks(eng)
    return eng, kept


def test_bronze_ingests_all_rows(pipeline, iot_landing):
    eng, _ = pipeline
    assert eng.table("bronze.iot_events").count() == 2000
    assert "ingest_date" in eng.table("bronze.iot_events").columns


def test_silver_filters_dirty_flags(pipeline):
    eng, kept = pipeline
    silver = eng.table("silver.iot_events")
    assert silver.count() == kept            # bronze > silver invariant
    assert silver.count() < 2000
    flags = {r["quality_flag"] for r in silver.select("quality_flag")
             .distinct().collect()}
    assert flags == {"good", "suspect"}
    assert dict(silver.dtypes)["timestamp"] == "timestamp"
    assert dict(silver.dtypes)["value"] == "double"


def test_dims_are_unique(pipeline):
    eng, _ = pipeline
    locs = eng.table("gold.dim_locations")
    assert locs.count() == locs.select("location_id").distinct().count() == 10
    dd = eng.table("gold.dim_date")
    assert dd.count() == dd.select("date").distinct().count()
    assert set(dd.columns) == {"date", "year", "month", "day"}


def test_fact_grain_and_values(pipeline):
    eng, _ = pipeline
    fact = eng.table("gold.fact_iot_events")
    keys = ["location_id", "sensor_type", "quality_flag", "year", "month"]
    assert set(fact.columns) == set(keys + ["avg_value"])
    assert fact.count() == fact.select(*keys).distinct().count()
    # spot-check one group against a direct recompute from silver
    silver = eng.table("silver.iot_events")
    expected = (silver.groupBy(
        "location_id", "sensor_type", "quality_flag",
        F.year("timestamp").alias("year"), F.month("timestamp").alias("month"))
        .agg(F.avg("value").alias("avg_value")))
    assert fact.count() == expected.count()
    joined = fact.alias("f").join(
        expected.alias("e"),
        on=keys, how="inner").filter(
        F.abs(F.col("f.avg_value") - F.col("e.avg_value")) > 1e-9)
    assert joined.count() == 0


def test_reference_checks_all_pass(pipeline):
    eng, _ = pipeline
    results = eng.test()
    failed = [r for r in results if not r.passed]
    assert not failed, f"failed checks: {[(r.name, r.sample) for r in failed]}"
    assert len(results) == 11
