"""CDC source (S8) + SCD1 integration test on a Debezium-style fixture
(FIXTURES.md §2)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import types as T

from iot_simulator_datalake_spark.operators import scd1_current
from iot_simulator_datalake_spark.sources.cdc import read_cdc_batch

PAYLOAD = T.StructType([
    T.StructField("id", T.StringType()),
    T.StructField("device_name", T.StringType()),
    T.StructField("model", T.StringType()),
])


def envelope(op, ts_ms, before=None, after=None):
    return json.dumps({"op": op, "ts_ms": ts_ms,
                       "before": before, "after": after})


@pytest.fixture(scope="module")
def cdc_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("cdc")
    lines = [
        envelope("c", 1000, after={"id": "d1", "device_name": "alpha",
                                   "model": "m1"}),
        envelope("u", 2000, after={"id": "d1", "device_name": "alpha-2",
                                   "model": "m1"}),
        envelope("c", 1500, after={"id": "d2", "device_name": "beta",
                                   "model": "m2"}),
        envelope("d", 3000, before={"id": "d2", "device_name": "beta",
                                    "model": "m2"}),
    ]
    (d / "changes.json").write_text("\n".join(lines))
    return d


def test_parse_debezium_shapes(spark, cdc_dir):
    df = read_cdc_batch(spark, str(cdc_dir), PAYLOAD)
    assert set(df.columns) == {"id", "device_name", "model", "op",
                               "op_ts", "_is_deleted"}
    rows = {(r["id"], r["op"]): r for r in df.collect()}
    assert rows[("d1", "u")]["device_name"] == "alpha-2"
    assert rows[("d2", "d")]["_is_deleted"] is True
    assert rows[("d2", "d")]["device_name"] == "beta"  # image from before


def test_scd1_over_cdc(spark, cdc_dir):
    changes = read_cdc_batch(spark, str(cdc_dir), PAYLOAD)
    current = scd1_current(changes, key="id")
    rows = {r["id"]: r["device_name"] for r in current.collect()}
    # d1 → latest update wins; d2 → deleted, excluded
    assert rows == {"d1": "alpha-2"}


def test_parse_debezium_rejects_output_name_clashes(spark):
    """Payload fields named op/op_ts/_is_deleted would duplicate or
    silently clobber the flat output columns (the kafka source rejects
    the same hazard loudly); parse_debezium must too."""
    import pytest
    from pyspark.sql import types as T

    from iot_simulator_datalake_spark.sources.cdc import parse_debezium
    raw = spark.createDataFrame([("{}",)], "value string")
    bad = T.StructType([T.StructField("id", T.LongType()),
                        T.StructField("op", T.StringType())])
    with pytest.raises(ValueError, match="collide"):
        parse_debezium(raw, bad)
    worse = T.StructType([T.StructField("_is_deleted", T.BooleanType())])
    with pytest.raises(ValueError, match="collide"):
        parse_debezium(raw, worse)
