"""Kafka envelope parsing (broker-free) + graceful connector error."""

from __future__ import annotations

import json
from datetime import datetime

import pytest
from pyspark.sql import types as T

from iot_simulator_datalake_spark.sources import (KAFKA_ENVELOPE,
                                                  parse_kafka_json,
                                                  read_kafka_stream)

PAYLOAD = T.StructType([
    T.StructField("device_id", T.StringType()),
    T.StructField("value", T.DoubleType()),
])


def test_parse_kafka_json_envelope(spark):
    rows = [
        (b"k1", json.dumps({"device_id": "d1", "value": 1.5}).encode(),
         "iot", 0, 42, datetime(2024, 1, 1)),
        (b"k2", b"not json at all", "iot", 0, 43, datetime(2024, 1, 1)),
    ]
    raw = spark.createDataFrame(rows, KAFKA_ENVELOPE)
    out = parse_kafka_json(raw, PAYLOAD).collect()
    good = next(r for r in out if r["offset"] == 42)
    assert good["device_id"] == "d1" and good["value"] == 1.5
    assert good["topic"] == "iot"
    # malformed JSON → null payload columns, row retained (PERMISSIVE)
    bad = next(r for r in out if r["offset"] == 43)
    assert bad["device_id"] is None


def test_kafka_source_errors_without_connector(spark):
    with pytest.raises(Exception, match="[Kk]afka"):
        df = read_kafka_stream(spark, "localhost:9092", "t")
        df.writeStream.format("noop").start()  # force plan if lazy


def test_metadata_name_collision_rejected(spark):
    """A payload field named like a Kafka metadata column would emit a
    duplicate column (AMBIGUOUS_REFERENCE downstream, parquet write
    failure) — it must be rejected loudly instead."""
    import pytest
    from pyspark.sql import types as T
    from iot_simulator_datalake_spark.sources.kafka import parse_kafka_json
    raw = spark.createDataFrame(
        [(b'{"offset": 1}',)], "value binary") \
        .selectExpr("value", "'t' AS topic", "0 AS partition",
                    "1L AS offset", "current_timestamp() AS timestamp")
    schema = T.StructType([T.StructField("offset", T.LongType())])
    with pytest.raises(ValueError, match="offset"):
        parse_kafka_json(raw, schema)
    # without metadata the same payload parses fine
    out = parse_kafka_json(raw, schema, with_metadata=False).collect()
    assert out[0]["offset"] == 1
