"""Multimodal binary-column plumbing tests."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from iot_simulator_datalake_spark.multimodal import (
    attach_payload, decode_image, extract_features, frame_sample)


@pytest.fixture(scope="module")
def media(spark):
    df = spark.createDataFrame(
        [(1, "fake jpeg bytes here"), (2, "another payload")],
        ["doc_id", "content"])
    return attach_payload(df, "content", media_type="image", fmt="jpeg")


def test_attach_payload_shape(media):
    row = media.filter(F.col("doc_id") == 1).collect()[0]
    assert isinstance(row["payload"], (bytes, bytearray))
    assert row["media"]["media_type"] == "image"
    assert row["media"]["format"] == "jpeg"
    assert row["media"]["n_bytes"] == len(b"fake jpeg bytes here")


def test_extract_features_deterministic(media):
    rows = {r["doc_id"]: r for r in extract_features(media).collect()}
    payload = b"fake jpeg bytes here"
    assert rows[1]["n_bytes"] == len(payload)
    assert rows[1]["digest"] == hashlib.md5(payload).hexdigest()
    d = hashlib.md5(payload).digest()
    assert rows[1]["width"] == 64 + d[0] % 192
    assert rows[1]["height"] == 64 + d[1] % 192
    # stable across runs
    again = {r["doc_id"]: r["digest"]
             for r in extract_features(media).collect()}
    assert again == {k: v["digest"] for k, v in rows.items()}


def test_repartition_by_bytes(spark):
    from iot_simulator_datalake_spark.multimodal import (
        attach_payload, repartition_by_bytes)
    rows = [(i, "x" * 1000) for i in range(100)]    # 100 KB of payload
    df = attach_payload(spark.createDataFrame(rows, ["id", "content"]),
                        "content")
    out = repartition_by_bytes(df, target_partition_bytes=30_000)
    assert out.rdd.getNumPartitions() == 4          # ceil(100k/30k)
    assert out.count() == 100
    # empty frame degrades to one partition
    empty = repartition_by_bytes(df.filter("id < 0"),
                                 target_partition_bytes=30_000)
    assert empty.rdd.getNumPartitions() == 1


def test_stubbed_codecs_raise(media):
    with pytest.raises(NotImplementedError):
        decode_image(media)
    with pytest.raises(NotImplementedError):
        frame_sample(media)
