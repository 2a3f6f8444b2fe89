"""Debezium-style CDC JSON source (S8, [DOC]).

The reference's README describes per-entity CDC tables ingesting
Debezium-style change events with a ``_is_deleted`` soft-delete flag
(README_DBT.md:160-169,242-244); no code exists in the repo, so the
shape here follows the public Debezium envelope: ``op`` ∈ {c,u,d,r},
``before``/``after`` payload structs, and a source timestamp.

The flat fixture shape (FIXTURES.md §2: ``id``, ``op``, ``op_ts``,
``_is_deleted`` + payload columns) needs no parser — it IS this
module's OUTPUT shape; flat feeds go straight to the downstream CDC
operators (operators/scd.py, queries.cdc_latest_wins).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession


def debezium_envelope_schema(payload: T.StructType) -> T.StructType:
    """Envelope schema for a given entity payload struct."""
    return T.StructType([
        T.StructField("op", T.StringType(), True),
        T.StructField("ts_ms", T.LongType(), True),
        T.StructField("before", payload, True),
        T.StructField("after", payload, True),
    ])


def parse_debezium(raw: "DataFrame", payload: T.StructType,
                   json_col: str = "value") -> "DataFrame":
    """Parse raw JSON strings carrying a Debezium envelope into flat
    change rows: payload columns + ``op`` + ``op_ts`` + ``_is_deleted``.

    Delete events carry the image in ``before``; everything else in
    ``after`` (public Debezium semantics).  All JVM-side (`from_json`),
    no Python per-row work.
    """
    # output columns op/op_ts/_is_deleted keep fixed names (the flat
    # fixture contract above) — a payload field sharing one would
    # duplicate the column ('op' → AMBIGUOUS_REFERENCE far from here)
    # or be silently clobbered ('_is_deleted' soft-delete overwritten
    # by the withColumn below); reject loudly like the kafka twin
    clash = {f.name for f in payload.fields} & \
        {"op", "op_ts", "_is_deleted"}
    if clash:
        raise ValueError(
            f"payload fields {sorted(clash)} collide with CDC output "
            "column names (op, op_ts, _is_deleted); rename them in "
            "the payload schema")
    env = F.from_json(F.col(json_col), debezium_envelope_schema(payload))
    image = F.when(env["op"] == "d", env["before"]).otherwise(env["after"])
    return (raw
            .select(image.alias("_img"), env["op"].alias("op"),
                    F.timestamp_millis(env["ts_ms"]).alias("op_ts"))
            .select("_img.*", "op", "op_ts")
            .withColumn("_is_deleted", F.col("op") == F.lit("d")))


def read_cdc_batch(spark: "SparkSession", path: str,
                   payload: T.StructType) -> "DataFrame":
    """Batch-read a landing dir of Debezium JSON lines for one entity."""
    raw = spark.read.text(str(path))   # text source names its column "value"
    return parse_debezium(raw, payload)
