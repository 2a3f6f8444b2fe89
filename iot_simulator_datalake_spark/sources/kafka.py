"""Kafka streaming source — the standard production ingress beside the
file-landing source (S1).  The Spark-Kafka connector jars
(spark-sql-kafka) are not in this environment, so the builder degrades
to an informative error at plan time; the parsing contract
(:func:`parse_kafka_json`) is pure DataFrame logic and fully tested
against the same envelope a real Kafka read produces.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession

#: the columns a Spark Kafka read yields (public connector contract)
KAFKA_ENVELOPE = T.StructType([
    T.StructField("key", T.BinaryType()),
    T.StructField("value", T.BinaryType()),
    T.StructField("topic", T.StringType()),
    T.StructField("partition", T.IntegerType()),
    T.StructField("offset", T.LongType()),
    T.StructField("timestamp", T.TimestampType()),
])


def read_kafka_stream(spark: "SparkSession", bootstrap_servers: str,
                      topic: str, starting_offsets: str = "latest"
                      ) -> "DataFrame":
    """Raw Kafka stream (needs the spark-sql-kafka connector jars)."""
    try:
        return (spark.readStream.format("kafka")
                .option("kafka.bootstrap.servers", bootstrap_servers)
                .option("subscribe", topic)
                .option("startingOffsets", starting_offsets)
                .load())
    except Exception as e:  # pragma: no cover - jar-dependent
        raise RuntimeError(
            "Kafka source requires the spark-sql-kafka connector on the "
            "classpath (spark-submit --packages org.apache.spark:"
            "spark-sql-kafka-0-10_2.13:<spark-version>); not bundled in "
            f"this environment. Underlying error: {e}") from e


def parse_kafka_json(raw: "DataFrame", payload: T.StructType,
                     with_metadata: bool = True) -> "DataFrame":
    """Decode a Kafka envelope's JSON ``value`` into typed columns.

    Works identically on a real Kafka read or any DataFrame with the
    same envelope (which is how it is tested without a broker).
    """
    if with_metadata:
        # the metadata columns keep their Kafka envelope names (the
        # gated oracle depends on them) — so a payload field sharing
        # one of those names would silently duplicate the column and
        # poison every downstream select/write; reject it loudly
        clash = {f.name for f in payload.fields} & \
            {"topic", "partition", "offset", "kafka_ts"}
        if clash:
            raise ValueError(
                f"payload fields {sorted(clash)} collide with Kafka "
                "metadata column names; rename them in the payload "
                "schema or pass with_metadata=False")
    parsed = F.from_json(F.col("value").cast("string"), payload)
    out = raw.select(
        parsed.alias("_p"),
        *([F.col("topic"), F.col("partition"), F.col("offset"),
           F.col("timestamp").alias("kafka_ts")] if with_metadata else []))
    return out.select("_p.*",
                      *(["topic", "partition", "offset", "kafka_ts"]
                        if with_metadata else []))
