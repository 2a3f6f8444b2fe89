"""Sources & sinks (SURVEY §2.1)."""

from .json_source import infer_and_persist_schema, read_json_batch, read_json_stream
from .cdc import parse_debezium, read_cdc_batch
from .kafka import KAFKA_ENVELOPE, parse_kafka_json, read_kafka_stream

__all__ = [
    "infer_and_persist_schema", "read_json_batch", "read_json_stream",
    "parse_debezium", "read_cdc_batch",
    "KAFKA_ENVELOPE", "parse_kafka_json", "read_kafka_stream",
]
