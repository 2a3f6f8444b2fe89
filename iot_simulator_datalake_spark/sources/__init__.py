"""Sources & sinks (SURVEY §2.1)."""

from .json_source import infer_and_persist_schema, read_json_batch, read_json_stream
from .cdc import parse_debezium, read_cdc_batch

__all__ = [
    "infer_and_persist_schema", "read_json_batch", "read_json_stream",
    "parse_debezium", "read_cdc_batch",
]
