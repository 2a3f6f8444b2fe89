"""Structured Streaming orchestration (SURVEY §2.8)."""

from .runner import materialize_streaming_table, run_stream_available_now

__all__ = ["materialize_streaming_table", "run_stream_available_now"]
