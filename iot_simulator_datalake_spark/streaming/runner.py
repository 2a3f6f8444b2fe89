"""Triggered streaming-table materialization.

The reference's streaming tables run in *triggered* mode — drain all
available input, then stop (README_DBT.md:213 "Triggered Mode: Not
continuous"; bronze_iot_events.sql:2,8-9 for the streaming-table
semantics; silver_iot_events.sql:10-12 for table-to-table incremental
reads).  The OSS equivalent is ``Trigger.AvailableNow`` with a
checkpoint directory: the checkpoint's source-offset log gives
exactly-once file discovery (ST1) and stream-to-stream incremental
propagation (ST2) across repeated runs.

Scale note: the parquet streaming sink appends one commit per
micro-batch; with availableNow Spark splits the backlog into
maxFilesPerTrigger-sized batches, so state stays bounded no matter how
large the landing directory has grown.
"""

from __future__ import annotations

from pathlib import Path
from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession
    from pyspark.sql.streaming import DataStreamWriter


def run_stream_available_now(writer: "DataStreamWriter",
                             timeout_sec: float = 600.0):
    """Start a triggered (availableNow) streaming query and block until
    it has drained all currently-available input.  Returns the
    (terminated) query handle so callers can assert on its progress
    metrics (state rows, state-store custom metrics)."""
    q = writer.trigger(availableNow=True).start()
    try:
        if not q.awaitTermination(timeout_sec):
            raise TimeoutError(
                f"streaming query {q.name or q.id} did not drain within "
                f"{timeout_sec}s")
        if q.exception() is not None:
            raise q.exception()  # type: ignore[misc]
    finally:
        if q.isActive:
            q.stop()
    return q


def materialize_streaming_table(spark: "SparkSession", stream_df: "DataFrame",
                                path: Path, checkpoint: Path,
                                partition_by: tuple[str, ...] = (),
                                timeout_sec: float = 600.0) -> "DataFrame":
    """Drain a streaming DataFrame into a parquet table exactly-once and
    return a batch DataFrame over the result (⇔ a DLT streaming table:
    incremental append, re-runs only process new input).
    """
    if not stream_df.isStreaming:
        raise ValueError("materialize_streaming_table needs a streaming "
                         "DataFrame (use spark.readStream)")
    writer = (stream_df.writeStream
              .format("parquet")
              .outputMode("append")
              .option("path", str(path))
              .option("checkpointLocation", str(checkpoint)))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    path.mkdir(parents=True, exist_ok=True)
    run_stream_available_now(writer, timeout_sec=timeout_sec)
    # Zero-input first run: no micro-batch ever wrote a parquet file,
    # so schema inference on the (pre-created, empty) dir would raise
    # AnalysisException — return an empty batch frame with the STREAM's
    # schema instead, so empty landing dirs / no-new-data re-runs are
    # clean no-ops for downstream models.
    if not any(p.suffix == ".parquet" for p in path.rglob("*")):
        return spark.createDataFrame([], stream_df.schema)
    # Read back with the STREAM's schema rather than letting inference
    # run and casting after it.  Two reasons: (a) partitioned read-back
    # moves partition columns last and re-types them via directory-value
    # inference, so the non-empty and zero-input paths returned
    # DIFFERENT schemas; (b) a cast AFTER inference is lossy — a string
    # partition value like '0123' infers as int 123 and casts back to
    # '123' (and '1.50' → '1.5'), silently corrupting numeric-looking
    # string keys.  A user-specified schema makes Spark parse the
    # directory values directly as the declared type (no inference) and
    # pins the column order.
    return spark.read.schema(stream_df.schema).parquet(str(path))
