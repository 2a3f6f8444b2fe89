"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY §2.8; the OSS mechanism for operators DLT expresses as
stateful incremental computations).

The state handle is Spark's own keyed state store (RocksDB/HDFS-backed
per executor at scale) — state volume is O(distinct keys), never
O(events), and each micro-batch touches only the keys present in it.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

import pandas as pd

from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame


def _key_type(grouped, key_col: str) -> "T.DataType":
    """Grouping-key type taken from the grouped stream itself, so the
    output/state schemas match whatever the caller grouped by — a
    hardcoded LongType key made every string-keyed stream (the
    simulator's own 'dev-0' ids!) die at Arrow conversion while the
    signature promised generality."""
    return grouped._df.schema[key_col].dataType


def running_schema(key_type: "T.DataType") -> T.StructType:
    return T.StructType([
        T.StructField("key", key_type),
        T.StructField("n_events", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ])


_STATE_SCHEMA = T.StructType([
    T.StructField("n", T.LongType()),
    T.StructField("total", T.DoubleType()),
])


def running_totals(grouped, key_col: str, value_col: str) -> "DataFrame":
    """Per-key running (count, sum) maintained across micro-batches.

    Usage::

        stream.groupBy("user_id") |> running_totals("user_id", "value")

    Emits one updated row per key per micro-batch (update semantics).
    Key type follows the grouped column (string/long/... all work).
    """

    def update(key, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame({"key": [key[0]], "n_events": [n],
                            "total": [total]})

    return grouped.applyInPandasWithState(
        update, outputStructType=running_schema(_key_type(grouped,
                                                          key_col)),
        stateStructType=_STATE_SCHEMA, outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout)


_MICRO_STATE_SCHEMA = T.StructType([
    T.StructField("n", T.LongType()),
    T.StructField("total", T.LongType()),
])


def running_totals_micro(grouped) -> "DataFrame":
    """Per-key running (count, Σ int64 micro-units) across batches.

    Deterministic twin of ``running_totals``: expects a pre-quantized
    ``v_micro`` int64 column (see ``quantize_micro``) so the Python
    side only ever adds integers — order-independent, hence bit-equal
    across partitionings, batch splits, and retries.
    """

    def update(key, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            total += int(pdf["v_micro"].sum())
        state.update((n, total))
        yield pd.DataFrame({"key": [key[0]], "n_events": [n],
                            "total_micro": [total]})

    out = T.StructType([
        T.StructField("key", _key_type(grouped, "key")),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_micro", T.LongType()),
    ])
    return grouped.applyInPandasWithState(
        update, outputStructType=out,
        stateStructType=_MICRO_STATE_SCHEMA, outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout)


def quantize_micro(stream: "DataFrame", key_col: str,
                   value_col: str) -> "DataFrame":
    """JVM-side quantization (decimal(25,4) → int64 micro-units) so
    quantization runs in codegen before rows cross the Arrow boundary."""
    from pyspark.sql import functions as F
    return stream.select(
        F.col(key_col).alias("key"),
        (F.col(value_col).cast("decimal(25,4)") * 10_000)
        .cast("long").alias("v_micro"))
