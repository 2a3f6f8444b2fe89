"""Custom stateful streaming via ``transformWithStateInPandas`` — the
Spark 4 ``StatefulProcessor`` API (SURVEY §2.8 [EXT]; successor to the
``applyInPandasWithState`` path in ``stateful.py``).

Why both exist: ``applyInPandasWithState`` gives one opaque state
tuple per key; ``StatefulProcessor`` gives named typed state variables
(value/list/map), timers, and TTL — the OSS equivalent of the stateful
building blocks DLT expresses declaratively.  New operators should use
this API; ``stateful.py`` stays as the Spark 3.x-compatible form.

Determinism note: the processor sums pre-quantized int64 micro-units
produced JVM-side (``decimal(25,4) × 10⁴``), never floats — integer
addition is order-independent, so the result is identical regardless
of how rows batch into pandas chunks or which executor owns the key.

State volume is O(distinct keys) in the executor state store
(RocksDB-backed at scale); each micro-batch touches only the keys
present in it.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor, StatefulProcessorHandle)

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame

def totals_schema(key_type: "T.DataType") -> T.StructType:
    """Output schema with the key typed from the caller's stream — a
    hardcoded LongType key is the same Arrow-crash-on-string-keys bug
    stateful._key_type documents for the v1 path."""
    return T.StructType([
        T.StructField("key", key_type),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_micro", T.LongType()),
    ])


class RunningTotalsProcessor(StatefulProcessor):
    """Per-key running (count, Σ micro-units) across micro-batches.

    One named ValueState holds the pair; ``update`` output mode emits
    the refreshed totals for every key seen in the batch.
    """

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "totals", "n BIGINT, total_micro BIGINT")

    def handleInputRows(self, key, rows: Iterator[pd.DataFrame],
                        timerValues) -> Iterator[pd.DataFrame]:
        prev = self._state.get()
        n, total = (prev[0], prev[1]) if prev is not None else (0, 0)
        for pdf in rows:
            n += len(pdf)
            total += int(pdf["v_micro"].sum())
        self._state.update((n, total))
        yield pd.DataFrame({"key": [key[0]], "n_events": [n],
                            "total_micro": [total]})

    def close(self) -> None:
        pass


def running_totals_v2(stream: "DataFrame", key_col: str,
                      value_col: str) -> "DataFrame":
    """Attach the processor: quantize JVM-side, group, transform.

    The quantization (``decimal(25,4) → int64 micro-units``) runs in
    codegen before rows cross the Arrow boundary, so the Python side
    only ever adds integers.
    """
    from .stateful import quantize_micro
    quant = quantize_micro(stream, key_col, value_col)
    return quant.groupBy("key").transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(),
        outputStructType=totals_schema(quant.schema["key"].dataType),
        outputMode="update", timeMode="None")
