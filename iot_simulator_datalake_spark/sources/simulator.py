"""IoT event simulator as a Spark 4 Python DataSource — first-class
parity with the reference's own raison d'être: the reference repo IS an
"iot_simulator" datalake (its landing volume is fed by a device
simulator; `dbt_project.yml:7` iot_events_path), but the simulator
lives outside its dbt project.  Here generation is an engine source:
``spark.read.format("iot_simulator").option(...)`` yields the raw
event schema the bronze layer ingests (`silver_iot_events.sql:13-21`
field list), so pipelines can be smoke-run end-to-end with zero input
files.

Determinism doctrine (same as every operator in this repo): NO RNG.
Every field derives from md5 of the event index with a field-specific
salt, so any engine — or the DuckDB oracle — regenerates the identical
dataset from (n_events, n_devices, start_ts) alone, independent of
partitioning, retries, or row order.

Scale design: generation is embarrassingly parallel — the index range
splits into ``numPartitions`` slices, each executor generates its own
slice (DataSourceReader.partitions), so a 10¹⁰-event backfill is one
map stage with no shuffle and no driver materialization.  Output rows
are plain tuples; the Python-source overhead is irrelevant for a
generator (there is no faster "scan" to displace) and at real scale
the same recipe compiles to a pure-SQL ``range(n)`` + md5 projection
(see the gated query's oracle, which IS that SQL in DuckDB form).
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    DataSourceStreamReader,
                                    InputPartition)
from pyspark.sql import types as T

SENSOR_TYPES = ["temperature", "humidity", "pressure", "motion"]
UNITS = {"temperature": "C", "humidity": "pct",
         "pressure": "hPa", "motion": "bool"}
#: ~10% dirty flags, matching the reference corpus (FIXTURES.md §1):
#: the silver filter keeps lower(trim) ∈ {good, suspect}
#: (silver_iot_events.sql:22)
QUALITY_FLAGS = ["good", "good", "good", "good", "good", "good",
                 "suspect", "suspect", "GOOD", "bad"]

SCHEMA = T.StructType([
    T.StructField("event_idx", T.LongType()),
    T.StructField("device_id", T.StringType()),
    T.StructField("location_id", T.StringType()),
    T.StructField("sensor_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("unit", T.StringType()),
    T.StructField("quality_flag", T.StringType()),
    T.StructField("timestamp", T.TimestampType()),
])


def _h(salt: str, i: int) -> int:
    """First 15 md5 hex chars of 'salt:i' as int — the repo's standard
    engine-portable hash (== DuckDB ('0x'||substr(md5(..),1,15))::BIGINT)."""
    return int(hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:15], 16)


def gen_event(i: int, n_devices: int, start: datetime) -> tuple:
    """One raw event, pure function of (i, n_devices, start)."""
    st = SENSOR_TYPES[_h("sensor", i) % len(SENSOR_TYPES)]
    return (
        i,
        f"dev-{_h('dev', i) % n_devices}",
        f"loc-{_h('loc', i) % 50}",
        st,
        (_h("val", i) % 10000) / 100.0,   # 0.00..99.99, exact /100.0
        UNITS[st],
        QUALITY_FLAGS[_h("flag", i) % len(QUALITY_FLAGS)],
        start + timedelta(seconds=i % 86400),
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class IoTSimulatorReader(DataSourceReader):
    def __init__(self, options):
        self.n_events = int(options.get("n_events", 1000))
        self.n_devices = int(options.get("n_devices", 20))
        self.n_partitions = int(options.get("numPartitions", 8))
        start = options.get("start_ts", "2024-01-01 00:00:00")
        # naive UTC wall clock — matches the session's UTC timezone and
        # the DuckDB oracle's naive timestamps
        self.start = datetime.strptime(start, "%Y-%m-%d %H:%M:%S")

    def partitions(self):
        # n_events=0 (empty-dataset smoke runs) → one EMPTY partition
        # (Spark requires at least one); max(1, …) on the divisor
        # guards numPartitions=0, mirrored in the streaming twin
        if self.n_events <= 0:
            return [_RangePartition(0, 0)]   # one empty partition
        step = max(1, -(-self.n_events // max(1, self.n_partitions)))
        return [_RangePartition(lo, min(lo + step, self.n_events))
                for lo in range(0, self.n_events, step)]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield gen_event(i, self.n_devices, self.start)


class IoTSimulatorDataSource(DataSource):
    """``spark.read.format("iot_simulator")`` — options: n_events,
    n_devices, start_ts ('YYYY-MM-DD HH:MM:SS'), numPartitions."""

    @classmethod
    def name(cls):
        return "iot_simulator"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return IoTSimulatorReader(self.options)

    def streamReader(self, schema):
        # defined in-class (not monkeypatched on later) so a reader of
        # this class sees the streaming capability; the stream reader
        # class itself is defined below in the streaming section
        return IoTSimulatorStreamReader(self.options)


def register(spark) -> None:
    """Register the source on a session.  Re-registration simply
    overwrites in pyspark 4, so this needs no guard — the old bare
    ``except Exception: pass`` here masked REAL registration failures
    (Connect sessions, API drift) that then resurfaced later as an
    unrelated DATA_SOURCE_NOT_FOUND."""
    spark.dataSource.register(IoTSimulatorDataSource)


# -- streaming flavor ------------------------------------------------------


class IoTSimulatorStreamReader(DataSourceStreamReader):
    """Offset-tracked streaming generation: the offset IS the event
    index, so every micro-batch is the half-open index range
    [start, end) and replaying a batch after a crash regenerates
    byte-identical rows (md5-deterministic) — exactly-once end-to-end
    with zero source-side state beyond the integer offset, the same
    contract Kafka offers with (topic, partition, offset).

    ``max_events`` is the horizon: how many events "exist so far".
    ``latestOffset`` reports it; Spark plans the batch from the
    CHECKPOINTED offset to that horizon, so a restarted query resumes
    where it committed and a re-run with a larger horizon drains
    exactly the new tail — the growing-source model.  (The reader
    itself is deliberately stateless between runs: progress lives
    only in the checkpoint, which is what makes the exactly-once
    argument airtight.)  Triggered/availableNow runs terminate because
    the horizon is finite — the reference's triggered-mode posture
    (README_DBT.md:213).
    """

    def __init__(self, options):
        self.n_devices = int(options.get("n_devices", 20))
        self.max_events = int(options.get("max_events", 1000))
        self.n_partitions = int(options.get("numPartitions", 4))
        start = options.get("start_ts", "2024-01-01 00:00:00")
        self.start = datetime.strptime(start, "%Y-%m-%d %H:%M:%S")

    def initialOffset(self):
        return {"idx": 0}

    def latestOffset(self):
        return {"idx": self.max_events}

    def partitions(self, start, end):
        lo, hi = start["idx"], end["idx"]
        # max(1, …) on the divisor like the batch reader: a
        # numPartitions=0 option otherwise ZeroDivisionErrors inside
        # the data source, surfacing as an opaque stream failure
        step = max(1, -(-(hi - lo) // max(1, self.n_partitions)))
        return [_RangePartition(a, min(a + step, hi))
                for a in range(lo, hi, step)]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield gen_event(i, self.n_devices, self.start)

    def commit(self, end):
        pass  # offsets are pure indices; nothing to release

    def stop(self):
        pass


