"""IoT simulator DataSource (sources/simulator.py): determinism,
partition-layout invariance, and streaming exactly-once across
restarts."""

from __future__ import annotations

import pytest

from iot_simulator_datalake_spark.sources import simulator


@pytest.fixture()
def sim(spark):
    simulator.register(spark)
    return spark


def _batch(spark, n=400, parts=8):
    return (spark.read.format("iot_simulator")
            .option("n_events", n).option("n_devices", 7)
            .option("numPartitions", parts).load())


def test_batch_generation_partition_invariant(sim):
    """Same options, different partition counts → identical multiset
    (the no-RNG doctrine: rows are a pure function of the index)."""
    a = sorted(map(tuple, _batch(sim, parts=3).collect()))
    b = sorted(map(tuple, _batch(sim, parts=13).collect()))
    assert a == b
    assert len(a) == 400
    row = dict(zip(_batch(sim).columns, a[0]))
    assert row["device_id"].startswith("dev-")
    assert row["sensor_type"] in simulator.UNITS
    assert row["unit"] == simulator.UNITS[row["sensor_type"]]


def test_stream_exactly_once_across_restarts(sim, tmp_path):
    """Growing-source model: each run sees a larger horizon; the
    restarted query resumes from the CHECKPOINTED offset and drains
    exactly the new tail.  Three runs over horizons 500→1200→2000 must
    produce the full range exactly once — the Kafka-offset contract,
    held by an integer index."""
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")

    def run_once(horizon):
        stream = (sim.readStream.format("iot_simulator")
                  .option("max_events", horizon)
                  .option("n_devices", 7).load())
        q = (stream.writeStream.format("parquet")
             .option("path", out).option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    for horizon in (500, 1200, 2000):
        run_once(horizon)
    got = sim.read.parquet(out)
    assert got.count() == 2000
    assert got.select("event_idx").distinct().count() == 2000  # no dupes

    # stream == batch parity: the same horizon read as a batch source
    batch = (sim.read.format("iot_simulator")
             .option("n_events", 2000).option("n_devices", 7).load())
    assert sorted(map(tuple, got.collect())) \
        == sorted(map(tuple, batch.collect()))


def test_zero_events_smoke(spark):
    """n_events=0 must yield an empty frame, not a range()/zero-div
    crash (the streaming twin already guarded; the batch reader now
    matches)."""
    df = (spark.read.format("iot_simulator")
          .option("n_events", 0).load())
    assert df.count() == 0


def test_stream_reader_partitions_guard_zero_npartitions():
    """numPartitions=0 must not ZeroDivisionError inside the data
    source (the batch reader already guarded the same option)."""
    from iot_simulator_datalake_spark.sources.simulator import (
        IoTSimulatorStreamReader)
    r = IoTSimulatorStreamReader({"numPartitions": "0",
                                  "max_events": "10"})
    parts = r.partitions({"idx": 0}, {"idx": 10})
    assert sum(p.end - p.start for p in parts) == 10


def test_stream_reader_defined_in_class():
    """Streaming capability is a real method on the data source class,
    not a post-hoc monkeypatch."""
    from iot_simulator_datalake_spark.sources.simulator import (
        IoTSimulatorDataSource, IoTSimulatorStreamReader)
    src = IoTSimulatorDataSource.__new__(IoTSimulatorDataSource)
    src.options = {"max_events": "5"}
    assert "streamReader" in IoTSimulatorDataSource.__dict__
    assert isinstance(src.streamReader(None), IoTSimulatorStreamReader)
