"""Guards for the pinned microbatch watermark semantics behind
streaming_late_data_drop's oracle (queries_streaming._LATE_ORACLE).

The oracle replays Spark's late-drop/eviction rules in SQL, so it is
only correct while those rules hold.  test_pinned_watermark_semantics
re-derives every clause from one crafted-timestamp run — a Spark
upgrade that changes batch ordering, the late-filter lag, or a
boundary inclusivity fails HERE with a named clause instead of as an
opaque oracle hash mismatch.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import functions as F

from iot_simulator_datalake_spark.queries import REGISTRY, load
from iot_simulator_datalake_spark.streaming.runner import (
    run_stream_available_now)

SF_DIR = "/root/testdata/sf0.001"


def _run_windowed_append(spark, land, slices, delay="30 minutes"):
    """Stage (name, mtime, [ts strings]) slices and drain them through a
    watermarked 1h-window count in append mode; returns {window_start:
    count}."""
    for name, mt, rows in slices:
        df = (spark.createDataFrame([(t,) for t in rows], "ts string")
              .select(F.to_timestamp("ts").alias("ts")))
        d = f"{land}/{name}.parquet"
        df.coalesce(1).write.mode("overwrite").parquet(d)
        for fn in os.listdir(d):
            os.utime(os.path.join(d, fn), (mt, mt))
    stream = (spark.readStream.schema("ts timestamp")
              .option("recursiveFileLookup", "true")
              .option("maxFilesPerTrigger", 1).parquet(land))
    agg = (stream.withWatermark("ts", delay)
           .groupBy(F.window("ts", "1 hour").alias("w"))
           .agg(F.count(F.lit(1)).alias("n")))
    qn = f"late_guard_{uuid.uuid4().hex[:8]}"
    writer = (agg.writeStream.outputMode("append")
              .format("memory").queryName(qn)
              .option("checkpointLocation", f"{land}/_ckpt"))
    run_stream_available_now(writer)
    return {r.w.start.strftime("%H:%M"): r.n
            for r in spark.table(qn).collect()}


def test_pinned_watermark_semantics(spark, tmp_path):
    """One run pins all four oracle clauses.  Slice names sort in
    REVERSE of their mtimes, so name-ordered discovery would put the
    'late' rows first (watermark 0 → nothing dropped) and emit the
    12:00/13:00 windows — any outcome drift names its clause below."""
    out = _run_windowed_append(spark, str(tmp_path / "land"), [
        # batch0: wm after = 14:30 - 30min = 14:00
        ("z_0", 1000, ["2024-01-01 10:15:00", "2024-01-01 14:30:00"]),
        # batch1: wm after = 16:30 - 30min = 16:00
        ("m_1", 2000, ["2024-01-01 15:05:00", "2024-01-01 16:30:00"]),
        # batch2: late filter uses wm through batch0 (= 14:00), one
        # batch BEHIND the eviction watermark (= 16:00)
        ("a_2", 3000, ["2024-01-01 12:45:00",   # end 13:00 <  14:00
                       "2024-01-01 13:20:00",   # end 14:00 == 14:00
                       "2024-01-01 14:10:00"]), # end 15:00 >  14:00
    ])
    # clause 1 (mtime order): name order would keep 12:45/13:20
    assert "12:00" not in out and "13:00" not in out, \
        "late rows not dropped — batch order or late filter broke"
    # clause 3 (late filter lags one batch + inclusive at equality):
    # 14:10 survives a filter that would kill it under the CURRENT
    # (16:00) watermark — so the filter used the lagged 14:00 — and
    # 13:20 (window end == 14:00 exactly) was dropped anyway
    assert out.get("14:00") == 2, \
        f"expected 14:30+14:10 in [14,15): {out}"
    # clause 4 (inclusive emission + holdback): [15,16) end == final
    # watermark 16:00 → emitted; [16,17) end 17:00 > 16:00 → held
    assert out.get("15:00") == 1, f"window at == watermark not emitted: {out}"
    assert "16:00" not in out, f"open tail window leaked: {out}"
    assert out.get("10:00") == 1
    assert len(out) == 3, f"unexpected extra windows: {out}"


def test_late_drop_query_non_degenerate(spark):
    """The sf0.001 replay must actually exercise both behaviors the
    query demonstrates: some rows dropped by the late filter, and the
    open tail window(s) held back from append output."""
    res = REGISTRY["streaming_late_data_drop"].fn(spark, SF_DIR).collect()
    assert res, "replay emitted nothing — stream or staging regressed"
    emitted = sum(r.n_events for r in res)
    ev = load(spark, SF_DIR, "events").filter(F.col("ts").isNotNull())
    total = ev.count()
    assert emitted < total * 0.99, \
        f"no meaningful drops: {emitted}/{total}"
    last_hour, = ev.agg(F.max(F.date_trunc("hour", "ts"))).first()
    assert max(r.hour for r in res) < last_hour, \
        "tail window was emitted — holdback did not happen"


def test_zero_input_yields_empty_typed_frame(spark, tmp_path):
    """A zero-row source must drain to an empty result with the full
    schema (the repo-wide zero-input streaming contract), not crash in
    the stager's span math."""
    import iot_simulator_datalake_spark.queries_streaming as qs
    land = str(tmp_path / "empty_land")
    empty = spark.createDataFrame(
        [], "ts timestamp, value double, event_id bigint")
    qs.stage_late_replay(spark, empty, land)
    stream = (spark.readStream.schema(empty.schema)
              .option("recursiveFileLookup", "true")
              .option("maxFilesPerTrigger", 1).parquet(land))
    agg = (stream.withWatermark("ts", qs._LATE["delay"])
           .groupBy(F.window("ts", "1 hour").alias("w"))
           .agg(F.count(F.lit(1)).alias("n_events")))
    name = f"late_empty_{uuid.uuid4().hex[:8]}"
    run_stream_available_now(
        agg.writeStream.outputMode("append").format("memory")
        .queryName(name)
        .option("checkpointLocation", f"{land}/_ckpt"))
    out = spark.table(name)
    assert out.count() == 0
    assert [f.name for f in out.schema["w"].dataType] == ["start", "end"]


def test_watermark_and_state_survive_checkpoint_restart(spark, tmp_path):
    """Two drains over ONE checkpoint: run 2 must (a) late-filter
    against the RESTORED watermark (16:00 from run 1 — the new old row
    is dropped even though run 2's own batches never advanced past
    it), and (b) merge into RESTORED window state (run 1's held 16:30
    row is still counted when its window finally closes in run 2)."""
    land = str(tmp_path / "land")
    ckpt = f"{land}/_ckpt"

    def _stage(name, mt, rows):
        df = (spark.createDataFrame([(t,) for t in rows], "ts string")
              .select(F.to_timestamp("ts").alias("ts")))
        d = f"{land}/{name}.parquet"
        df.coalesce(1).write.mode("overwrite").parquet(d)
        for fn in os.listdir(d):
            os.utime(os.path.join(d, fn), (mt, mt))

    def _drain(wave):
        # memory sink refuses checkpoint recovery — foreachBatch into a
        # fresh per-wave parquet dir is the recoverable twin, and the
        # per-wave dir isolates exactly this run's emissions.  OUTSIDE
        # the landing dir: a sink inside it would be discovered as
        # input by the next wave's file listing
        out = str(tmp_path / f"out_{wave}")
        stream = (spark.readStream.schema("ts timestamp")
                  .option("recursiveFileLookup", "true")
                  .option("maxFilesPerTrigger", 1).parquet(land))
        agg = (stream.withWatermark("ts", "30 minutes")
               .groupBy(F.window("ts", "1 hour").alias("w"))
               .agg(F.count(F.lit(1)).alias("n")))
        run_stream_available_now(
            agg.writeStream.outputMode("append")
            .foreachBatch(lambda df, _e:
                          df.write.mode("append").parquet(out))
            .option("checkpointLocation", ckpt))
        return {r.w.start.strftime("%H:%M"): r.n
                for r in spark.read.parquet(out).collect()}

    _stage("z_0", 1000, ["2024-01-01 10:15:00", "2024-01-01 14:30:00"])
    _stage("m_1", 2000, ["2024-01-01 15:05:00", "2024-01-01 16:30:00"])
    w1 = _drain(1)  # final wm 16:00: emits [10,11), [14,15), [15,16);
    assert w1 == {"10:00": 1, "14:00": 1, "15:00": 1}, w1
    # [16,17) (the 16:30 row) stays in STATE, wm=16:00 in the ckpt

    _stage("a_2", 3000, [
        "2024-01-01 13:30:00",  # end 14:00 <= restored wm 16:00 → drop
        "2024-01-01 16:45:00",  # joins the restored [16,17) state
        "2024-01-01 17:30:00",  # advances wm to 17:00 → closes [16,17)
    ])
    w2 = _drain(2)  # per-wave dir = run-2 emissions only
    assert w2 == {"16:00": 2}, (
        f"{w2} — expected the restored 16:30 + new 16:45 to close "
        "together and the 13:30 straggler to be dropped by the "
        "RESTORED watermark")
