"""Snapshot versioning + time travel: immutable versions, atomic
manifest commit, negative indexing, as-of lookup, vacuum retention,
and the Engine's snapshot_keep materialization path."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from iot_simulator_datalake_spark.engine.model import Registry, model
from iot_simulator_datalake_spark.engine.runner import Engine
from iot_simulator_datalake_spark.engine.snapshots import (
    read_snapshot, read_snapshot_as_of, versions, write_snapshot)


def _df(spark, n, tag):
    return spark.range(n).select(
        F.col("id"), F.lit(tag).alias("tag"))


def test_versions_are_immutable_and_time_travelable(spark, tmp_path):
    tbl = tmp_path / "snap"
    assert write_snapshot(_df(spark, 10, "a"), tbl) == 0
    t_between = time.time()
    time.sleep(1.1)  # manifest timestamps have 1s resolution
    assert write_snapshot(_df(spark, 20, "b"), tbl) == 1

    assert versions(tbl) == [0, 1]
    assert read_snapshot(spark, tbl).count() == 20          # current
    assert read_snapshot(spark, tbl, 0).count() == 10       # explicit
    assert read_snapshot(spark, tbl, -1).count() == 10      # relative
    assert (read_snapshot_as_of(spark, tbl, t_between)
            .agg(F.max("tag")).collect()[0][0] == "a")

    with pytest.raises(KeyError):
        read_snapshot(spark, tbl, 7)


def test_vacuum_keeps_newest(spark, tmp_path):
    tbl = tmp_path / "snap"
    for i in range(4):
        write_snapshot(_df(spark, i + 1, f"t{i}"), tbl, keep=2)
    assert versions(tbl) == [2, 3]
    assert read_snapshot(spark, tbl).count() == 4
    with pytest.raises(KeyError):
        read_snapshot(spark, tbl, 0)  # vacuumed


def test_engine_snapshot_materialization(spark, tmp_path):
    reg = Registry()
    state = {"tag": "first"}

    @model(reg, name="t", layer="gold", materialization="table",
           snapshot_keep=3)
    def t(ctx):
        return _df(ctx.spark, 5, state["tag"])

    eng = Engine(spark, reg, warehouse=tmp_path / "wh")
    eng.run()
    state["tag"] = "second"
    eng.run()

    path = eng.table_path(reg["gold.t"])
    assert versions(path) == [0, 1]
    # registered relation is the NEW version…
    assert (eng.table("gold.t").agg(F.max("tag")).collect()[0][0]
            == "second")
    # …and the old one is still queryable (time travel)
    assert (read_snapshot(spark, path, 0)
            .agg(F.max("tag")).collect()[0][0] == "first")
