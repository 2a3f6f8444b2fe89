"""Bucketed-table materialization: joins on the bucket key must
co-locate (no Exchange on either side of the SortMergeJoin)."""

from __future__ import annotations

import io
import contextlib

from pyspark.sql import functions as F

from iot_simulator_datalake_spark.engine import Engine, Registry, model


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    r = Registry()

    @model(r, name="facts", layer="gold", materialization="table",
           bucket_by=(4, "k"))
    def facts(ctx):
        return ctx.spark.range(1000).select(
            (F.col("id") % 50).alias("k"), F.col("id").alias("v"))

    @model(r, name="dims", layer="gold", materialization="table",
           bucket_by=(4, "k"))
    def dims(ctx):
        return ctx.spark.range(50).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("w"))

    eng = Engine(spark, r, warehouse=tmp_path / "wh")
    try:
        eng.run()
        joined = (eng.table("gold.facts")
                  .join(eng.table("gold.dims").hint("merge"), "k"))
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        # co-located: bucket layout replaces the shuffle on both sides
        assert "Exchange hashpartitioning" not in plan
        # correctness unchanged
        assert joined.count() == 1000
    finally:
        spark.sql("DROP TABLE IF EXISTS gold.facts")
        spark.sql("DROP TABLE IF EXISTS gold.dims")
