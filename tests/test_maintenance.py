"""Compaction: file count drops, data unchanged, partitions preserved."""

from __future__ import annotations

from pyspark.sql import functions as F

from iot_simulator_datalake_spark.engine.maintenance import (
    compact, table_file_stats)


def test_compact_merges_small_files(spark, tmp_path):
    path = tmp_path / "tbl"
    df = spark.range(10000).select(
        F.col("id"), (F.col("id") % 3).alias("v"))
    # simulate many streaming micro-batch appends
    for i in range(6):
        df.filter(F.col("id") % 6 == i).repartition(4) \
          .write.mode("append").parquet(str(path))
    before_files, _ = table_file_stats(path)
    assert before_files >= 24
    checksum = spark.read.parquet(str(path)) \
        .agg(F.sum("id"), F.count(F.lit(1))).collect()[0]

    after = compact(spark, path)
    assert after < before_files
    assert spark.read.parquet(str(path)) \
        .agg(F.sum("id"), F.count(F.lit(1))).collect()[0] == checksum
    # idempotent: second call is a no-op
    assert compact(spark, path) == after


def test_compact_preserves_partitions(spark, tmp_path):
    path = tmp_path / "ptbl"
    df = spark.range(2000).select(
        (F.col("id") % 2).cast("string").alias("dt"), F.col("id"))
    for _ in range(4):
        df.repartition(5).write.mode("append") \
          .partitionBy("dt").parquet(str(path))
    compact(spark, path)
    assert (path / "dt=0").exists() and (path / "dt=1").exists()
    out = spark.read.parquet(str(path))
    assert out.filter(F.col("dt") == "0").count() == 4000
