"""CLI surface tests (``python -m iot_simulator_datalake_spark``):
docs/lineage print the registry-derived relations without a Spark
session; optimize drives the maintenance + manifest path end-to-end.
"""

from __future__ import annotations

from iot_simulator_datalake_spark.__main__ import main


def test_docs_lists_all_models(capsys):
    assert main(["docs"]) == 0
    out = capsys.readouterr().out
    for model in ("bronze.iot_events", "silver.iot_events",
                  "gold.fact_iot_events", "gold.packed_sequences"):
        assert model in out


def test_lineage_prints_edges(capsys):
    assert main(["lineage"]) == 0
    out = capsys.readouterr().out
    assert "silver.iot_events -> gold.fact_iot_events" in out
    assert "bronze.iot_events -> silver.iot_events" in out


def test_optimize_zorder_and_manifests(spark, tmp_path, capsys):
    from pyspark.sql import functions as F
    path = tmp_path / "t"
    (spark.range(5000)
     .select((F.col("id") % 50).alias("a"),
             ((F.col("id") * 31) % 50).alias("b"))
     .repartition(4).write.mode("overwrite").parquet(str(path)))
    assert main(["optimize", str(path), "--cluster-by", "a", "b",
                 "--stats", "a", "b", "--bloom", "a"]) == 0
    out = capsys.readouterr().out
    assert "z-ordered" in out and "stats manifest" in out \
        and "bloom manifest" in out
    from iot_simulator_datalake_spark.engine.skipping import (
        prune_files_eq, read_stats_manifest)
    m = read_stats_manifest(path)
    assert m["files"] and "bloom" in m
    assert prune_files_eq(path, "a", 7)          # present value kept


def test_cli_runs_sql_project(tmp_path, capsys):
    """`run --project DIR` drives a dbt-SQL project end-to-end, and
    `test --project DIR` attaches + runs its dbt tests."""
    import os
    import pytest
    if not os.path.isdir("/root/reference/models"):
        pytest.skip("reference checkout not present")
    from conftest import write_iot_events
    from iot_simulator_datalake_spark.__main__ import main

    land = tmp_path / "iot_events"
    write_iot_events(land, n_events=800)
    rc = main(["run", "--project", "/root/reference",
               "--landing", str(land),
               "--warehouse", str(tmp_path / "wh"), "--atomic"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "gold.fact_iot_events" in out


def test_docs_manifest(spark, tmp_path):
    from iot_simulator_datalake_spark.engine import Engine
    from iot_simulator_datalake_spark.pipeline import build_registry
    eng = Engine(spark, build_registry(streaming=False),
                 warehouse=tmp_path / "wh")
    man = eng.docs_manifest()
    names = {m["name"] for m in man["models"]}
    assert "gold.fact_iot_events" in names and len(man["models"]) == 5
    silver = next(m for m in man["models"]
                  if m["name"] == "silver.iot_events")
    assert silver["contract"]["value"] == "double"   # enforced contract
    assert silver["depends_on"] == ["bronze.iot_events"]
    import json
    json.dumps(man)   # fully serializable
