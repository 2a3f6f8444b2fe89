"""The engine itself inside the correctness gate.

``engine_pipeline_fact`` exports the driver's events table as a raw
JSON landing directory (the reference's ingestion shape), runs the REAL
five-model medallion DAG — bronze JSON ingest → silver
normalize/filter contract → gold star schema — through the Engine's
batch materialization path, and returns the gold fact.  The DuckDB
oracle replicates the full pipeline semantics in one SQL statement, so
the driver's hash compare certifies the engine's DAG execution,
materializations, and the ported model logic end to end — not just a
standalone query expression.
"""

from __future__ import annotations

import tempfile
from pathlib import Path
from typing import TYPE_CHECKING

from pyspark.sql import functions as F

from .engine import Engine
from .pipeline import build_registry
from .queries import load, q

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession

#: events → raw iot_events mapping (deterministic, dirty on purpose:
#: event_id%5==2 rows carry an invalid flag that silver must drop, and
#: the kept flags arrive mixed-case/padded to exercise normalization —
#: FIXTURES.md §1's dirty-data contract)
_FLAG = (("0", "' GOOD '"), ("1", "'suspect'"), ("2", "'bad'"),
         ("3", "'Suspect'"), ("4", "'good'"))


_PIPELINE_ORACLE = """
WITH silver AS (
  SELECT 'dev-' || user_id AS device_id,
         'loc-' || (user_id % 10) AS location_id,
         ts AS timestamp,
         event_type AS sensor_type,
         CASE (event_id % 5) WHEN 0 THEN 'good' WHEN 1 THEN 'suspect'
              WHEN 3 THEN 'suspect' WHEN 4 THEN 'good' END AS quality_flag,
         value
  FROM events
  WHERE (event_id % 5) <> 2
)
SELECT location_id, sensor_type, quality_flag,
       EXTRACT(year FROM timestamp)::INT AS year,
       EXTRACT(month FROM timestamp)::INT AS month,
       CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) / COUNT(value)
         AS avg_value
FROM silver
GROUP BY 1, 2, 3, 4, 5
"""


def _export_landing(spark: "SparkSession", sf_dir: str) -> Path:
    e = load(spark, sf_dir, "events")
    flag = F.expr("CASE (event_id % 5) " + " ".join(
        f"WHEN {k} THEN {v}" for k, v in _FLAG) + " END")
    raw = e.select(
        F.concat(F.lit("dev-"), F.col("user_id")).alias("device_id"),
        F.concat(F.lit("loc-"), F.col("user_id") % 10).alias("location_id"),
        # µs-precision string; silver casts it back losslessly (UTC)
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("timestamp"),
        F.col("event_type").alias("sensor_type"),
        flag.alias("quality_flag"),
        F.lit("unit").alias("unit"),
        F.col("value"))
    workdir = Path(tempfile.mkdtemp(prefix="engine_pipeline_"))
    raw.write.mode("overwrite").json(str(workdir / "landing"))
    return workdir


@q("engine_pipeline_fact", ("O1", "O5", "S2", "P2", "P3", "P5", "A1",
                            "A2", "A3", "J1", "J2"),
   oracle=_PIPELINE_ORACLE)
def engine_pipeline_fact(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Run the ported medallion pipeline end to end on a JSON export of
    the events table; returns gold.fact_iot_events."""
    workdir = _export_landing(spark, sf_dir)
    eng = Engine(spark, build_registry(streaming=False),
                 config={"iot_events_path": str(workdir / "landing")},
                 warehouse=workdir / "wh")
    eng.run()
    return eng.table("gold.fact_iot_events")


@q("engine_pipeline_fact_streaming", ("O1", "S1", "S3", "S5", "ST1",
                                      "ST2", "ST3", "A1", "J1", "J2"),
   oracle=_PIPELINE_ORACLE)
def engine_pipeline_fact_streaming(spark: "SparkSession",
                                   sf_dir: str) -> "DataFrame":
    """The same pipeline through the STREAMING materialization path:
    bronze and silver run as checkpointed availableNow streaming tables
    (exactly-once file discovery + table-to-table incremental read),
    gold in batch — the reference's actual execution mode
    (README_DBT.md:213).  Must produce the identical fact table."""
    workdir = _export_landing(spark, sf_dir)
    eng = Engine(spark, build_registry(streaming=True),
                 config={"iot_events_path": str(workdir / "landing"),
                         "warehouse": str(workdir / "wh"),
                         "schema_store": str(workdir / "schema.json")},
                 warehouse=workdir / "wh")
    eng.run()
    return eng.table("gold.fact_iot_events")
