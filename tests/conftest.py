"""Shared fixtures: one SparkSession per test session, plus the
iot_events dirty-JSON landing fixture (FIXTURES.md §1)."""

from __future__ import annotations

import json
import random
from datetime import datetime, timedelta
from pathlib import Path

import pytest

from iot_simulator_datalake_spark.session import get_spark

SENSORS = [("temperature", "°C"), ("humidity", "%"), ("pressure", "hPa"),
           ("motion", "bool")]
#: dirty quality flags: silver keeps only lower(trim) ∈ {good, suspect}
#: (silver_iot_events.sql:22); ~10% dirty per FIXTURES.md
FLAGS = ["good"] * 5 + ["suspect"] * 3 + ["GOOD", " Good ", "bad", "error",
                                          "SUSPECT  "]


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=8)
    yield s


def write_iot_events(landing: Path, n_events: int = 2000, n_files: int = 4,
                     seed: int = 7, start: datetime | None = None) -> int:
    """Write iot_events JSON files (one object per line) into a landing
    dir; returns the number of rows kept by the silver filter."""
    rng = random.Random(seed)
    start = start or datetime(2024, 1, 1)
    landing.mkdir(parents=True, exist_ok=True)
    kept = 0
    per_file = n_events // n_files
    for fi in range(n_files):
        rows = []
        for i in range(per_file):
            sensor, unit = rng.choice(SENSORS)
            flag = rng.choice(FLAGS)
            if flag.strip().lower() in ("good", "suspect"):
                kept += 1
            ts = start + timedelta(minutes=rng.randint(0, 60 * 24 * 90))
            rows.append({
                "device_id": f"dev-{rng.randint(1, 100):04d}",
                "location_id": f"loc-{rng.randint(1, 10):02d}",
                "timestamp": ts.isoformat(sep=" "),
                "sensor_type": sensor,
                "quality_flag": flag,
                "unit": unit,
                "value": round(rng.uniform(0, 100), 2),
            })
        (landing / f"events_{seed}_{fi:03d}.json").write_text(
            "\n".join(json.dumps(r) for r in rows))
    return kept


@pytest.fixture(scope="session")
def iot_landing(tmp_path_factory) -> tuple[Path, int]:
    landing = tmp_path_factory.mktemp("landing")
    kept = write_iot_events(landing)
    return landing, kept
