"""Snapshot-versioned tables + time travel — the OSS analog of Delta
table versioning the reference gets from its Databricks tier
(README_DBT.md:103-104,227 "Automatic ... table history / VACUUM").

A snapshotted table directory looks like::

    <table>/
      _MANIFEST.json          {"current": 2, "versions": {"0": {...}, ...}}
      v=00000000/*.parquet
      v=00000001/*.parquet
      v=00000002/*.parquet

Writers append a NEW immutable version dir, then atomically swap the
manifest (write-to-temp + ``os.replace``) — readers of any version
never observe a partial write, because a version dir is only reachable
once the manifest names it.  That is the same commit protocol as a
Delta/Iceberg log, reduced to one JSON file: fine for a single-writer
engine (our DAG materializes each table from exactly one task), not
for concurrent multi-writer commits (which need a log with CAS —
out of scope, as it is for the single-node reference too).

Scale notes: version dirs are plain parquet — all scan pushdown /
pruning applies; ``vacuum`` bounds storage to the last N versions;
nothing here is per-row work, so snapshot overhead is one directory
rename + one small JSON write per materialization regardless of data
size.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from pathlib import Path
from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession

MANIFEST = "_MANIFEST.json"


def _manifest_path(table: Path) -> Path:
    return table / MANIFEST


def read_manifest(table: str | Path) -> dict:
    p = _manifest_path(Path(table))
    if not p.exists():
        return {"current": None, "versions": {}}
    return json.loads(p.read_text())


def _write_manifest(table: Path, manifest: dict) -> None:
    tmp = table / (MANIFEST + ".tmp")
    tmp.write_text(json.dumps(manifest, indent=1, sort_keys=True))
    os.replace(tmp, _manifest_path(table))   # atomic on POSIX


def _version_dir(table: Path, version: int) -> Path:
    return table / f"v={version:08d}"


def write_snapshot(df: "DataFrame", table: str | Path, *,
                   partition_by: tuple[str, ...] = (),
                   keep: int | None = None) -> int:
    """Commit ``df`` as the next version of ``table``; returns the new
    version number.  ``keep`` (≥1) vacuums all but the newest N
    versions after the commit."""
    table = Path(table)
    table.mkdir(parents=True, exist_ok=True)
    manifest = read_manifest(table)
    version = (manifest["current"] + 1
               if manifest["current"] is not None else 0)
    vdir = _version_dir(table, version)
    shutil.rmtree(vdir, ignore_errors=True)  # crashed prior attempt
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(str(vdir))
    manifest["versions"][str(version)] = {
        "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "unix_ts": time.time(),
    }
    manifest["current"] = version
    _write_manifest(table, manifest)
    if keep is not None:
        vacuum(table, keep=keep)
    return version


def read_snapshot(spark: "SparkSession", table: str | Path,
                  version: int | None = None) -> "DataFrame":
    """Read a table version (default: current).  Negative versions
    index back from current (-1 = previous)."""
    table = Path(table)
    manifest = read_manifest(table)
    if manifest["current"] is None:
        raise FileNotFoundError(f"no snapshots at {table}")
    if version is None:
        version = manifest["current"]
    elif version < 0:
        version = manifest["current"] + version
    if str(version) not in manifest["versions"]:
        raise KeyError(
            f"version {version} not in {sorted(manifest['versions'])} "
            f"(vacuumed or never written)")
    return spark.read.parquet(str(_version_dir(table, version)))


def read_snapshot_as_of(spark: "SparkSession", table: str | Path,
                        unix_ts: float) -> "DataFrame":
    """Time travel: the newest version committed at or before
    ``unix_ts`` (⇔ ``TIMESTAMP AS OF``)."""
    manifest = read_manifest(Path(table))
    eligible = [int(v) for v, meta in manifest["versions"].items()
                if meta["unix_ts"] <= unix_ts]
    if not eligible:
        raise KeyError(f"no version at or before {unix_ts}")
    return read_snapshot(spark, table, max(eligible))


def versions(table: str | Path) -> list[int]:
    return sorted(int(v) for v in read_manifest(Path(table))["versions"])


def vacuum(table: str | Path, keep: int = 2) -> list[int]:
    """Drop all but the newest ``keep`` versions (data + manifest
    entry); returns the dropped version numbers.  The manifest is
    updated FIRST so a reader never resolves a version whose files are
    mid-delete."""
    table = Path(table)
    manifest = read_manifest(table)
    vs = sorted(int(v) for v in manifest["versions"])
    drop = vs[:-keep] if keep > 0 else []
    if not drop:
        return []
    for v in drop:
        del manifest["versions"][str(v)]
    _write_manifest(table, manifest)
    for v in drop:
        shutil.rmtree(_version_dir(table, v), ignore_errors=True)
    return drop


def snapshot_diff(spark: "SparkSession", table: str | Path,
                  v_from: int, v_to: int,
                  keys: tuple[str, ...] = ()) -> "DataFrame":
    """Row-level changes between two versions — the OSS analog of the
    Delta Change Data Feed the reference's platform tier provides
    (README_DBT.md's CDC/SCD pipelines consume exactly this shape).

    Without ``keys``: multiset diff via ``exceptAll`` both ways —
    rows only in ``v_to`` are ``insert``, rows only in ``v_from`` are
    ``delete`` (an updated row appears as one of each).  With
    ``keys``: the insert/delete pairs sharing a key collapse into
    ``update_preimage`` / ``update_postimage``, matching the CDF
    ``_change_type`` vocabulary.

    Scale: exceptAll is one hash-partitioned shuffle per side on the
    full row; with keys the classification adds a shuffle on the key
    columns only over the CHANGED rows (usually ≪ table size).  For
    tables with a stable primary key, prefer passing ``keys`` — the
    changed-row join is what downstream MERGE consumers need anyway.
    """
    from pyspark.sql import functions as F

    old = read_snapshot(spark, table, v_from)
    new = read_snapshot(spark, table, v_to)
    inserted = new.exceptAll(old).withColumn("_change_type",
                                             F.lit("insert"))
    deleted = old.exceptAll(new).withColumn("_change_type",
                                            F.lit("delete"))
    changes = inserted.unionByName(deleted)
    if not keys:
        return changes
    k = list(keys)
    both = (changes.groupBy(*k)
            .agg(F.countDistinct("_change_type").alias("_n"))
            .where(F.col("_n") == 2).drop("_n"))
    return (changes
            .join(both.select(*k, F.lit(True).alias("_upd")), k, "left")
            .withColumn(
                "_change_type",
                F.when(F.col("_upd").isNull(), F.col("_change_type"))
                .when(F.col("_change_type") == "delete",
                      F.lit("update_preimage"))
                .otherwise(F.lit("update_postimage")))
            .drop("_upd"))
