"""Table maintenance: small-file compaction — the OSS analog of the
DLT-managed ``OPTIMIZE`` the reference relies on (README_DBT.md:103-104,
227 "Automatic ... VACUUM, OPTIMIZE").

Streaming sinks append one file per micro-batch per partition; at
100 TB that degrades scans (file-listing cost, tiny row groups, no
row-group pruning).  Compaction rewrites a table directory to
size-targeted files.  It is the one maintenance task a triggered-mode
lakehouse must schedule; VACUUM is a no-op here because the atomic
directory swap leaves no orphan versions behind.
"""

from __future__ import annotations

import shutil
from pathlib import Path
from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import SparkSession

TARGET_FILE_BYTES = 128 * 1024 * 1024   # the standard lake target


def table_file_stats(path: str | Path) -> tuple[int, int]:
    """(n_data_files, total_bytes) for a parquet table directory."""
    files = [p for p in Path(path).rglob("*.parquet") if p.is_file()]
    return len(files), sum(p.stat().st_size for p in files)


def compact(spark: "SparkSession", path: str | Path,
            target_file_bytes: int = TARGET_FILE_BYTES) -> int:
    """Rewrite a parquet table dir to ⌈bytes/target⌉ files; returns the
    new file count.  Uses coalesce (no shuffle) since compaction only
    merges — it never needs to redistribute rows.  Partitioned tables
    compact per-partition automatically (coalesce preserves the
    partition columns through the rewrite's partitionBy discovery)."""
    src = Path(path)
    n_files, total = table_file_stats(src)
    n_target = max(1, -(-total // target_file_bytes))
    if n_files <= n_target:
        return n_files
    df = spark.read.parquet(str(src))
    _atomic_rewrite(src, df.coalesce(n_target))
    return table_file_stats(src)[0]


def cluster(spark: "SparkSession", path: str | Path, cols: list[str],
            target_file_bytes: int = TARGET_FILE_BYTES) -> int:
    """Range-cluster a parquet table on ``cols`` (the OSS analog of
    ``OPTIMIZE ... ZORDER BY`` the reference's DLT tier manages —
    README_DBT.md:103-104,227): rows are range-partitioned then sorted
    within files, so every file's parquet footer carries a NARROW,
    pairwise-disjoint min/max range for the leading cluster column.

    Scans that filter on the cluster key then skip whole files /
    row-groups via footer stats — at 100 TB this is the difference
    between touching ~1/n_files of the data and touching all of it.
    Lexicographic multi-column clustering (not a space-filling curve):
    right for the dominant key + tiebreak pattern (e.g. device, ts);
    a bit-interleaved Z-curve variant would trade leading-key locality
    for balanced multi-key skipping.  Returns the new file count.

    The range partitioner samples key quantiles, so output files are
    size-balanced even under heavy key skew — a hash partitioner
    would put one hot key's whole mass in one file.
    """
    src = Path(path)
    _, total = table_file_stats(src)
    n_target = max(1, -(-total // target_file_bytes))
    df = spark.read.parquet(str(src))
    clustered = (df.repartitionByRange(n_target, *cols)
                 .sortWithinPartitions(*cols))
    _atomic_rewrite(src, clustered)
    return table_file_stats(src)[0]


def _atomic_rewrite(src: Path, df) -> None:
    """Rewrite ``src`` from ``df`` with an atomic directory swap,
    preserving hive-style partition columns."""
    part_cols = sorted({seg.split("=", 1)[0]
                        for p in src.rglob("*.parquet")
                        for seg in p.relative_to(src).parts[:-1]
                        if "=" in seg})
    tmp = src.with_suffix(".compacting")
    shutil.rmtree(tmp, ignore_errors=True)
    writer = df.write.mode("overwrite")
    if part_cols:
        writer = writer.partitionBy(*part_cols)
    writer.parquet(str(tmp))
    old = src.with_suffix(".precompact")
    shutil.rmtree(old, ignore_errors=True)
    src.rename(old)
    tmp.rename(src)
    shutil.rmtree(old, ignore_errors=True)
