"""Size-gated join-strategy hints.

Why this exists (SCALE.md doctrine 3): a hard ``F.broadcast(df)`` hint
*overrides* Spark's size check (``spark.sql.autoBroadcastJoinThreshold``)
and forces the relation to be collected to the driver and shipped to every
executor.  That is right for category-/calendar-/sketch-sized relations
(nation, region, a 25-row threshold table) and catastrophically wrong for
scale-factor-proportional ones: at a 100 TB lineitem, ``customer`` is
TB-sized and a forced broadcast OOMs the driver.

``maybe_broadcast`` applies the hint ONLY when Catalyst's own logical-plan
statistics say the relation is small; otherwise it returns the DataFrame
unhinted and lets AQE pick the strategy at runtime from *measured* shuffle
sizes (AQE will still choose broadcast at bench scale, so small-SF plans
are unchanged in practice — the hint is belt-and-braces for when stats are
available and tiny).

The size estimate comes from ``optimizedPlan().stats().sizeInBytes`` —
driver-side plan statistics (for parquet scans: the sum of file sizes,
already known from the listing), NOT a job.  Calling it is O(plan), not
O(data).

Reference parity: the gold fact join (``fact_iot_events.sql:23-24``)
joins the silver fact to dims without any physical-strategy annotation —
strategy choice is the engine's job, which is exactly what deferring to
AQE restores.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Default hint gate.  Deliberately larger than Spark's 10 MB
#: autoBroadcastJoinThreshold (a relation in 10–64 MB is still a safe,
#: profitable broadcast on any real executor) but far below anything that
#: could hurt: a 64 MB cap bounds driver collect + per-executor copy.
#: Overridable via SPARK_GRAFT_BROADCAST_GATE (bytes) — used by
#: SCALE.md's disengage probe to exercise the no-hint/AQE branch at
#: replica scale, and a legitimate ops knob on memory-tight drivers.
DEFAULT_MAX_BYTES = 64 << 20


def _gate_bytes() -> int:
    """Resolve the gate at CALL time (env changes take effect without
    re-import) and tolerate malformed values (fall back to the default
    rather than crashing the package import path)."""
    raw = os.environ.get("SPARK_GRAFT_BROADCAST_GATE")
    if raw is None:
        return DEFAULT_MAX_BYTES
    try:
        return int(raw)
    except ValueError:
        return DEFAULT_MAX_BYTES


def plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's estimated size of ``df`` in bytes, or None if the
    estimate is unavailable (e.g. Spark Connect, or a plan node that
    reports the defaultSizeInBytes sentinel)."""
    try:
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return None
    # Unknown-size plans report conf.defaultSizeInBytes = Long.MaxValue;
    # treat anything absurd as "unknown".
    if size < 0 or size >= (1 << 62):
        return None
    return size


def spread_if_under_split(df: DataFrame) -> DataFrame:
    """Repartition ``df`` to defaultParallelism iff Catalyst's size
    estimate says the scan is under-split — the scale-adaptive spread
    gate for CPU-bound map work over small inputs (optimization
    r11/r12; first built inline in operators/dedup.minhash_lsh_pairs).

    Rationale: small fixtures often arrive as one parquet file = one
    split, serialising per-row CPU work (md5/shingling, cosine folds)
    on one core, while an UNCONDITIONAL repartition(N) would be a
    full-input exchange that AQE never coalesces and that caps map
    parallelism at defaultParallelism — exactly wrong at scale.  The
    gate reads the ANALYZED plan's sizeInBytes (driver metadata, no
    job, no physical planning — the .rdd probe it replaced executed
    upstream AQE stages) and compares against cores ×
    maxPartitionBytes, the same question the scan's split math
    answers: a big input is already parallel, so the spread becomes a
    no-op precisely when it would hurt.  Unknown stats → spread
    (constructed test relations; only matters at test scale)."""
    par = df.sparkSession.sparkContext.defaultParallelism
    try:
        size = int(df._jdf.queryExecution().analyzed().stats()
                   .sizeInBytes())
        mpb = int(df.sparkSession.conf.get(
            "spark.sql.files.maxPartitionBytes", "134217728"))
        under_split = size < par * mpb
    except Exception:
        under_split = True
    return df.repartition(par) if under_split else df


def maybe_broadcast(df: DataFrame, max_bytes: int | None = None) -> DataFrame:
    """Broadcast-hint ``df`` iff plan statistics prove it is small.

    Unknown size → NO hint (fail safe: AQE decides from runtime sizes).
    This is the required form for any join against an sf-proportional
    relation (customer, supplier, orders, …); hard ``F.broadcast`` is
    reserved for relations whose cardinality is bounded by schema
    (nation=25, region=5, calendar, 1-row aggregates).
    """
    if max_bytes is None:
        max_bytes = _gate_bytes()
    size = plan_size_bytes(df)
    if size is not None and size <= max_bytes:
        return F.broadcast(df)
    return df
