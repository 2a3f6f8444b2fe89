"""Engine: materializes the model DAG and runs data-quality checks.

Equivalent of ``dbt run`` + ``dbt test`` (reference:
resources/jobs.yml:30-33 runs exactly those two commands), minus the
Databricks control plane: builders produce lazy DataFrames, Catalyst/AQE
do all optimization (SURVEY §4 — zero custom optimizer rules needed).

Materializations (dbt_project.yml:11-19):

- ``view``            → temp view + in-memory handle (no write)
- ``table``           → parquet overwrite into the warehouse dir, read
                        back (so downstream reads scan columnar storage
                        with pushdown, like a real table)
- ``streaming_table`` → Structured Streaming triggered (availableNow)
                        run with a checkpoint dir → exactly-once
                        incremental append (⇔ DLT streaming table,
                        bronze_iot_events.sql:2,8-9); see
                        streaming/runner.py

Independent models materialize concurrently (thread pool over DAG waves
⇔ dbt ``threads: 8``, profiles.yml:14).  Spark's scheduler interleaves
their jobs.
"""

from __future__ import annotations

import os
import shutil
import time
import uuid
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from pathlib import Path
from typing import TYPE_CHECKING, Any

from .checks import Check, CheckResult
from .model import Model, ModelContext, Registry

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession


def _install_version(vdir: Path, final: Path) -> None:
    """Install a fully-written version dir as ``final`` — concurrent-
    writer AND concurrent-reader safe (VERDICT r2 #3).

    Spark's own ``mode("overwrite")`` deletes the target then writes
    into it, so two simultaneous writers interleave part files into one
    corrupt table — and even staged-write-then-rename breaks concurrent
    READERS, whose resolved file listings dangle when the dir under
    them is replaced (observed: FileNotFound task failures in the
    concurrent-run test).  So ``final`` is a SYMLINK, atomically
    retargeted (symlink + rename(2) over the old link): writers
    serialize to last-committer-wins, and superseded version dirs stay
    on disk so any in-flight reader keeps a consistent snapshot.  The
    engine registers its OWN version dir for same-run downstream reads
    (retarget-immune); fresh readers of the table path resolve the
    link to the newest complete version.  Old versions are reclaimed
    by :func:`vacuum_table_versions` once quiesced, or by
    ``drop_warehouse`` — the local analog of Delta's VACUUM retention.
    For a full commit history + time travel use ``snapshot_keep``
    (the OCC commit log in engine/snapshots.py).

    Migration: if ``final`` is a real directory from an older layout,
    it is renamed into a version dir first (readers of the path itself
    see one brief ENOENT window during this one-time conversion).
    """
    from ..operators.scd import _step  # shared crash-injection seam
    if final.exists() and not final.is_symlink():
        legacy = final.with_name(f"{final.name}.v-legacy-"
                                 f"{uuid.uuid4().hex[:8]}")
        try:
            os.rename(final, legacy)
        except OSError:
            pass                    # another writer already converted it
    _step("install:legacy-converted")
    tmp = final.with_name(f"{final.name}.ln-{uuid.uuid4().hex[:8]}")
    os.symlink(vdir.name, tmp)      # relative: version dirs sit beside
    _step("install:tmp-linked")
    os.replace(tmp, final)          # atomic over an existing symlink
    _step("install:replaced")


def vacuum_table_versions(path: str | Path, keep_current: bool = True
                          ) -> list[str]:
    """Delete superseded ``<table>.v-*`` version dirs (everything not
    targeted by the current symlink).  Call only when no reader may
    still hold the old versions — same contract as Delta VACUUM with
    retention 0."""
    final = Path(path)
    current = os.readlink(final) if final.is_symlink() else None
    dropped = []
    for p in final.parent.glob(f"{final.name}.v-*"):
        if keep_current and p.name == current:
            continue
        shutil.rmtree(p, ignore_errors=True)
        dropped.append(p.name)
    return dropped


class ContractViolation(ValueError):
    """A model's output schema broke its enforced contract."""


def _enforce_contract(m: Model, df: "DataFrame") -> None:
    """dbt `contract: enforced` semantics: the builder's output must
    carry EXACTLY the declared columns with the declared Spark types
    (simpleString form, e.g. 'bigint', 'string', 'timestamp').
    Runs on the lazy schema — no data is scanned."""
    got = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    want = dict(m.contract or {})
    problems = []
    for col, typ in want.items():
        if col not in got:
            problems.append(f"missing column {col!r}")
        elif got[col] != typ:
            problems.append(f"{col}: got {got[col]}, contract says {typ}")
    for col in got:
        if col not in want:
            problems.append(f"undeclared column {col!r}")
    if problems:
        raise ContractViolation(
            f"model {m.qualified_name} breaks its contract: "
            + "; ".join(problems))


@dataclass
class RunResult:
    materialized: list[str] = field(default_factory=list)
    seconds: dict[str, float] = field(default_factory=dict)


class Engine:
    """Holds the session, config vars, registry, checks, and the
    materialized-relation namespace."""

    def __init__(self, spark: "SparkSession", registry: Registry,
                 config: dict[str, Any] | None = None,
                 warehouse: str | Path = "/tmp/iot_lake_warehouse",
                 threads: int = 8,
                 grants: Any | None = None,
                 run_as: str | None = None):
        self.spark = spark
        self.registry = registry
        self.config = dict(config or {})
        self.warehouse = Path(warehouse)
        self.threads = threads  # ⇔ profiles.yml:14
        #: UC-analog access control (engine/grants.py — the reference's
        #: 01-setup-sp-permissions.sql surface): when BOTH a
        #: GrantRegistry and a run-as principal are set, every model
        #: materialization first proves SELECT on each upstream schema
        #: and CREATE TABLE (+ MODIFY for table sinks) on the target
        #: schema, with UC USE CATALOG / USE SCHEMA gating; a missing
        #: grant aborts the run with PermissionError.  The catalog name
        #: comes from config["catalog"] (⇔ databricks.yml's dev_catalog).
        self.grants = grants
        self.run_as = run_as
        self._relations: dict[str, "DataFrame"] = {}
        self.checks: list[Check] = []

    # -- namespace ---------------------------------------------------------

    def table(self, qualified_name: str) -> "DataFrame":
        """Resolve a materialized relation (``layer.name``)."""
        if qualified_name not in self._relations:
            raise KeyError(f"relation {qualified_name} not materialized yet "
                           f"(have: {sorted(self._relations)})")
        return self._relations[qualified_name]

    def register(self, qualified_name: str, df: "DataFrame") -> None:
        """Expose a DataFrame under a qualified name + a temp view
        (dots → ``__`` since Spark temp views are single-level)."""
        self._relations[qualified_name] = df
        df.createOrReplaceTempView(qualified_name.replace(".", "__"))

    def table_path(self, m: Model) -> Path:
        return self.warehouse / (m.schema or m.layer) / m.name

    # -- materialization ---------------------------------------------------

    def _authorize(self, m: Model) -> None:
        """Grant checks for one model (no-op unless grants+run_as are
        configured — see __init__).  Mirrors what Unity Catalog itself
        would demand of the reference's job cluster: SELECT on every
        upstream's schema, CREATE TABLE on the target schema (UC
        requires it for views too), MODIFY for table/streaming writes;
        each check implies the USE CATALOG / USE SCHEMA chain."""
        if self.grants is None or self.run_as is None:
            return
        cat = self.config.get("catalog", "main")
        for dep in m.depends_on:
            self.grants.require(self.run_as, "SELECT", "SCHEMA",
                                f"{cat}.{dep.split('.', 1)[0]}")
        tgt = f"{cat}.{m.schema or m.layer}"
        self.grants.require(self.run_as, "CREATE TABLE", "SCHEMA", tgt)
        if m.materialization in ("table", "streaming_table"):
            self.grants.require(self.run_as, "MODIFY", "SCHEMA", tgt)

    def _materialize(self, m: Model,
                     deferred: list | None = None) -> None:
        self._authorize(m)
        ctx = ModelContext(self.spark, self, m)
        if m.materialization == "streaming_table":
            # Builders of streaming tables return a *streaming* DataFrame;
            # the streaming runner drains it exactly-once into the table
            # path and hands back a batch DataFrame over the result.
            from ..streaming.runner import materialize_streaming_table
            stream_df = m.builder(ctx)
            if m.contract is not None:
                _enforce_contract(m, stream_df)  # lazy schema: no scan
            df = materialize_streaming_table(
                spark=self.spark, stream_df=stream_df,
                path=self.table_path(m),
                checkpoint=self.warehouse / "_checkpoints" / m.qualified_name,
                partition_by=m.partition_by)
        else:
            df = m.builder(ctx)
            if m.contract is not None:
                _enforce_contract(m, df)
            if m.materialization == "table":
                path = self.table_path(m)
                if m.snapshot_keep is not None:
                    # versioned sink: append an immutable version dir +
                    # atomic manifest swap; time travel via
                    # snapshots.read_snapshot[_as_of]
                    from .snapshots import read_snapshot, write_snapshot
                    write_snapshot(df, path,
                                   partition_by=m.partition_by,
                                   keep=m.snapshot_keep)
                    self.register(m.qualified_name,
                                  read_snapshot(self.spark, path))
                    return
                writer = df.write.mode("overwrite")
                if m.partition_by:
                    writer = writer.partitionBy(*m.partition_by)
                if m.bucket_by:
                    # bucketed sink: catalog table (bucket metadata lives
                    # in the catalog); joins/aggs on the bucket cols then
                    # skip the shuffle entirely (co-located join)
                    n, *cols = m.bucket_by
                    db = m.schema or m.layer
                    self.spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
                    self.spark.sql(
                        f"DROP TABLE IF EXISTS {m.qualified_name}")
                    (writer.format("parquet")
                     .bucketBy(int(n), *cols).sortBy(*cols)
                     .option("path", str(path))
                     .saveAsTable(m.qualified_name))
                    df = self.spark.table(m.qualified_name)
                else:
                    # write a private version dir, atomically retarget
                    # the table symlink: concurrent engine.run()s
                    # serialize to complete snapshots and in-flight
                    # readers keep theirs (see _install_version)
                    vdir = path.with_name(
                        f"{path.name}.v-{uuid.uuid4().hex[:8]}")
                    writer.parquet(str(vdir))
                    if deferred is None:
                        _install_version(vdir, path)
                    else:
                        # atomic-publish run: install later, all at once
                        deferred.append((vdir, path))
                    # register OUR version dir, not the symlink: this
                    # run's downstream reads stay consistent even if a
                    # concurrent run retargets the link mid-query
                    df = self.spark.read.parquet(str(vdir))
        self.register(m.qualified_name, df)

    def run(self, select: list[str] | None = None,
            atomic_publish: bool = False) -> RunResult:
        """Materialize the DAG in dependency order, wave-parallel.

        ``atomic_publish=True`` makes the whole run all-or-nothing for
        OUTSIDE readers: every plain-table model writes its version dir
        during the run (downstream models read those dirs directly, so
        the DAG itself is unaffected), but the table symlinks are
        retargeted only AFTER every model has succeeded — a failure
        anywhere leaves all published tables at their pre-run state
        (the staged version dirs are removed).  The publish step is a
        burst of symlink renames: milliseconds, data-size-independent.
        Snapshot-keep models commit through the OCC log as usual (their
        history IS the isolation mechanism); streaming/bucketed sinks
        install eagerly and are documented out of the atomic scope.
        """
        deferred: list | None = [] if atomic_publish else None
        result = RunResult()
        try:
            self._run_waves(select, deferred, result)
        except Exception:
            if deferred:
                for vdir, _ in deferred:
                    shutil.rmtree(vdir, ignore_errors=True)
            raise
        if deferred:
            for vdir, path in deferred:
                _install_version(vdir, path)
        return result

    def _run_waves(self, select, deferred, result: RunResult) -> None:
        for wave in self.registry.levels(select):
            def one(m: Model) -> tuple[str, float]:
                t0 = time.monotonic()
                self._materialize(m, deferred)
                return m.qualified_name, time.monotonic() - t0
            if len(wave) == 1:
                outs = [one(wave[0])]
            else:
                with ThreadPoolExecutor(max_workers=self.threads) as pool:
                    outs = list(pool.map(one, wave))
            for qn, dt in outs:
                result.materialized.append(qn)
                result.seconds[qn] = dt

    def backfill(self, qualified_name: str, where: str) -> "DataFrame":
        """Partition-scoped re-materialization of a partitioned table
        model: recompute only the slice matched by ``where`` (a SQL
        predicate over the model's partition columns) and swap exactly
        the partitions that slice produces — the late-data / bug-fix
        rerun every lake pipeline needs, without recomputing or
        rewriting the rest of the table.

        Uses Spark's dynamic partition-overwrite so untouched
        partitions are left in place byte-for-byte; the predicate is
        pushed into the builder's plan, so at 100 TB the recompute
        reads only the affected input partitions (partition pruning),
        not the history.
        """
        m = self.registry[qualified_name]
        # backfill crosses the same security boundary as run(): it reads
        # every upstream through m.builder and rewrites target
        # partitions, so the run_as principal needs the identical
        # SELECT-upstreams + CREATE/MODIFY-target grants.
        self._authorize(m)
        if m.materialization != "table" or not m.partition_by:
            raise ValueError(
                f"backfill targets partitioned table models; "
                f"{qualified_name} is {m.materialization!r} "
                f"partitioned by {m.partition_by!r}")
        if m.snapshot_keep is not None:
            # a snapshot table's root is a commit log + version dirs,
            # not a partition layout — dynamic overwrite into it would
            # corrupt the history; the snapshot path re-materializes
            # through run() and keeps the old version for time travel
            raise ValueError(
                f"backfill does not support snapshot_keep models "
                f"({qualified_name}): rerun the model instead — the "
                f"OCC snapshot log keeps prior versions")
        ctx = ModelContext(self.spark, self, m)
        df = m.builder(ctx).filter(where)
        path = self.table_path(m)
        # NEVER write through the live path: the current version dir is
        # the immutable snapshot in-flight readers resolved
        # (_install_version's whole guarantee).  Stage a hardlink copy
        # of the current version (metadata-only on a local fs; a
        # server-side copy on object stores), dynamic-overwrite only
        # the matched partitions inside the copy, then atomically
        # retarget the symlink like any other write.
        vdir = path.with_name(f"{path.name}.v-{uuid.uuid4().hex[:8]}")
        if path.exists():
            shutil.copytree(path.resolve(), vdir,
                            copy_function=os.link)
        key = "spark.sql.sources.partitionOverwriteMode"
        prev = self.spark.conf.get(key, "static")
        self.spark.conf.set(key, "dynamic")
        try:
            (df.write.mode("overwrite")
             .partitionBy(*m.partition_by)
             .parquet(str(vdir)))
        finally:
            self.spark.conf.set(key, prev)
        _install_version(vdir, path)
        out = self.spark.read.parquet(str(vdir))
        self.register(m.qualified_name, out)
        return out

    # -- checks ------------------------------------------------------------

    def add_check(self, check: Check) -> Check:
        self.checks.append(check)
        return check

    def test(self, max_sample: int = 5,
             persist: bool = False) -> list[CheckResult]:
        """Run every registered check; pass ⇔ violation query returns 0
        rows (the reference's universal criterion, SURVEY §5.1).

        ``persist=True`` appends one audit row per check to
        ``<warehouse>/_audit/check_results`` (⇔ dbt's test-result
        artifacts), so quality history survives across runs.
        """
        results = [c.run(self, max_sample=max_sample) for c in self.checks]
        if persist and results:
            import time as _time
            audit = self.spark.createDataFrame(
                [(r.name, r.passed, r.violations, _time.time())
                 for r in results],
                "check string, passed boolean, violations long, run_ts double")
            audit.coalesce(1).write.mode("append").parquet(
                str(self.warehouse / "_audit" / "check_results"))
        return results

    # -- docs --------------------------------------------------------------

    def docs_manifest(self) -> dict:
        """``dbt docs generate`` analog: one JSON-serializable manifest
        of the project — models (materialization, schema, deps,
        contract, description), check inventory, and the warehouse
        location.  Pure metadata: no Spark job runs."""
        return {
            "warehouse": str(self.warehouse),
            "models": [{
                "name": m.qualified_name,
                "layer": m.layer,
                "schema": m.schema or m.layer,
                "materialization": m.materialization,
                "depends_on": list(m.depends_on),
                "partition_by": list(m.partition_by),
                "contract": m.contract,
                "description": (m.description or "").strip(),
            } for m in self.registry],
            "checks": [{"name": c.name, "relation": c.relation}
                       for c in self.checks],
        }

    # -- cleanup -----------------------------------------------------------

    def drop_warehouse(self) -> None:
        shutil.rmtree(self.warehouse, ignore_errors=True)
