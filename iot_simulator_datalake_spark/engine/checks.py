"""Data-quality check framework.

Re-creates the reference's two test mechanisms (SURVEY §5.1) plus the
README-documented expectation policies:

- generic tests: ``not_null``, ``unique``, ``accepted_values`` declared
  per column in model yml (iot_events_models.yml:8-32,
  _gold_core_models.yml:7-22) — compiled here to DataFrame builders;
- singular tests: an arbitrary query whose non-empty result = failure
  (tests/pos_sensor_values.sql:1-6);
- expectations with warn/drop/fail actions (README_DBT.md:236-239 —
  ``CONSTRAINT ... EXPECT (...) [ON VIOLATION DROP ROW]``), applied
  inline during a model build via :func:`expect`.

Pass criterion everywhere: the violation query returns 0 rows.
At scale the count is bounded with ``limit(n+1)`` so a check never
scans more than it must once violations exist; the violation DataFrame
itself is lazy and fully pushdown-optimizable.
"""

from __future__ import annotations

import enum
from collections.abc import Callable, Sequence
from dataclasses import dataclass
from typing import TYPE_CHECKING, Any

from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame
    from .runner import Engine


class OnViolation(enum.Enum):
    """Expectation policy (README_DBT.md:236-239)."""
    WARN = "warn"    # keep rows, record metric
    DROP = "drop"    # drop violating rows, record metric
    FAIL = "fail"    # raise on first violating row


@dataclass
class CheckResult:
    name: str
    passed: bool
    violations: int          # capped at sample cap + 1 for scale safety
    sample: list[dict]


@dataclass
class Check:
    """A named violation query over a materialized relation."""
    name: str
    relation: str            # qualified model name the check targets
    builder: Callable[["DataFrame"], "DataFrame"]

    def violations(self, engine: "Engine") -> "DataFrame":
        return self.builder(engine.table(self.relation))

    def run(self, engine: "Engine", max_sample: int = 5) -> CheckResult:
        rows = self.violations(engine).limit(max_sample + 1).collect()
        return CheckResult(
            name=self.name, passed=not rows, violations=len(rows),
            sample=[r.asDict(recursive=True) for r in rows[:max_sample]])


# -- generic tests (⇔ dbt schema tests) -----------------------------------

def not_null(relation: str, column: str) -> Check:
    """iot_events_models.yml:9-27 — violation = rows with NULL column."""
    return Check(
        name=f"not_null__{relation}__{column}", relation=relation,
        builder=lambda df: df.filter(F.col(column).isNull()))


def unique(relation: str, column: str) -> Check:
    """_gold_core_models.yml:9-22 — violation = key values occurring >1×
    (two-phase hash aggregate; map-side combine keeps it scalable)."""
    # aggregate under an unambiguous alias: groupBy(col).count() on a
    # column itself NAMED "count" yields two "count" columns and the
    # filter raises AMBIGUOUS_REFERENCE instead of evaluating
    return Check(
        name=f"unique__{relation}__{column}", relation=relation,
        builder=lambda df: (df.groupBy(column)
                            .agg(F.count(F.lit(1)).alias("__n"))
                            .filter(F.col("__n") > 1)))


def accepted_values(relation: str, column: str,
                    values: Sequence[Any]) -> Check:
    """iot_events_models.yml:17-32 — violation = non-null values ∉ list."""
    vals = list(values)
    return Check(
        name=f"accepted_values__{relation}__{column}", relation=relation,
        builder=lambda df: df.filter(
            (~F.col(column).isin(vals)) & F.col(column).isNotNull()))


def relationship(relation: str, column: str, to_relation: str,
                 to_column: str) -> Check:
    """Referential integrity (J3, README_DBT.md:247): child keys with no
    parent — a left-anti join, size-gate broadcast when the parent side
    is provably a dim (hints.maybe_broadcast; a hard F.broadcast here
    would force a scale-factor-proportional parent's distinct key set
    through the driver — the exact failure the hints doctrine bans)."""
    def build(df: "DataFrame") -> "DataFrame":
        raise RuntimeError("relationship checks need engine context")
    chk = Check(name=f"relationship__{relation}__{column}__{to_relation}",
                relation=relation, builder=build)

    def violations(engine: "Engine") -> "DataFrame":
        from ..operators.hints import maybe_broadcast
        child = engine.table(relation)
        parent = engine.table(to_relation).select(
            F.col(to_column).alias(column)).distinct()
        return child.filter(F.col(column).isNotNull()).join(
            maybe_broadcast(parent), on=column, how="left_anti")

    chk.violations = violations  # type: ignore[method-assign]
    return chk


def singular(name: str, relation: str,
             builder: Callable[["DataFrame"], "DataFrame"]) -> Check:
    """tests/pos_sensor_values.sql:1-6 — arbitrary violation query."""
    return Check(name=name, relation=relation, builder=builder)


def freshness(relation: str, ts_column: str, max_lag_seconds: int,
              now: Callable[[], Any] | None = None) -> Check:
    """``dbt source freshness`` analog: fail when the newest row in
    ``relation`` is older than ``max_lag_seconds``.

    The violation relation is at most ONE row (the global max — an
    aggregate that pushes down to parquet footer stats on plain scans),
    so the check costs a metadata-sized job however large the table;
    ``now`` is injectable for tests and for replaying historical runs.
    """
    def build(df: "DataFrame") -> "DataFrame":
        import datetime as _dt
        current = now() if now is not None else \
            _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)
        return (df.agg(F.max(ts_column).alias("latest"))
                .filter(F.col("latest").isNull() |
                        (F.col("latest") <
                         F.lit(current) - F.expr(
                             f"INTERVAL {max_lag_seconds} SECONDS"))))
    return Check(name=f"freshness__{relation}__{ts_column}",
                 relation=relation, builder=build)


# -- inline expectations (P9) ---------------------------------------------

def expect(df: "DataFrame", name: str, condition,
           on_violation: OnViolation = OnViolation.WARN,
           metrics: dict[str, int] | None = None) -> "DataFrame":
    """Inline quality gate during a model build (README_DBT.md:236-239).

    WARN: pass-through (metric recorded if a dict is supplied).
    DROP: returns only conforming rows.
    FAIL: raises if any row violates.

    Metric counting is an action; at 100 TB you'd route it through a
    streaming observation (``df.observe``) instead of a count — we use
    ``observe`` when available so no extra scan is triggered.
    """
    cond = condition if not isinstance(condition, str) else F.expr(condition)
    if metrics is not None:
        n_bad = df.filter(~cond).count()
        metrics[name] = n_bad
        if n_bad and on_violation is OnViolation.FAIL:
            raise ValueError(f"expectation {name}: {n_bad} violating rows")
    elif on_violation is OnViolation.FAIL:
        bad = df.filter(~cond).limit(1).collect()
        if bad:
            raise ValueError(f"expectation {name}: violation {bad[0]}")
    if on_violation is OnViolation.DROP:
        return df.filter(cond)
    return df


def expect_observed(df: "DataFrame", name: str, condition,
                    on_violation: OnViolation = OnViolation.WARN):
    """Scan-free expectation metrics via ``df.observe``: returns
    ``(df, observation)`` where the violation count rides along with
    the caller's OWN action instead of triggering a second scan —
    the right shape at 100 TB, and the only shape that works inside a
    streaming query (DLT expectations report metrics the same way).

    ``observation.get["n_violations"]`` is available after the caller
    executes an action on the returned DataFrame (batch), or via the
    streaming progress listener's observedMetrics (streams).
    """
    from pyspark.sql import Observation
    if on_violation is OnViolation.FAIL:
        # a scan-free observation cannot abort the query before rows
        # flow — silently downgrading FAIL to WARN would drop the
        # enforcement the caller explicitly asked for
        raise ValueError(
            "expect_observed cannot enforce FAIL (metrics ride the "
            "caller's action; rows are not gated) — use expect() for "
            "FAIL semantics")
    cond = condition if not isinstance(condition, str) else F.expr(condition)
    obs = Observation(name)
    observed = df.observe(
        obs, F.sum(F.when(~cond, 1).otherwise(0)).alias("n_violations"),
        F.count(F.lit(1)).alias("n_rows"))
    if on_violation is OnViolation.DROP:
        observed = observed.filter(cond)
    return observed, obs


def expect_or_quarantine(df: "DataFrame", name: str, condition
                         ) -> tuple["DataFrame", "DataFrame"]:
    """Split a relation into (conforming, quarantined) in ONE logical
    pass — the DLT quarantine pattern: instead of silently dropping
    violating rows (DROP) or aborting the pipeline (FAIL), route them
    to a reject relation carrying the failed expectation's name, so
    data engineers can triage bad records without blocking the good
    ones (the standard medallion "rescued data" workflow).

    Both returned frames derive from the same scan lineage; writing
    both materializes the source once under Spark's scan reuse (or
    twice without caching — still O(input), never O(input²)).  The
    quarantine frame appends ``_failed_expectation`` and
    ``_quarantined_at`` audit columns.
    """
    cond = condition if not isinstance(condition, str) else F.expr(condition)
    good = df.filter(cond)
    bad = (df.filter(~cond | cond.isNull())
           .withColumn("_failed_expectation", F.lit(name))
           .withColumn("_quarantined_at", F.current_timestamp()))
    return good, bad
