"""Semantic metrics layer — dbt-metrics / MetricFlow parity (the
reference is a dbt project; metric definitions are the dbt feature its
README points users at for the gold layer's scorecards).

A :class:`Metric` declares WHAT to measure (aggregation + expression +
optional filter) once; :func:`metrics_frame` compiles any set of
metrics against a relation into ONE aggregate pass at any requested
dimensional grain.  That single-pass property is the scale contract:
ten metrics over a 100 TB fact cost one scan + one two-phase hash
aggregate, not ten queries — filtered metrics compile to conditional
aggregates (``agg(CASE WHEN filter THEN expr END)``), never separate
scans, and time grains reuse the same pass via ``date_trunc``.

Determinism note: a ``sum``/``avg`` metric over doubles inherits
float non-associativity; declare money-like metrics over integer
cents/micros (as the gated query does) or exact decimals — same policy
as queries.dsum.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import TYPE_CHECKING, Sequence

from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import Column, DataFrame

#: supported aggregation verbs → column builders
_AGGS = {
    "sum": F.sum,
    "count": F.count,
    "count_distinct": F.count_distinct,
    "avg": F.avg,
    "min": F.min,
    "max": F.max,
}


@dataclass(frozen=True)
class Metric:
    """One named measure over a base relation.

    ``expr``: SQL expression evaluated per row (column, arithmetic,
    CASE...).  ``agg``: one of sum/count/count_distinct/avg/min/max.
    ``where``: optional SQL predicate — rows failing it contribute
    NULL to this metric only (conditional aggregate), leaving sibling
    metrics untouched.
    """
    name: str
    agg: str
    expr: str = "1"
    where: str | None = None

    def column(self) -> "Column":
        if self.agg not in _AGGS:
            raise ValueError(
                f"metric {self.name}: unknown agg {self.agg!r} "
                f"(have {sorted(_AGGS)})")
        base = F.expr(self.expr)
        if self.where is not None:
            base = F.when(F.expr(self.where), base)  # else NULL: skipped
        return _AGGS[self.agg](base).alias(self.name)


def time_grain(col: str, grain: str) -> "Column":
    """Truncate a timestamp/date column to a calendar grain column."""
    if grain not in ("year", "quarter", "month", "week", "day", "hour"):
        raise ValueError(f"unsupported grain {grain!r}")
    return F.date_trunc(grain, F.col(col)).cast(
        "date" if grain in ("year", "quarter", "month", "week", "day")
        else "timestamp")


def metrics_frame(df: "DataFrame", metrics: Sequence[Metric],
                  dims: Sequence[str] = (),
                  time_col: str | None = None,
                  grain: str = "month") -> "DataFrame":
    """Evaluate ``metrics`` grouped by ``dims`` (+ optional time grain)
    in a single aggregate pass."""
    keys: list = [F.col(d) for d in dims]
    if time_col is not None:
        keys.append(time_grain(time_col, grain).alias(f"{grain}_start"))
    cols = [m.column() for m in metrics]
    if keys:
        return df.groupBy(*keys).agg(*cols)
    return df.agg(*cols)
