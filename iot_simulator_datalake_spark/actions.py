"""Plan-faithful actions shared by bench.py and tools/probe_scale.py.

A bare ``df.count()`` lets Catalyst ELIMINATE unique-key joins whose
output columns nobody consumes, so a timing harness can "measure" a
join-pruned no-op plan (this bit the first semdedup ×100 probe; see
SCALE.md).  Both harnesses must execute the SAME action for bench
timings and replica-probe ratios to describe the same work — keeping
the helper in one place is what guarantees that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def full_mat(df: DataFrame) -> int:
    """Execute the WHOLE plan (a count over every output column, which
    marks each column as consumed) and return the row count."""
    row = df.agg(F.count(F.lit(1)).alias("_n"),
                 *[F.count(c).alias(f"_c{i}")
                   for i, c in enumerate(df.columns)]).collect()[0]
    return row["_n"]
