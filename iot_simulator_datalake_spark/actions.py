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
    marks each column as consumed) and return the row count.

    Columns are referenced BY INDEX, not by name: rows-only queries may
    legally repeat an output name (AMBIGUOUS_REFERENCE under by-name
    counting) or contain dots (parsed as struct access), and either
    would kill the whole probe/bench sweep mid-run."""
    row = df.agg(F.count(F.lit(1)).alias("_n"),
                 *[F.count(df[i]).alias(f"_c{i}")
                   for i in range(len(df.columns))]).collect()[0]
    return row["_n"]
