"""As-of (most-recent-match) join — the range-join member of the [DOC]
J4 family (alerts vs. time-versioned thresholds, README_DBT.md:169,199).

Spark has no native as-of join; the composition below is the standard
union-window trick, which beats the naive theta join (t_right <= t_left
range join → O(n·m) broadcast-nested-loop) by turning it into one sort
within key partitions:

    union(left-tagged, right-tagged)
      → window last_value(right-row STRUCT) ignoring nulls
        over (key ORDER BY ts, side)
      → keep left rows

One shuffle on the join key, no row explosion — survives arbitrarily
long right-side histories, which the bucketize-then-filter alternative
does not.

The right payload is carried as ONE struct, not per-column fills: with
independent ``last(col, ignorenulls)`` fills, a right row whose payload
column is legitimately NULL would be skipped for that column only, and
the output would mix columns from DIFFERENT right rows (a stale value
where the true as-of row holds NULL).  The struct is non-null exactly
when the row is a right row, so the fill picks whole rows and NULLs
inside the as-of row survive intact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str, ts: str,
              payload: list[str] | None = None,
              direction: str = "backward") -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` (direction='backward'; 'forward' attaches
    the earliest right row with ``right.ts >= left.ts``).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    payload = payload or [c for c in right.columns if c not in (on, ts)]

    r_struct_type = ("struct<" + ",".join(
        f"{f.name}:{f.dataType.simpleString()}"
        for f in right.schema.fields if f.name in payload) + ">")
    l_tag = left.select(
        F.col(on), F.col(ts), F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(r_struct_type).alias("_r"))
    r_tag = right.select(
        F.col(on), F.col(ts), F.lit(0).alias("_side"),
        F.lit(None).cast(
            "struct<" + ",".join(
                f"{f.name}:{f.dataType.simpleString()}"
                for f in left.schema.fields) + ">").alias("_l"),
        F.struct(*[F.col(c) for c in payload]).alias("_r"))

    unioned = l_tag.unionByName(r_tag)
    if direction == "backward":
        # right rows (side=0) sort before left rows at equal ts → a
        # threshold taking effect at t applies to an event at t.
        w = (W.partitionBy(on).orderBy(F.col(ts).asc(), F.col("_side").asc())
             .rowsBetween(W.unboundedPreceding, 0))
    else:
        w = (W.partitionBy(on).orderBy(F.col(ts).desc(), F.col("_side").asc())
             .rowsBetween(W.unboundedPreceding, 0))

    # ONE ignorenulls fill over the whole right-row struct (module
    # docstring: per-column fills would mix rows when a payload value
    # is legitimately NULL in the as-of row)
    filled = unioned.select(
        "*", F.last(F.col("_r"), ignorenulls=True).over(w).alias("_m"))
    return (filled.filter(F.col("_side") == 1)
            .select("_l.*", *[F.col(f"_m.{c}").alias(f"right_{c}")
                              for c in payload]))
