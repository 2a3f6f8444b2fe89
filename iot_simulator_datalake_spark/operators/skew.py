"""Skew mitigation for hot keys ([EXT] scale mandate; SURVEY §6
"Skewed keys → salting or AQE skew-join").

AQE's skew-join splitting (enabled in session.RUNTIME_CONFS) handles
most cases at runtime; these explicit operators cover the two shapes
AQE cannot fix:

- :func:`salted_agg` — a single hot group overwhelming one reducer in
  a high-cardinality aggregate.  Two-phase: aggregate on (key, salt)
  partials first (hot key spreads over ``salts`` reducers), then merge
  partials by key.  Works for any associative metric set.
- :func:`salted_join` — a hot key on the fact side of a fact⋈dim join
  where the dim is too big to broadcast.  Fact rows get a random salt
  in [0, salts); the dim side replicates each row ``salts`` times; the
  join key becomes (key, salt), spreading each hot key over ``salts``
  tasks at the cost of a ``salts``× dim inflation (dim ≪ fact, so this
  is the cheap side).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(df: DataFrame, salts: int) -> Column:
    """Deterministic per-row salt: md5 over every column of the row.

    NOT ``F.rand()``: an unseeded random shuffle KEY is recompute-
    unsafe — when a lost executor's map tasks re-run after reducers
    already fetched some outputs, re-drawn salts route rows to
    different reduce partitions, double-counting or dropping them.
    md5-of-row is stable across retries/partitionings (the repo-wide
    rand() substitute — packing.hash_bucket doctrine).  Byte-identical
    duplicate rows share a salt, so a hot key made of *identical* rows
    spreads less; hot keys in practice differ in payload columns, and
    correctness never depends on the spread.
    """
    from .packing import hash_bucket
    return hash_bucket(
        F.concat_ws("\x1f", *[F.col(c).cast("string")
                               for c in df.columns]),
        seed="skew-salt", mod=salts).cast("int")


def salted_agg(df: DataFrame, keys: Sequence[str],
               partials: dict[str, Column],
               combines: dict[str, Column],
               salts: int = 16) -> DataFrame:
    """Two-phase salted aggregation.

    ``partials``: metric name → aggregate over raw rows.
    ``combines``: metric name → aggregate over the partial column
    (e.g. ``{"n": F.count(lit(1))}`` then ``{"n": F.sum(col("n"))}``).
    """
    stage1 = (df.withColumn("_salt", _salt(df, salts))
              .groupBy(*keys, "_salt")
              .agg(*[c.alias(n) for n, c in partials.items()]))
    return (stage1.groupBy(*keys)
            .agg(*[c.alias(n) for n, c in combines.items()]))


def salted_join(fact: DataFrame, dim: DataFrame, key: str,
                how: str = "inner", salts: int = 8) -> DataFrame:
    """Skew-resistant fact⋈dim equi-join via key salting.

    Only ``inner`` and ``left`` (fact-preserving) joins are supported:
    the dim side is replicated ``salts``× before the join, so any
    dim-preserving ``how`` (right/full/left_semi from the dim's view)
    would emit up to ``salts`` copies of each unmatched dim replica —
    structurally wrong output, not a perf issue.  For those shapes use
    a plain join and let AQE's skew-join splitting handle the hot keys.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'|'left' (fact-preserving)"
            f"; got {how!r} — dim-preserving joins would duplicate "
            f"unmatched dim rows once per salt")
    salted_fact = fact.withColumn("_salt", _salt(fact, salts))
    exploded_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salts)])))
    return (salted_fact.join(exploded_dim, on=[key, "_salt"], how=how)
            .drop("_salt"))
