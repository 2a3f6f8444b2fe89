"""General MERGE INTO as a relational rewrite ([EXT] lake surface).

The reference's CDC path is latest-wins upsert only (README_DBT.md
CDC dedup — see ``operators/scd.py``).  Real lake engines expose the
full MERGE matrix (Delta/Iceberg ``MERGE INTO``): conditional update,
conditional delete, conditional insert, keep-everything-else.  Without
table-format jars the equivalent is a single FULL OUTER JOIN on the
merge key plus per-row action resolution — which is exactly what
Delta's own physical plan lowers to (join target ⋈ source, then write
back touched files).

Scale design: one shuffle per side on the merge key.  Everything
downstream of the join is map-side: action resolution is a CASE
expression, no second pass, no driver state.  The rewrite cost is
O(target + source), the lower bound for a format without file-level
pruning; with the engine's data-skipping manifest (engine/skipping.py)
the target side narrows to files whose key ranges intersect the batch
— the same optimization Delta calls "merge touch set".  (A broadcast
fast path is NOT offered: Spark cannot execute a full-outer join as a
broadcast hash join, so a hint here would be silently ignored; the
real optimization is splitting matched/unmatched paths, which trades
one extra pass over the source for the hint — not worth it before the
skipping-manifest narrowing above.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class AmbiguousMergeSourceError(ValueError):
    """Raised when multiple source rows share one merge key — SQL/Delta
    MERGE rejects this (nondeterministic which row applies); the
    full-outer-join rewrite would instead silently fan out the target
    row, so we surface the same error the standard demands."""


def merge_into(target: DataFrame, source: DataFrame, key: str, *,
               update_set: dict[str, Column],
               update_cond: Column | None = None,
               delete_cond: Column | None = None,
               insert_values: dict[str, Column] | None = None,
               insert_cond: Column | None = None,
               check_unique_source: bool = False) -> DataFrame:
    """Apply MERGE semantics and return the post-merge target relation.

    Clause order follows SQL MERGE: for matched rows ``delete_cond``
    is evaluated first, then ``update_cond`` (None = always), else the
    target row is kept unchanged.  Unmatched source rows insert when
    ``insert_cond`` (None = always) holds and ``insert_values`` is
    given; unmatched target rows always survive.  Column expressions
    may reference ``t.<col>`` / ``s.<col>``.

    PRECONDITION: ``key`` must be unique in ``source`` — duplicate
    source keys would fan out matched target rows through the join
    (where SQL MERGE raises "multiple source rows matched").  Callers
    that cannot prove uniqueness (raw CDC feeds: pre-aggregate with
    latest-wins first, as operators/scd.py does) should pass
    ``check_unique_source=True`` to pay one count-distinct aggregate
    over the source (cheap: the source is the small side) and get
    :class:`AmbiguousMergeSourceError` instead of silent duplicates.

    The result preserves the target schema exactly.
    """
    if check_unique_source:
        dup = (source.groupBy(key).count()
               .filter(F.col("count") > 1).limit(1).collect())
        if dup:
            raise AmbiguousMergeSourceError(
                f"merge key {key!r} is not unique in source "
                f"(e.g. {dup[0][key]!r}); latest-wins pre-aggregate the "
                "source (operators.scd.scd1_current) before merging")
    # Side-existence markers, NOT key null-ness: a target row whose
    # merge key is NULL never equi-matches, and classifying sides by
    # t.key/s.key nullness would leave it in no class — filter() then
    # silently DELETES it, where SQL MERGE must keep unmatched target
    # rows unchanged.  (Symmetrically, a NULL-key source row is
    # NOT MATCHED and may insert.)  The lit(True) markers are NULL on
    # the absent side of the full-outer join, so they classify rows
    # correctly for every key value including NULL.
    t = target.withColumn("_t_exists", F.lit(True)).alias("t")
    s = source.withColumn("_s_exists", F.lit(True)).alias("s")
    joined = t.join(s, F.col(f"t.{key}") == F.col(f"s.{key}"), "full_outer")
    t_ex = F.col("t._t_exists").isNotNull()
    s_ex = F.col("s._s_exists").isNotNull()
    matched = t_ex & s_ex
    t_only = t_ex & ~s_ex
    s_only = s_ex & ~t_ex

    # SQL MERGE treats a NULL-evaluating clause condition as NOT
    # satisfied (WHEN MATCHED AND cond fires only when cond IS TRUE).
    # Coalesce to FALSE so three-valued logic can't leak: un-coalesced,
    # a NULL delete_cond makes `matched & ~del_c` NULL and filter()
    # then DROPS the row — a silent delete of rows MERGE must keep.
    always = F.lit(True)

    def as_bool(c: Column | None, default: Column) -> Column:
        return default if c is None else F.coalesce(c.cast("boolean"),
                                                    F.lit(False))

    del_c = as_bool(delete_cond, F.lit(False))
    upd_c = as_bool(update_cond, always)
    ins_c = as_bool(insert_cond, always)

    keep = t_only | (matched & ~del_c) | (s_only & ins_c &
                                          F.lit(insert_values is not None))
    out_cols = []
    for c in target.columns:
        tcol = F.col(f"t.{c}")
        upd = update_set.get(c, tcol)
        ins = (insert_values or {}).get(c, F.lit(None))
        out_cols.append(
            F.when(matched & ~del_c & upd_c, upd)
             .when(matched & ~del_c & ~upd_c, tcol)
             .when(t_only, tcol)
             .otherwise(ins)                    # s_only insert
             .alias(c))
    return joined.filter(keep).select(*out_cols)
