"""General MERGE INTO as a relational rewrite ([EXT] lake surface).

The reference's CDC path is latest-wins upsert only (README_DBT.md
CDC dedup — see ``operators/scd.py``).  Real lake engines expose the
full MERGE matrix (Delta/Iceberg ``MERGE INTO``): conditional update,
conditional delete, conditional insert, keep-everything-else.  Without
table-format jars the equivalent is a single FULL OUTER JOIN on the
merge key plus per-row action resolution — which is exactly what
Delta's own physical plan lowers to (join target ⋈ source, then write
back touched files).

Scale design: one shuffle per side on the merge key (or broadcast when
the source batch is small — the common CDC case; pass
``broadcast_source=True``).  Everything downstream of the join is
map-side: action resolution is a CASE expression, no second pass, no
driver state.  The rewrite cost is O(target + source), the lower bound
for a format without file-level pruning; with the engine's data-
skipping manifest (engine/skipping.py) the target side narrows to
files whose key ranges intersect the batch — the same optimization
Delta calls "merge touch set".
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    pass


def merge_into(target: DataFrame, source: DataFrame, key: str, *,
               update_set: dict[str, Column],
               update_cond: Column | None = None,
               delete_cond: Column | None = None,
               insert_values: dict[str, Column] | None = None,
               insert_cond: Column | None = None,
               broadcast_source: bool = False) -> DataFrame:
    """Apply MERGE semantics and return the post-merge target relation.

    Clause order follows SQL MERGE: for matched rows ``delete_cond``
    is evaluated first, then ``update_cond`` (None = always), else the
    target row is kept unchanged.  Unmatched source rows insert when
    ``insert_cond`` (None = always) holds and ``insert_values`` is
    given; unmatched target rows always survive.  Column expressions
    may reference ``t.<col>`` / ``s.<col>``.

    The result preserves the target schema exactly.
    """
    t = target.alias("t")
    s = source.alias("s")
    if broadcast_source:
        s = F.broadcast(s)
    joined = t.join(s, F.col(f"t.{key}") == F.col(f"s.{key}"), "full_outer")
    matched = F.col(f"t.{key}").isNotNull() & F.col(f"s.{key}").isNotNull()
    t_only = F.col(f"s.{key}").isNull() & F.col(f"t.{key}").isNotNull()
    s_only = F.col(f"t.{key}").isNull() & F.col(f"s.{key}").isNotNull()

    always = F.lit(True)
    del_c = delete_cond if delete_cond is not None else F.lit(False)
    upd_c = update_cond if update_cond is not None else always
    ins_c = insert_cond if insert_cond is not None else always

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
