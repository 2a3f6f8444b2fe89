"""Column-level masking policies — the OSS analog of the column masks
the reference's platform tier attaches in Unity Catalog (public
Databricks feature: masking functions bound to columns, evaluated at
read time per-principal).

A :class:`MaskPolicy` binds a masking strategy to a column name;
:func:`apply_masks` rewrites a relation for a given set of granted
capabilities.  Masking is a PROJECTION — pure map-side expressions, no
shuffle, no data copy — so governance costs nothing at 100 TB, and
because it happens at read the stored data keeps one canonical
unmasked form (re-grant = no rewrite).

Strategies (all deterministic, all JVM expressions):

- ``hash``     md5 of the value (referential integrity preserved:
               equal values mask equal — joins on masked keys work)
- ``partial``  keep the last N chars, star the rest (audit display)
- ``null``     redact to NULL (strictest)
- ``bucket``   coarsen numerics to a bucket floor (k-anonymity helper)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import TYPE_CHECKING, Sequence

from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import Column, DataFrame


@dataclass(frozen=True)
class MaskPolicy:
    """Mask ``column`` with ``strategy`` unless the reader holds
    ``unless`` (a capability string, e.g. 'pii:read')."""
    column: str
    strategy: str = "hash"          # hash | partial | null | bucket
    unless: str = "pii:read"
    keep_chars: int = 4             # for partial
    bucket_size: int = 100          # for bucket

    def masked(self) -> "Column":
        c = F.col(self.column)
        if self.strategy == "hash":
            return F.md5(c.cast("string"))
        if self.strategy == "partial":
            n = self.keep_chars
            s = c.cast("string")
            return F.concat(
                F.expr(f"repeat('*', greatest(length(cast({self.column} "
                       f"as string)) - {n}, 0))"),
                F.substring(s, -n, n))
        if self.strategy == "null":
            return F.lit(None).cast("string")
        if self.strategy == "bucket":
            return (F.floor(c / self.bucket_size)
                    * self.bucket_size).cast("long")
        raise ValueError(f"unknown mask strategy {self.strategy!r}")


def apply_masks(df: "DataFrame", policies: Sequence[MaskPolicy],
                capabilities: Sequence[str] = ()) -> "DataFrame":
    """Return ``df`` with every policy whose ``unless`` capability is
    NOT held rewritten to its masked form.  Missing policy columns are
    ignored (schema evolution tolerant).  Output schema keeps column
    names; masked non-string strategies may change the column type
    (hash/partial/null → string, bucket → long) — the same contract as
    platform column masks."""
    caps = set(capabilities)
    out = df
    for p in policies:
        if p.unless in caps or p.column not in df.columns:
            continue
        out = out.withColumn(p.column, p.masked())
    return out
