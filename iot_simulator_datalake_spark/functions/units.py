"""The repo-wide determinism quantizer.

Every HASH-COMPARED real-valued output goes through this ONE helper:
``floor(x · 10^scale)`` as BIGINT.  Floor is tie-rule-free — unlike
fractional ROUND, whose HALF_UP-vs-scaled-double boundary behavior
diverges between Spark and DuckDB (the hazard class the repo's
determinism sweep eliminated).  Single-sourcing it means a guard or
scale fix lands in every gate family at once instead of silently
patching one inline copy of the expression (round-7 review finding).

DuckDB twin of ``to_units(x, s)``:
``CAST(floor(x * 1e<s>) AS BIGINT)``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_units(col: Column, scale: int) -> Column:
    """``floor(col · 10^scale)`` as BIGINT — integer micro-units for
    scale=6, nano-units for scale=9 (the two scales in use)."""
    return F.floor(col * F.lit(float(10 ** scale))).cast("long")
