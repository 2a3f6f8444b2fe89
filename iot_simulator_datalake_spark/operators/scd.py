"""SCD Type 1 current-state from CDC change streams ([DOC] W1 surface:
README_DBT.md:103,171-182,242-244 — "CDC deduplication with
ROW_NUMBER()", soft deletes via ``_is_deleted``)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import window_dedup


def scd1_current(changes: DataFrame, key: str, order_col: str = "op_ts",
                 tiebreak: str | None = None,
                 deleted_col: str = "_is_deleted") -> DataFrame:
    """Latest-record-wins current state: one row per key (max
    ``order_col`` version), soft-deleted rows excluded
    (README_DBT.md:243).

    One shuffle on the entity key; at CDC volumes the per-key change
    count is small so no skew handling is needed — a hot key (e.g. a
    device rewriting constantly) is still bounded by retention.
    """
    order = [F.col(order_col).desc()]
    if tiebreak:
        order.append(F.col(tiebreak).desc())
    current = window_dedup(changes, [key], order)
    if deleted_col in changes.columns:
        current = current.filter(
            ~F.coalesce(F.col(deleted_col), F.lit(False)))
    return current
