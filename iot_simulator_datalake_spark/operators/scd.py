"""SCD Type 1 current-state from CDC change streams ([DOC] W1 surface:
README_DBT.md:103,171-182,242-244 — "CDC deduplication with
ROW_NUMBER()", soft deletes via ``_is_deleted``), plus the continuously
maintained variant (⇔ DLT ``APPLY CHANGES INTO``)."""

from __future__ import annotations

import shutil
from pathlib import Path
from typing import TYPE_CHECKING

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import window_dedup

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import SparkSession


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


class ApplyChanges:
    """Continuously maintained SCD1 table — the OSS equivalent of DLT's
    ``APPLY CHANGES INTO`` (README_DBT.md CDC pipeline surface).

    Each :meth:`apply` folds a batch of change rows into a stored
    current-state table: latest version per key wins, with **tombstone
    retention** — deleted keys stay in the state (flagged) so an
    out-of-order update older than the delete cannot resurrect the row;
    :meth:`read` filters tombstones out.

    Merge cost is O(batch + state-keys) — the window runs over the
    union of the (one-row-per-key) state and the batch, shuffled on the
    entity key.  Pass as ``foreachBatch(ac.apply)`` on a CDC stream.
    With Delta/Iceberg jars this becomes MERGE INTO keyed on the batch's
    keys; plain parquet rewrites the O(keys) state, never the history.
    """

    def __init__(self, spark: "SparkSession", path: str | Path, *,
                 key: str, order_col: str = "op_ts",
                 tiebreak: str | None = None,
                 deleted_col: str = "_is_deleted"):
        self.spark = spark
        self.path = Path(path)
        self.key, self.order_col = key, order_col
        self.tiebreak, self.deleted_col = tiebreak, deleted_col

    def _state(self) -> DataFrame | None:
        if not (self.path / "_SUCCESS").exists():
            return None
        return self.spark.read.parquet(str(self.path))

    def apply(self, changes: DataFrame, epoch_id: int | None = None) -> None:
        state = self._state()
        merged = changes if state is None else \
            state.unionByName(changes, allowMissingColumns=True)
        order = [F.col(self.order_col).desc()]
        if self.tiebreak:
            order.append(F.col(self.tiebreak).desc())
        current = window_dedup(merged, [self.key], order)
        current = current.localCheckpoint(eager=True)  # break lineage to
        # the files replaced below
        tmp = self.path.with_suffix(".staging")
        shutil.rmtree(tmp, ignore_errors=True)
        current.write.mode("overwrite").parquet(str(tmp))
        old = self.path.with_suffix(".old")
        shutil.rmtree(old, ignore_errors=True)
        if self.path.exists():
            self.path.rename(old)
        tmp.rename(self.path)
        shutil.rmtree(old, ignore_errors=True)

    def read(self, include_deleted: bool = False) -> DataFrame:
        state = self._state()
        if state is None:
            raise FileNotFoundError(f"no state at {self.path}; apply first")
        if include_deleted or self.deleted_col not in state.columns:
            return state
        return state.filter(
            ~F.coalesce(F.col(self.deleted_col), F.lit(False)))


def scd2_history(changes: DataFrame, key: str, order_col: str = "op_ts",
                 tiebreak: str | None = None,
                 deleted_col: str = "_is_deleted") -> DataFrame:
    """SCD Type 2 version history (⇔ dbt snapshots / DLT APPLY CHANGES
    ``STORED AS SCD TYPE 2``): every change opens a version valid
    [``order_col``, next change); delete events close the prior
    version without opening one, so a key whose last op is a delete
    has no current row.

    Adds ``valid_from``, ``valid_to`` (NULL while open) and
    ``is_current``.  One shuffle on the entity key — the lead() window
    reuses the same partitioning as SCD1's dedup, so maintaining both
    views costs one exchange total.
    """
    from pyspark.sql import Window as W

    order = [F.col(order_col).asc()]
    if tiebreak:
        order.append(F.col(tiebreak).asc())
    w = W.partitionBy(key).orderBy(*order)
    out = (changes
           .withColumn("valid_from", F.col(order_col))
           .withColumn("valid_to", F.lead(order_col).over(w)))
    if deleted_col in changes.columns:
        out = out.filter(~F.coalesce(F.col(deleted_col), F.lit(False)))
    return out.withColumn("is_current", F.col("valid_to").isNull())
