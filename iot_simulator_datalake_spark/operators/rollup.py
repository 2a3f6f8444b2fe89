"""Time-bucketed rollup aggregates ([DOC] A6:
``agg_hourly_device_metrics`` / ``agg_daily_device_metrics``,
README_DBT.md:204-205)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: granularity → date_trunc unit
GRAINS = {"hour": "hour", "day": "day", "week": "week", "month": "month"}


def time_rollup(df: DataFrame, ts_col: str, keys: Sequence[str],
                value_col: str, grain: str = "hour",
                streaming_window: bool = False) -> DataFrame:
    """Per-(bucket, keys) metric rollup: count / sum / avg / min / max.

    Batch form uses ``date_trunc`` (a pure column expr → partial aggs
    combine map-side, one shuffle).  ``streaming_window=True`` swaps in
    ``F.window`` tumbling windows so the same rollup runs under
    Structured Streaming with a watermark (ST5) — caller adds
    ``withWatermark`` upstream.
    """
    if grain not in GRAINS:
        raise ValueError(f"grain must be one of {sorted(GRAINS)}")
    if streaming_window and grain == "month":
        # Spark tumbling windows take fixed CalendarIntervals only —
        # '1 month' is variable-length and rejected at plan time
        # ("Intervals greater than a month is not supported").  Fail
        # here with the workaround instead of deep in the stream:
        raise ValueError(
            "streaming tumbling windows cannot bucket by month "
            "(variable-length interval); stream at grain='day' and "
            "re-aggregate day buckets to months in batch (date_trunc), "
            "or use a foreachBatch sink with the batch form")
    if streaming_window:
        # '1 week' tumbling windows align to the 1970-01-01 epoch — a
        # THURSDAY — while date_trunc('week') truncates to Monday; the
        # 4-day startTime offset re-anchors the window so the batch
        # and streaming forms of the "same rollup" emit the same week
        # keys (un-anchored, a backfill+live union would double-count
        # every week across two disjoint bucket sets).
        start = "4 days" if grain == "week" else None
        bucket = F.window(F.col(ts_col), f"1 {grain}",
                          startTime=start)["start"].alias("bucket")
    else:
        bucket = F.date_trunc(GRAINS[grain], F.col(ts_col)).alias("bucket")
    v = F.col(value_col)
    return (df.groupBy(bucket, *keys)
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(v).alias("total"),
                 F.avg(v).alias("avg"),
                 F.min(v).alias("min"),
                 F.max(v).alias("max")))
