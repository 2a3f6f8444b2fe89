"""Interval algebra over event streams: gaps-and-islands interval
merging and a bucketized interval-overlap join.

[DOC] lineage: the reference's README-level alerting/monitoring tables
(``README_DBT.md:169,182,199`` — alerts vs. threshold windows) imply
interval reasoning over device activity; these are the two canonical
relational forms: consolidate ("when was the device continuously
active") and pair ("which activity windows intersect which alert
windows").

Scale design:

- ``interval_merge`` is the classic gaps-and-islands plan: ONE hash
  exchange on the partition key, then two window passes (running-max
  end to flag island starts, running-sum to number islands) and a
  final partial-aggregated groupBy that reuses the same partitioning —
  no self-join, no O(n²) anywhere.  At 100 TB the key is that
  everything after the single shuffle is partition-local.

- ``interval_overlap_join`` replaces the O(n·m) theta join Spark would
  otherwise plan (BroadcastNestedLoopJoin) with an equi-join on
  (user, time-bucket): every interval of width ≤ W overlaps at most 2
  cells of a W-wide grid, so each side explodes into ≤2 bucket rows
  and the candidate space is the per-cell cross product only.
  Duplicate candidates (pairs meeting in both shared cells) collapse
  with DISTINCT before scoring.  This is the standard bounded-range
  join decomposition; the DuckDB oracle runs the unoptimized theta
  join directly, proving the rewrite exact.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .queries import load, q

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession

#: interval half-width knobs (µs).  merge: each event opens a 10-min
#: activity window; overlap join: 30-min windows, bucket grid = width.
_MERGE_W = 600_000_000
_OVL_W = 1_800_000_000


@q("interval_merge", ("W1", "A6", "F7"), oracle=f"""
WITH iv AS (
  SELECT user_id, event_id, epoch_us(ts) AS s,
         epoch_us(ts) + {_MERGE_W} AS e
  FROM events
), flagged AS (
  SELECT user_id, event_id, s, e,
         CASE WHEN MAX(e) OVER (
                PARTITION BY user_id ORDER BY s, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
              ) IS NULL
              OR s > MAX(e) OVER (
                PARTITION BY user_id ORDER BY s, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
              )
         THEN 1 ELSE 0 END AS new_island
  FROM iv
), islands AS (
  SELECT user_id, s, e,
         CAST(SUM(new_island) OVER (
           PARTITION BY user_id ORDER BY s, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS island
  FROM flagged
)
SELECT user_id, island,
       MIN(s) AS start_micro, MAX(e) AS end_micro,
       COUNT(*) AS n_events
FROM islands GROUP BY user_id, island
""")
def interval_merge(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Merge overlapping per-user activity intervals (event ts + 10 min)
    into maximal islands.  Single shuffle on user_id; the running-max /
    running-sum windows and the island aggregate all share that
    partitioning (see module docstring for the 100 TB argument).
    Micro-unit integer endpoints keep the result bit-exact."""
    ev = (load(spark, sf_dir, "events")
          .select("user_id", "event_id",
                  F.unix_micros("ts").alias("s"),
                  (F.unix_micros("ts") + F.lit(_MERGE_W)).alias("e")))
    ordered = W.partitionBy("user_id").orderBy("s", "event_id")
    prior = ordered.rowsBetween(W.unboundedPreceding, -1)
    prev_max = F.max("e").over(prior)
    flagged = ev.withColumn(
        "new_island",
        F.when(prev_max.isNull() | (F.col("s") > prev_max), 1).otherwise(0))
    running = ordered.rowsBetween(W.unboundedPreceding, W.currentRow)
    islands = flagged.withColumn(
        "island", F.sum("new_island").over(running).cast("bigint"))
    return (islands.groupBy("user_id", "island")
            .agg(F.min("s").alias("start_micro"),
                 F.max("e").alias("end_micro"),
                 F.count(F.lit(1)).alias("n_events")))


@q("interval_overlap_join", ("J4", "J5", "F7"), oracle=f"""
WITH a AS (
  SELECT user_id, event_id, epoch_us(ts) AS s,
         epoch_us(ts) + {_OVL_W} AS e
  FROM events WHERE event_type = 'click'
), b AS (
  SELECT user_id, event_id, epoch_us(ts) AS s,
         epoch_us(ts) + {_OVL_W} AS e
  FROM events WHERE event_type = 'purchase'
)
SELECT a.user_id, a.event_id AS click_id, b.event_id AS purchase_id,
       LEAST(a.e, b.e) - GREATEST(a.s, b.s) AS overlap_micro
FROM a JOIN b
  ON a.user_id = b.user_id AND a.s <= b.e AND b.s <= a.e
""")
def interval_overlap_join(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Pairs of click/purchase 30-min activity windows that intersect,
    per user, via the bucket-grid equi-join decomposition (module
    docstring).  The oracle runs the naive theta join — identical
    output, different (unscalable) plan."""
    ev = load(spark, sf_dir, "events")

    def side(event_type: str) -> "DataFrame":
        return (ev.filter(F.col("event_type") == event_type)
                .select("user_id", "event_id",
                        F.unix_micros("ts").alias("s"),
                        (F.unix_micros("ts") + F.lit(_OVL_W)).alias("e")))

    def with_buckets(df: "DataFrame") -> "DataFrame":
        # width == bucket size ⇒ each interval spans ≤2 cells
        return df.withColumn(
            "bucket",
            F.explode(F.sequence(F.expr(f"s div {_OVL_W}"),
                                 F.expr(f"e div {_OVL_W}"))))

    a = with_buckets(side("click")).alias("a")
    b = with_buckets(side("purchase")).alias("b")
    pairs = (a.join(b, [F.col("a.user_id") == F.col("b.user_id"),
                        F.col("a.bucket") == F.col("b.bucket"),
                        F.col("a.s") <= F.col("b.e"),
                        F.col("b.s") <= F.col("a.e")])
             .select(F.col("a.user_id").alias("user_id"),
                     F.col("a.event_id").alias("click_id"),
                     F.col("b.event_id").alias("purchase_id"),
                     (F.least("a.e", "b.e") -
                      F.greatest("a.s", "b.s")).alias("overlap_micro"))
             .distinct())
    return pairs
