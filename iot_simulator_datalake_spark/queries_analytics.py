"""Window-function and aggregate-shape breadth: running totals, lag
deltas, interval-range moving averages, argmax, ROLLUP+GROUPING,
filtered aggregates, histograms, deterministic sampling.

These extend the declared surface past SURVEY §2.5's W1-W3 (the
reference's only window use is ROW_NUMBER dedup — README_DBT.md:242-244)
with the frame/offset/ordered-set shapes any analytics engine needs.
Scale notes inline per query; all stay fully JVM-side (no Python UDFs).

Float determinism: every windowed/grouped sum over doubles goes through
DECIMAL(25,4) exactly like queries.dsum (see queries.py module
docstring); averages divide the decimal-sum (as double) by the frame
count and round to 6 dp on both engines.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .operators.hints import maybe_broadcast
from .operators.prefix import global_ntile, ranged_prefix
from .queries import load, oavg, osum, q

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession


# =========================================================================
# Window frames (running / offset / range) — beyond W1's ROW_NUMBER
# =========================================================================

@q("window_running_total", ("W1", "F7"), bench=True, oracle="""
SELECT o_custkey AS customer, o_orderkey AS order_id,
       CAST(o_orderdate AS DATE) AS order_date,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(25,4))) OVER (
           PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS running_spend
FROM orders
""")
def window_running_total(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Per-customer cumulative spend (running SUM frame).  One shuffle
    on the partition key, then a per-partition sort — at 100 TB the
    partition key (customer) is high-cardinality so partitions stay
    small and the sort is in-memory; the frame itself is O(1) running
    state, never a re-scan.  Ties broken by orderkey so the running
    prefix is deterministic."""
    o = load(spark, sf_dir, "orders")
    w = (W.partitionBy("o_custkey")
         .orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    return o.select(
        F.col("o_custkey").alias("customer"),
        F.col("o_orderkey").alias("order_id"),
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.sum(F.col("o_totalprice").cast("decimal(25,4)")).over(w)
         .cast("double").alias("running_spend"))


@q("window_lag_delta", ("W1", "F2"), oracle="""
SELECT event_id, user_id, ts,
       epoch_us(ts) - LAG(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS delta_us
FROM events
""")
def window_lag_delta(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Inter-event gap per device (LAG offset window) — the IoT
    heartbeat/dropout primitive.  Same single-shuffle profile as the
    running total; the offset lookup is O(1) per row.  Gap computed in
    epoch microseconds (bigint) so both engines agree bit-for-bit."""
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    return e.select(
        "event_id", "user_id", "ts",
        (us - F.lag(us).over(w)).alias("delta_us"))


@q("moving_avg_7d", ("W1", "A6", "F7"), oracle="""
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS order_date,
           (CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS day_n,
           SUM(CAST(o_totalprice AS DECIMAL(25,4))) AS day_total_dec,
           COUNT(*) AS day_orders
    FROM orders GROUP BY 1, 2
)
SELECT order_date, CAST(day_total_dec AS DOUBLE) AS day_total,
       CAST((CAST(SUM(day_total_dec) OVER w * 10000 AS HUGEINT) * 100)
            // (SUM(day_orders) OVER w) AS DOUBLE) / 1000000.0
         AS avg_order_7d
FROM daily
WINDOW w AS (ORDER BY day_n
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
""")
def moving_avg_7d(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Trailing-7-day average order value (RANGE frame over a computed
    day number).  Two-phase: a daily pre-aggregate shrinks the input to
    one row per day BEFORE the window, so the range frame slides over
    ~2500 rows regardless of fact size — the at-scale pattern for
    calendar-window metrics (never a range frame over raw facts).
    RANGE (not ROWS) handles calendar gaps correctly.  The daily total
    stays DECIMAL through the frame sum, and the average is computed in
    exact integer micro-units with truncating division — ROUND(double)
    half-ties land differently per engine when the frame's day count is
    a power of two (exact binary quotients), so rounding is defined as
    truncation at 1e-6 instead."""
    o = load(spark, sf_dir, "orders")
    daily = (o.groupBy(F.col("o_orderdate").cast("date").alias("order_date"))
             .agg(F.sum(F.col("o_totalprice").cast("decimal(25,4)"))
                  .alias("day_total_dec"),
                  F.count(F.lit(1)).alias("day_orders"))
             .withColumn("day_n", F.datediff("order_date",
                                             F.lit("1970-01-01"))))
    w = (W.orderBy("day_n").rangeBetween(-6, 0))
    # the micro-unit cross-multiply runs in 128-bit (DECIMAL(38,0) ≡
    # HUGEINT): a 7-day revenue window in 1e-4 units × 100 exits int64
    # around 1e12 $/week — real at warehouse scale; the per-order
    # average QUOTIENT is always long-safe
    return (daily
            .withColumn("_sum_units",
                        (F.sum("day_total_dec").over(w) * 10000)
                        .cast("decimal(38,0)"))
            .withColumn("_cnt", F.sum("day_orders").over(w))
            .select(
                "order_date",
                F.col("day_total_dec").cast("double").alias("day_total"),
                (F.expr("(_sum_units * 100) div _cnt").cast("double") /
                 F.lit(1000000.0)).alias("avg_order_7d")))


# =========================================================================
# Ordered-set / argmax aggregates
# =========================================================================

@q("argmax_latest_event", ("A7", "W1"), oracle="""
SELECT user_id,
       arg_max(event_type,
               lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
               || lpad(CAST(event_id AS VARCHAR), 12, '0')) AS last_type,
       MAX(ts) AS last_ts, COUNT(*) AS n_events
FROM events GROUP BY user_id
""")
def argmax_latest_event(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Latest event type per device via MAX_BY (argmax aggregate) — the
    single-pass alternative to the ROW_NUMBER dedup (cdc_latest_wins)
    when only ONE column is wanted: no window shuffle+sort of whole
    rows, just a two-phase aggregate with map-side partials, so at
    scale it's strictly cheaper than W1.
    The ordering key is (ts, event_id) encoded as a zero-padded string
    because argmax tiebreaks must be total for cross-engine
    determinism."""
    e = load(spark, sf_dir, "events")
    ordkey = F.concat(
        F.lpad(F.unix_micros(F.col("ts")).cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"))
    return (e.groupBy("user_id")
            .agg(F.max_by("event_type", ordkey).alias("last_type"),
                 F.max("ts").alias("last_ts"),
                 F.count(F.lit(1)).alias("n_events")))


# =========================================================================
# Grouping-set metadata, filtered aggregates, histograms
# =========================================================================

@q("rollup_grouping_id", ("A1", "F7"), oracle=f"""
SELECT l_returnflag AS flag, l_linestatus AS status,
       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       {osum('l_quantity')} AS qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""")
def rollup_grouping_id(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """ROLLUP with GROUPING_ID — hierarchical subtotals whose level is
    identified by the grouping bitmask (needed by any BI layer consuming
    grouping sets).  Single Expand + one shuffle, same plan family as
    cube_rollup_totals."""
    li = load(spark, sf_dir, "lineitem")
    from .queries import dsum
    return (li.rollup(F.col("l_returnflag").alias("flag"),
                      F.col("l_linestatus").alias("status"))
            .agg(F.grouping_id().cast("bigint").alias("gid"),
                 dsum("l_quantity").alias("qty")))


@q("conditional_agg_filter", ("A1", "P6", "F7"), oracle=f"""
SELECT o_custkey AS customer,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_filled,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
       CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(25,4)))
            FILTER (WHERE o_orderpriority = '1-URGENT'), 0) AS DOUBLE)
         AS urgent_spend
FROM orders GROUP BY 1
""")
def conditional_agg_filter(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Filtered/conditional aggregates (FILTER clause ⇔ count_if /
    sum(CASE)) — many metrics over one scan instead of N self-joins.
    One pass, one shuffle, all map-side combinable."""
    o = load(spark, sf_dir, "orders")
    return (o.groupBy(F.col("o_custkey").alias("customer"))
            .agg(F.count_if(F.col("o_orderstatus") == "F").alias("n_filled"),
                 F.count_if(F.col("o_orderstatus") == "O").alias("n_open"),
                 F.coalesce(
                     F.sum(F.when(F.col("o_orderpriority") == "1-URGENT",
                                  F.col("o_totalprice"))
                           .cast("decimal(25,4)")),
                     F.lit(0).cast("decimal(25,4)"))
                 .cast("double").alias("urgent_spend")))


@q("histogram_price_bins", ("A1", "F7"), oracle="""
SELECT CAST(FLOOR(l_extendedprice / 500) AS BIGINT) AS bin,
       COUNT(*) AS n, MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi
FROM lineitem GROUP BY 1
""")
def histogram_price_bins(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Equi-width histogram via floor-division binning — the profiling
    primitive behind data-quality drift checks.  Bin count is bounded
    (price range / width) so the agg output is tiny no matter the input
    scale; floor() on doubles is exact for these 2-dp values."""
    li = load(spark, sf_dir, "lineitem")
    return (li.groupBy(F.floor(F.col("l_extendedprice") / 500)
                       .cast("bigint").alias("bin"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min("l_extendedprice").alias("lo"),
                 F.max("l_extendedprice").alias("hi")))


@q("hash_sample_stratified", ("P5", "A5"), oracle="""
SELECT event_id, user_id, event_type, value
FROM events
WHERE CAST(('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 15))
           AS BIGINT) % 1000 < 100
""")
def hash_sample_stratified(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Deterministic ~10% Bernoulli sample keyed on md5(event_id) — the
    repeatable-sampling primitive for eval-set carving and profiling
    (same md5-bucket technique as dataset_split, applied as a sampling
    filter).  Pure narrow filter: no shuffle, prunes at the scan, and
    the same rows are selected on any engine, any partitioning, any
    run — unlike rand()-based sampling."""
    e = load(spark, sf_dir, "events")
    bucket = (F.conv(F.substring(F.md5(F.col("event_id").cast("string")),
                                 1, 15), 16, 10)
              .cast("bigint") % 1000)
    return (e.filter(bucket < 100)
            .select("event_id", "user_id", "event_type", "value"))


@q("ntile_value_quartiles", ("W3", "A1"), oracle="""
SELECT tile::INT AS tile, COUNT(*) AS n,
       MIN(value) AS lo, MAX(value) AS hi
FROM (
    SELECT value, NTILE(4) OVER (ORDER BY value, event_id) AS tile
    FROM events
) GROUP BY 1
""")
def ntile_value_quartiles(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """NTILE bucketing → per-quartile stats — the eval-set binning /
    decile-report primitive.  A global NTILE needs a total order; a
    naive ``NTILE OVER (ORDER BY ...)`` would funnel every event row
    through ONE window task, so the tile comes from
    ``operators.prefix.global_ntile`` instead: range-partitioned local
    ranks + driver-folded bucket offsets reproduce the exact ANSI
    NTILE assignment with no single-partition stage (the oracle keeps
    the naive form — the gate certifies the equivalence).  event_id
    tiebreak keeps the tile assignment total and cross-engine
    deterministic."""
    e = load(spark, sf_dir, "events").select("value", "event_id")
    t = global_ntile(e, [F.col("value"), F.col("event_id")], 4, "tile")
    return (t.select("value", F.col("tile").cast("int").alias("tile"))
            .groupBy("tile")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min("value").alias("lo"),
                 F.max("value").alias("hi")))


@q("collect_types_per_user", ("A2", "F9"), oracle="""
SELECT user_id,
       list_aggr(list_sort(list(DISTINCT event_type)), 'string_agg', ',')
         AS types_csv,
       COUNT(DISTINCT event_type) AS n_types
FROM events GROUP BY user_id
""")
def collect_types_per_user(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Array aggregation: distinct event types per device as a sorted
    CSV (collect_set → array_sort → array_join).  The collection stays
    bounded (≤ |event-type vocabulary| per key) so the agg buffer is
    O(distinct values), map-side combinable — the safe shape for
    collect_* at scale (never collect unbounded raw rows per key)."""
    e = load(spark, sf_dir, "events")
    return (e.groupBy("user_id")
            .agg(F.array_join(F.array_sort(F.collect_set("event_type")), ",")
                 .alias("types_csv"),
                 F.countDistinct("event_type").alias("n_types")))


@q("stats_exact_moments", ("A8", "F7"), oracle="""
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(25,4))) AS DOUBLE) AS s1,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))
                * CAST(value AS DECIMAL(18,4))), 4) AS DOUBLE) AS s2,
       ROUND(SQRT((CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))
                            * CAST(value AS DECIMAL(18,4))), 4) AS DOUBLE)
                   - CAST(SUM(CAST(value AS DECIMAL(25,4))) AS DOUBLE)
                     * CAST(SUM(CAST(value AS DECIMAL(25,4))) AS DOUBLE)
                     / COUNT(*))
                  / (COUNT(*) - 1)), 6) AS stddev_value
FROM events GROUP BY event_type
""")
def stats_exact_moments(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Sample stddev from EXACT decimal moment sums (n, Σx, Σx²) —
    the cross-engine-deterministic form of STDDEV_SAMP: builtin
    implementations (Welford / naive two-pass) sum doubles in
    engine-specific order and diverge in low bits, but decimal moments
    are exact, and the final double arithmetic is then identical on
    both sides.  Moment sums are also THE at-scale shape: one pass,
    map-side combinable, mergeable across partitions — the same
    (n, Σx, Σx²) triple serves mean/var/stddev and incremental
    maintenance (add/subtract partial moments)."""
    e = load(spark, sf_dir, "events")
    v = F.col("value").cast("decimal(25,4)")
    # squares in (18,4): the product stays within 38-digit precision on
    # both engines, so no engine-specific precision reduction/rounding
    v18 = F.col("value").cast("decimal(18,4)")
    n = F.count(F.lit(1))
    s1 = F.sum(v).cast("double")
    s2 = F.round(F.sum(v18 * v18), 4).cast("double")
    return (e.groupBy("event_type")
            .agg(n.alias("n"), s1.alias("s1"), s2.alias("s2"),
                 F.round(F.sqrt((s2 - s1 * s1 / n) / (n - F.lit(1))), 6)
                 .alias("stddev_value")))


@q("skew_salted_agg", ("A1", "F7"), oracle=f"""
SELECT event_type, COUNT(*) AS n, {osum('value')} AS total_value
FROM events GROUP BY event_type
""")
def skew_salted_agg(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Salted two-phase aggregation (operators/skew.py) under the gate:
    events has only 5 event_type groups — genuinely skewed for a
    32-reducer stage, each hot group spreads over 32 salt partials
    before the tiny per-key merge.  Count and DECIMAL-sum partials are
    associative and exact, so the result is independent of the random
    salt assignment and hash-matches the plain GROUP BY oracle —
    the invariant that makes salting safe to apply mechanically."""
    from .operators.skew import salted_agg
    e = load(spark, sf_dir, "events")
    out = salted_agg(
        e, ["event_type"],
        partials={"n": F.count(F.lit(1)),
                  "tv": F.sum(F.col("value").cast("decimal(25,4)"))},
        combines={"n": F.sum("n"),
                  "tv": F.sum("tv")},
        salts=32)
    return out.select("event_type", F.col("n").alias("n"),
                      F.col("tv").cast("double").alias("total_value"))


@q("pivot_type_counts", ("A1", "A2"), oracle="""
SELECT user_id,
       COUNT(*) FILTER (WHERE event_type = 'click')    AS n_click,
       COUNT(*) FILTER (WHERE event_type = 'error')    AS n_error,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
       COUNT(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
       COUNT(*) FILTER (WHERE event_type = 'view')     AS n_view
FROM events GROUP BY user_id
""")
def pivot_type_counts(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """PIVOT: long→wide event-type count matrix per device (the
    feature-vector shape every downstream model join wants).  The pivot
    value list is passed EXPLICITLY — without it Spark runs an extra
    collect-distinct job over the fact to discover columns, a full scan
    you never want at 100 TB.  With fixed values the plan is one scan →
    partial-combinable (user,type) count → pivotfirst on user; the
    second shuffle moves only the collapsed (user × ≤5 types) rows, so
    the wide fact is read and shuffled exactly once."""
    e = load(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    wide = (e.groupBy("user_id")
            .pivot("event_type", types)
            .count()
            .na.fill(0, types))
    return wide.select(
        "user_id", *[F.col(t).alias(f"n_{t}") for t in types])


@q("cube_status_priority", ("A1", "F7"), oracle=f"""
SELECT o_orderstatus AS status, o_orderpriority AS priority,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
       COUNT(*) AS n, {osum('o_totalprice')} AS total_price
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
""")
def cube_status_priority(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """CUBE over (status, priority): all four grouping sets in one pass
    — completes the grouping-set family next to rollup_grouping_id.
    One Expand (4× row multiplication BEFORE the shuffle) then a single
    aggregate; with low-cardinality keys like these the expanded rows
    collapse in the map-side combine, so the shuffle stays tiny no
    matter the fact size."""
    o = load(spark, sf_dir, "orders")
    from .queries import dsum
    return (o.cube(F.col("o_orderstatus").alias("status"),
                   F.col("o_orderpriority").alias("priority"))
            .agg(F.grouping_id().cast("bigint").alias("gid"),
                 F.count(F.lit(1)).alias("n"),
                 dsum("o_totalprice").alias("total_price")))


@q("hll_mergeable_rollup", ("A8", "A6"), oracle="""
SELECT CAST(DATE_TRUNC('month', DATE_TRUNC('day', ts)) AS TIMESTAMP)
         AS month,
       event_type,
       COUNT(DISTINCT user_id) AS distinct_exact,
       TRUE AS within_envelope,
       TRUE AS merge_associative
FROM events GROUP BY 1, 2
""")
def hll_mergeable_rollup(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Re-aggregatable distinct counts via HLL sketches: per-day
    ``hll_sketch_agg`` partials merged upward with ``hll_union_agg`` —
    THE 100 TB pattern for distinct-count rollup hierarchies
    (hour→day→week→month): sketches are tiny (KB), mergeable, and each
    level re-aggregates the level below WITHOUT touching raw data,
    which exact COUNT(DISTINCT) fundamentally cannot do.

    Gated claims (both scale-invariant — VERDICT r8 #4 replaced the
    old exact-distinct oracle, which held only while lgK=21 kept the
    sketch in coupon mode and was a documented ×10/×100 FAIL):

    - ``within_envelope``: the month-level merged estimate sits within
      the ±3σ envelope (``_HLL_BOUND_PPM``, abs floor 2) of exact
      COUNT(DISTINCT) — the family bound of ``hll_envelope_rollup``.
    - ``merge_associative``: the MERGEABILITY algebra itself — the
      month estimate is IDENTICAL whether day sketches union straight
      to months or via an intermediate partial level (odd/even-day
      half-month unions re-unioned).  Datasketches HLL unions are
      order- and grouping-insensitive, so any violation means the
      re-aggregation plan (not the math) broke; this is exactly the
      property a rollup hierarchy relies on, and it holds verbatim at
      any cardinality/regime.

    The exact side is gate/QA cost only — production serves the
    sketch path; month level keeps this surface disjoint from the
    week-level ``hll_envelope_rollup`` twin."""
    e = load(spark, sf_dir, "events")
    daily = (e.groupBy(F.date_trunc("day", "ts").alias("day"), "event_type")
             .agg(F.hll_sketch_agg("user_id", F.lit(21)).alias("sk")))
    month = F.date_trunc("month", "day").alias("month")
    direct = (daily.groupBy(month, "event_type")
              .agg(F.hll_sketch_estimate(F.hll_union_agg("sk"))
                   .alias("est_direct")))
    # intermediate partial level: odd/even day-of-month halves — a
    # grouping that nests into months (unlike ISO weeks, which straddle
    # month boundaries), so two-level union covers exactly the same
    # day sketches as the direct path
    halves = (daily.groupBy(month, "event_type",
                            (F.dayofmonth("day") % 2).alias("parity"))
              .agg(F.hll_union_agg("sk").alias("hsk")))
    two_level = (halves.groupBy("month", "event_type")
                 .agg(F.hll_sketch_estimate(F.hll_union_agg("hsk"))
                      .alias("est_two")))
    exact = (e.groupBy(F.date_trunc("month",
                                    F.date_trunc("day", "ts")).alias("month"),
                       "event_type")
             .agg(F.countDistinct("user_id").alias("distinct_exact")))
    return (exact.join(direct, ["month", "event_type"])
            .join(two_level, ["month", "event_type"])
            .select("month", "event_type", "distinct_exact",
                    _hll_within("est_direct", "distinct_exact")
                    .alias("within_envelope"),
                    (F.col("est_direct") == F.col("est_two"))
                    .alias("merge_associative")))


#: HLL error envelope: 3σ for lgConfigK=21 (RSE = 1.04/√2²¹ ≈ 718 ppm
#: → 3σ ≈ 2154 ppm, rounded up).  Measured headroom at ×10: max error
#: 112 ppm at 14.4k distinct (SCALE.md round 7).
_HLL_BOUND_PPM = 2200


def _hll_within(est, exact) -> "F.Column":
    """TRUE iff the HLL estimate sits inside the ±3σ envelope of the
    exact distinct count (absolute floor of 2 for tiny groups) — the
    scale-robust claim the envelope twins hash-compare, replacing the
    exactness claim that breaks once sketches exit coupon mode."""
    bound = F.greatest(F.lit(2).cast("long"),
                       F.expr(f"({exact} * {_HLL_BOUND_PPM}) div 1000000"))
    return (F.abs(F.col(est) - F.col(exact)) <= bound)


#: shared by the batch twin and streaming_hll_envelope — ONE oracle
#: string and ONE week-level builder, so an edit to the bound, lgK or
#: week-trunc rule cannot diverge the family silently
HLL_WEEKLY_ENVELOPE_ORACLE = """
SELECT CAST(DATE_TRUNC('week', DATE_TRUNC('day', ts)) AS TIMESTAMP)
         AS week,
       event_type,
       COUNT(DISTINCT user_id) AS distinct_exact,
       TRUE AS within_envelope
FROM events GROUP BY 1, 2
"""


def hll_weekly_envelope(daily: "DataFrame", e: "DataFrame") -> "DataFrame":
    """Week-level envelope check over per-(day, event_type) sketches
    (column ``sk``): merge day sketches up to weeks, join the exact
    weekly COUNT(DISTINCT) from the raw events ``e``, and emit the
    envelope boolean — the single definition both the batch and the
    streaming twin serve."""
    est = (daily
           .groupBy(F.date_trunc("week", "day").alias("week"), "event_type")
           .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")))
    exact = (e.groupBy(F.date_trunc("week",
                                    F.date_trunc("day", "ts")).alias("week"),
                       "event_type")
             .agg(F.countDistinct("user_id").alias("distinct_exact")))
    return (exact.join(est, ["week", "event_type"])
            .select("week", "event_type", "distinct_exact",
                    _hll_within("est", "distinct_exact")
                    .alias("within_envelope")))


@q("hll_envelope_rollup", ("A8", "A6"), oracle=HLL_WEEKLY_ENVELOPE_ORACLE)
def hll_envelope_rollup(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Error-envelope twin of ``hll_mergeable_rollup`` — the gate that
    SURVIVES the exact-coupon regime.  The sibling hash-matches the
    sketch estimate against exact COUNT(DISTINCT), which is only valid
    while lgK=21 keeps the sketch exact (its ×10 sweep entry is a
    documented FAIL once estimates leave that regime — SCALE.md).
    This twin makes the scale-TRUE claim instead: the merged estimate
    must sit within the ±3σ theoretical envelope (2200 ppm, abs floor
    2) of the exact count — emitted as a BOOLEAN next to the exact
    count, with the oracle asserting TRUE.  If any group's estimate
    ever leaves the envelope, the Spark side emits FALSE and the hash
    gate fails loudly, at any scale.  (Measured headroom at ×10: max
    112 ppm.)  The exact side is gate/QA cost only — production serves
    the sketch path; this twin is the offline eval, like every recall
    gate in the repo."""
    e = load(spark, sf_dir, "events")
    daily = (e.groupBy(F.date_trunc("day", "ts").alias("day"), "event_type")
             .agg(F.hll_sketch_agg("user_id", F.lit(21)).alias("sk")))
    return hll_weekly_envelope(daily, e)


@q("hll_envelope_mau", ("A8", "A6", "W1"), oracle="""
WITH pairs AS (
  SELECT DISTINCT user_id,
         CAST(datediff('day', DATE '1970-01-01',
                       CAST(ts AS DATE)) AS BIGINT) AS day
  FROM events
), days AS (SELECT DISTINCT day FROM pairs),
cover AS (
  SELECT p.user_id, p.day + o.off AS window_end
  FROM pairs p CROSS JOIN (SELECT UNNEST(range(30)) AS off) o
)
SELECT c.window_end, COUNT(DISTINCT c.user_id) AS mau_exact,
       TRUE AS within_envelope
FROM cover c JOIN days d ON d.day = c.window_end
GROUP BY 1
""")
def hll_envelope_mau(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Error-envelope twin of ``monthly_active_users_hll`` (same
    rationale as ``hll_envelope_rollup``: the sibling's exactness gate
    is a documented ×10 FAIL; this one hash-compares the ±3σ envelope
    CLAIM, valid at any scale).  Window ends restrict to observed
    event days — the days the sketch path emits — so both engines
    enumerate identical windows.  The exact sliding distinct here is
    the ×30 activity-pair explode the sketch path exists to avoid:
    gate/QA cost only."""
    e = load(spark, sf_dir, "events")
    day = (F.datediff(F.col("ts").cast("date"),
                      F.lit("1970-01-01").cast("date"))
           .cast("long").alias("day"))
    pairs = e.select("user_id", day).distinct()
    days = pairs.select("day").distinct()
    cover = pairs.select(
        "user_id", F.explode(F.sequence(F.col("day"), F.col("day") + 29))
        .alias("window_end"))
    exact = (cover.join(days.withColumnRenamed("day", "window_end"),
                        "window_end")
             .groupBy("window_end")
             .agg(F.countDistinct("user_id").alias("mau_exact")))
    daily = (e.select("user_id", day).groupBy("day")
             .agg(F.hll_sketch_agg("user_id", F.lit(21)).alias("sk")))
    w = W.orderBy("day").rangeBetween(-29, W.currentRow)
    est = daily.select(
        F.col("day").alias("window_end"),
        F.hll_sketch_estimate(F.hll_union_agg("sk").over(w)).alias("est"))
    return (exact.join(est, "window_end")
            .select("window_end", "mau_exact",
                    _hll_within("est", "mau_exact")
                    .alias("within_envelope")))


@q("grouping_sets_explicit", ("A1", "F7"), oracle=f"""
SELECT o_orderstatus AS status, o_orderpriority AS priority,
       EXTRACT(year FROM o_orderdate)::INT AS year,
       CAST(GROUPING(o_orderstatus, o_orderpriority,
                     EXTRACT(year FROM o_orderdate)::INT) AS BIGINT) AS gid,
       COUNT(*) AS n, {osum('o_totalprice')} AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                        (o_orderstatus, EXTRACT(year FROM o_orderdate)::INT),
                        (EXTRACT(year FROM o_orderdate)::INT))
""")
def grouping_sets_explicit(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Non-hierarchical GROUPING SETS — the general form that CUBE and
    ROLLUP are special cases of: three hand-picked sets sharing one
    scan.  One Expand multiplies each row by the 3 sets BEFORE the
    shuffle and the map-side combine collapses them, so the exchange
    carries ≈ Σ per-set group counts — far cheaper than three separate
    scans+aggregates unioned, which is the rewrite this replaces.
    GROUPING() disambiguates real NULL keys from set-placeholder
    NULLs, exactly as in the CUBE/ROLLUP twins."""
    from .queries import dsum
    o = load(spark, sf_dir, "orders")
    proj = o.select(F.col("o_orderstatus").alias("status"),
                    F.col("o_orderpriority").alias("priority"),
                    F.year("o_orderdate").alias("year"),
                    "o_totalprice")
    return (proj.groupingSets(
        [[F.col("status"), F.col("priority")],
         [F.col("status"), F.col("year")],
         [F.col("year")]],
        F.col("status"), F.col("priority"), F.col("year"))
        .agg(F.grouping_id().cast("bigint").alias("gid"),
             F.count(F.lit(1)).alias("n"),
             dsum("o_totalprice").alias("total_price")))


@q("full_outer_reconciliation", ("J1", "A6", "F7"), oracle=f"""
WITH booked AS (
  SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month,
         {osum('o_totalprice')} AS booked_total
  FROM orders GROUP BY 1
), shipped AS (
  SELECT CAST(DATE_TRUNC('month', l_shipdate) AS DATE) AS month,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                       AS DECIMAL(25,4))) AS DOUBLE) AS shipped_total
  FROM lineitem GROUP BY 1
)
SELECT COALESCE(b.month, s.month) AS month,
       b.booked_total, s.shipped_total
FROM booked b FULL JOIN shipped s ON b.month = s.month
""")
def full_outer_reconciliation(spark: "SparkSession", sf_dir: str
                              ) -> "DataFrame":
    """Two independently-derived monthly ledgers (order bookings vs
    shipped revenue) reconciled with a FULL OUTER join — months present
    on either side survive, with NULL marking the missing ledger.  The
    one join type the rest of the surface didn't exercise.  Both sides
    pre-aggregate to month grain BEFORE the join, so the full-outer
    shuffle moves ≈ #months rows, not two fact tables — the
    aggregate-then-join ordering that makes reconciliation viable at
    100 TB.  Exact decimal sums per the float policy."""
    from .queries import dsum
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    booked = (o.groupBy(F.date_trunc("month", "o_orderdate").cast("date")
                        .alias("month"))
              .agg(dsum("o_totalprice").alias("booked_total")))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    shipped = (li.groupBy(F.date_trunc("month", "l_shipdate").cast("date")
                          .alias("month"))
               .agg(F.sum(rev.cast("decimal(25,4)")).cast("double")
                    .alias("shipped_total")))
    return booked.join(shipped, "month", "full")


@q("robust_mad_by_group", ("A8", "A7", "F7"), oracle="""
WITH med AS (
  SELECT l_returnflag AS flag, quantile_cont(l_quantity, 0.5) AS med
  FROM lineitem GROUP BY 1
)
SELECT m.flag, m.med,
       quantile_cont(abs(l.l_quantity - m.med), 0.5) AS mad
FROM lineitem l JOIN med m ON l.l_returnflag = m.flag
GROUP BY 1, 2
""")
def robust_mad_by_group(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Median absolute deviation per group — the robust (outlier-
    immune) counterpart of stats_exact_moments' stddev, the scale
    estimator robust anomaly detection uses where z-scores break.
    Two-pass: exact medians (one agg), broadcast the tiny per-group
    medians back, then one agg over |x − med|.  Exactness: l_quantity
    and its deviations are dyadic rationals, so both engines' linear
    interpolation is float-exact — the sketch path at 100 TB swaps
    F.percentile for percentile_approx, unchanged plan."""
    li = load(spark, sf_dir, "lineitem")
    med = (li.groupBy(F.col("l_returnflag").alias("flag"))
           .agg(F.percentile("l_quantity", 0.5).alias("med")))
    return (li.join(F.broadcast(med),
                    li["l_returnflag"] == med["flag"])
            .groupBy("flag", "med")
            .agg(F.percentile(F.abs(F.col("l_quantity") - F.col("med")),
                              0.5).alias("mad")))


@q("revenue_share_of_total", ("A1", "W1", "F7"), oracle="""
WITH rev AS (
  SELECT n.n_name AS nation,
         SUM(CAST(o.o_totalprice AS DECIMAL(25,4))) AS rev_dec
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1
)
SELECT nation, CAST(rev_dec AS DOUBLE) AS revenue,
       CAST(rev_dec AS DOUBLE)
         / CAST(SUM(rev_dec) OVER () AS DOUBLE) AS share
FROM rev
""")
def revenue_share_of_total(spark: "SparkSession", sf_dir: str
                           ) -> "DataFrame":
    """Ratio-to-report: each nation's share of global revenue via an
    empty-frame window (SUM() OVER ()) — the one window shape (global
    frame) the frame/offset family didn't cover.  Scale discipline:
    the global window runs AFTER aggregation, over 25 rows — putting
    OVER () on the fact table would serialize everything into one
    partition; over the aggregate it is free.  Determinism: the
    revenue stays DECIMAL through the window total (a double window
    sum of the 25 nation rows would be addition-order-dependent
    across engines — the hazard the old ROUND masked), so the share
    is ONE division of two exact-decimal-derived doubles, raw IEEE,
    bit-identical."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    rev = (o.join(maybe_broadcast(c), o["o_custkey"] == c["c_custkey"])
           .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
           .groupBy(F.col("n_name").alias("nation"))
           .agg(F.sum(F.col("o_totalprice").cast("decimal(25,4)"))
                .alias("rev_dec")))
    tot_dec = F.sum("rev_dec").over(W.partitionBy())
    return rev.select(
        "nation", F.col("rev_dec").cast("double").alias("revenue"),
        (F.col("rev_dec").cast("double") / tot_dec.cast("double"))
        .alias("share"))


@q("null_safe_join", ("J1", "P7", "F8"), oracle="""
WITH keyed AS (
  SELECT event_type,
         CASE WHEN CAST(json_extract_string(props, 'k') AS INT) % 7 = 0
              THEN NULL
              ELSE CAST(json_extract_string(props, 'k') AS INT) % 7
         END AS k
  FROM events
), clicks AS (
  SELECT k, COUNT(*) AS click_n FROM keyed
  WHERE event_type = 'click' GROUP BY 1
), views AS (
  SELECT k, COUNT(*) AS view_n FROM keyed
  WHERE event_type = 'view' GROUP BY 1
)
SELECT c.k, c.click_n, v.view_n
FROM clicks c JOIN views v ON c.k IS NOT DISTINCT FROM v.k
""")
def null_safe_join(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Null-safe equality join (``<=>`` ⇔ IS NOT DISTINCT FROM): the
    NULL bucket must MATCH across sides instead of vanishing the way
    plain ``=`` silently drops it — the standard trap when a join key
    is a parsed/optional attribute.  Spark plans ``<=>`` as an
    ordinary hash join (null-safe keys hash like values), so there is
    no nested-loop penalty for the semantics.  Key is derived from the
    JSON props payload (F8) with a deterministic NULL class."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int") % 7
    keyed = ev.select("event_type",
                      F.when(k == 0, F.lit(None).cast("int"))
                      .otherwise(k).alias("k"))

    def side(t: str, out: str) -> "DataFrame":
        return (keyed.filter(F.col("event_type") == t)
                .groupBy("k").agg(F.count(F.lit(1)).alias(out))
                .withColumnRenamed("k", f"{out}_k"))

    c, v = side("click", "click_n"), side("view", "view_n")
    return (c.join(v, c["click_n_k"].eqNullSafe(v["view_n_k"]))
            .select(c["click_n_k"].alias("k"), "click_n", "view_n"))


# =========================================================================
# Ordered-set aggregates: mode + weighted median ([EXT])
# =========================================================================

@q("mode_per_group", ("A1", "W1"), oracle="""
SELECT user_id, event_type AS mode_type, n FROM (
  SELECT user_id, event_type, COUNT(*) AS n,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY COUNT(*) DESC, event_type) AS rn
  FROM events GROUP BY user_id, event_type
) WHERE rn = 1
""")
def mode_per_group(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Statistical MODE per device — most frequent event type, ties
    broken lexicographically (determinism is the whole game: an
    unordered-tie mode is not a function, and two engines would
    legitimately disagree).

    Scale design: count-then-rank — the (user, type) count map-side
    combines first, so the ranking window runs over ≤|types| rows per
    user, and Spark lowers the rn=1 filter to WindowGroupLimit
    (per-partition partial top-1 before the shuffle).  The same shape
    generalizes to any "argmax of a grouped count".
    """
    e = load(spark, sf_dir, "events")
    cnt = e.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    w = (W.partitionBy("user_id")
         .orderBy(F.col("n").desc(), "event_type"))
    return (cnt.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("user_id", F.col("event_type").alias("mode_type"), "n"))


@q("weighted_median", ("A1", "W1", "F7"), oracle="""
WITH t AS (
  SELECT l_returnflag AS grp,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v,
         CAST(ROUND(l_quantity * 100) AS BIGINT) AS w
  FROM lineitem
), h AS (SELECT grp, v, CAST(SUM(w) AS BIGINT) AS wc
         FROM t GROUP BY grp, v),
c AS (
  SELECT grp, v,
         CAST(SUM(wc) OVER (PARTITION BY grp ORDER BY v) AS BIGINT)
             AS cumw,
         CAST(SUM(wc) OVER (PARTITION BY grp) AS BIGINT) AS totw
  FROM h
)
SELECT grp, CAST(MAX(totw) AS BIGINT) AS total_weight,
       CAST(MIN(CASE WHEN 2 * cumw >= totw THEN v END) AS BIGINT)
           AS weighted_median_cent
FROM c GROUP BY grp
""")
def weighted_median(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Quantity-weighted median price per group — the ordered-set
    aggregate where each value counts with its weight (the
    volume-weighted "typical price", robust where the plain mean is
    hostage to big-ticket rows).

    Scale design: identical histogram machinery to winsorized_stats —
    per-value WEIGHT sums pre-aggregate map-side, the cumulative
    window runs over the value grid (not the rows), and the median
    test is the integer cross-multiplication 2·cumw ≥ totw — exact,
    no interpolation, engine-portable.  Weighted quantiles at any q
    are the same query with q·totw; the grid relation amortizes all
    of them in one pass.
    """
    li = load(spark, sf_dir, "lineitem")
    t = li.select(F.col("l_returnflag").alias("grp"),
                  F.round(F.col("l_extendedprice") * 100).cast("long")
                  .alias("v"),
                  F.round(F.col("l_quantity") * 100).cast("long")
                  .alias("w"))
    h = t.groupBy("grp", "v").agg(F.sum("w").cast("long").alias("wc"))
    wcum = (W.partitionBy("grp").orderBy("v")
            .rowsBetween(W.unboundedPreceding, W.currentRow))
    c = h.select("grp", "v",
                 F.sum("wc").over(wcum).cast("long").alias("cumw"),
                 F.sum("wc").over(W.partitionBy("grp")).cast("long")
                 .alias("totw"))
    return (c.groupBy("grp").agg(
        F.max("totw").cast("long").alias("total_weight"),
        F.min(F.when(2 * F.col("cumw") >= F.col("totw"), F.col("v")))
        .cast("long").alias("weighted_median_cent")))


@q("multi_distinct_agg", ("A1", "A2"), oracle="""
SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
       COUNT(DISTINCT user_id) AS distinct_users,
       COUNT(DISTINCT event_type) AS distinct_types,
       COUNT(*) AS n_events
FROM events GROUP BY 1
""")
def multi_distinct_agg(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Several COUNT(DISTINCT ...) over different columns in ONE
    aggregate — the planner feature this exercises is Expand: Spark
    rewrites multi-distinct into an Expand (one replicated row per
    distinct-column group) + two-phase aggregation, so each distinct
    set dedups in parallel inside a single shuffle instead of N
    self-joined single-distinct queries.

    Scale note: Expand multiplies scan rows by the number of distinct
    specs — acceptable at 2-3 specs; beyond that, per-spec HLL
    sketches (hll_mergeable_rollup) replace exactness with constant
    state, which is why both shapes live in this repo.
    """
    e = load(spark, sf_dir, "events")
    return (e.groupBy(F.date_trunc("day", "ts").alias("day"))
            .agg(F.countDistinct("user_id").alias("distinct_users"),
                 F.countDistinct("event_type").alias("distinct_types"),
                 F.count("*").alias("n_events")))


@q("monthly_active_users_hll", ("A8", "A6", "W1"), oracle="""
WITH pairs AS (
  SELECT DISTINCT user_id,
         CAST(datediff('day', DATE '1970-01-01',
                       CAST(ts AS DATE)) AS BIGINT) AS day
  FROM events
), days AS (SELECT DISTINCT day FROM pairs),
cover AS (
  SELECT p.user_id, p.day + o.off AS window_end
  FROM pairs p CROSS JOIN (SELECT UNNEST(range(30)) AS off) o
)
SELECT c.window_end, COUNT(DISTINCT c.user_id) AS mau_exact,
       TRUE AS within_envelope,
       TRUE AS window_merge_consistent
FROM cover c JOIN days d ON d.day = c.window_end
GROUP BY 1
""")
def monthly_active_users_hll(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Sliding 30-day active users via WINDOWED SKETCH MERGE — the
    escalation weekly_active_users documents: instead of exploding
    every activity pair ×30, build ONE HLL sketch per day and
    union-merge 30 of them per window with ``hll_union_agg`` as a
    window aggregate over a RANGE frame.  State per window is a KB
    sketch; the per-day sketch relation is calendar-sized, so the
    window pass costs nothing at any event volume — this is how
    90-day MAU stays feasible at 100 TB.

    Gated claims (both scale-invariant — VERDICT r8 #4 replaced the
    old exact-distinct oracle, a documented ×10/×100 FAIL once lgK=21
    sketches leave coupon mode):

    - ``within_envelope``: the windowed merge estimate sits within the
      ±3σ family envelope of the exact sliding COUNT(DISTINCT).
    - ``window_merge_consistent``: the RANGE-frame window union yields
      the IDENTICAL estimate as an explicit day-range self-join merge
      of the same 30 day-sketches — Datasketches unions are order- and
      grouping-insensitive, so this pins the window-frame plan (frame
      bounds, day alignment) against an independently-shaped plan at
      any cardinality.

    Window ends restrict to observed event days (the rows the sketch
    relation emits), so both engines enumerate identical windows; the
    exact ×30 activity-pair explode is gate/QA cost only.  Differs
    from ``hll_envelope_mau`` (the plain envelope twin) by the
    two-plan consistency claim."""
    e = load(spark, sf_dir, "events")
    daily = (e.select("user_id",
                      F.datediff(F.col("ts").cast("date"),
                                 F.lit("1970-01-01").cast("date"))
                      .cast("long").alias("day"))
             .groupBy("day")
             .agg(F.hll_sketch_agg("user_id", F.lit(21)).alias("sk"))
             .cache())  # calendar-sized; consumed by three branches
    w = W.orderBy("day").rangeBetween(-29, W.currentRow)
    est_w = daily.select(
        F.col("day").alias("window_end"),
        F.hll_sketch_estimate(F.hll_union_agg("sk").over(w))
        .alias("est_w"))
    # independent plan for the same merge: explicit day-range theta
    # join (calendar × 30 rows — tiny at any event volume)
    ends = daily.select(F.col("day").alias("window_end"))
    est_j = (ends.join(daily,
                       (F.col("day") <= F.col("window_end")) &
                       (F.col("day") >= F.col("window_end") - 29))
             .groupBy("window_end")
             .agg(F.hll_sketch_estimate(F.hll_union_agg("sk"))
                  .alias("est_j")))
    pairs = e.select(
        "user_id",
        F.datediff(F.col("ts").cast("date"),
                   F.lit("1970-01-01").cast("date"))
        .cast("long").alias("day")).distinct()
    cover = pairs.select(
        "user_id", F.explode(F.sequence(F.col("day"), F.col("day") + 29))
        .alias("window_end"))
    exact = (cover.join(ends, "window_end")
             .groupBy("window_end")
             .agg(F.countDistinct("user_id").alias("mau_exact")))
    return (exact.join(est_w, "window_end").join(est_j, "window_end")
            .select("window_end", "mau_exact",
                    _hll_within("est_w", "mau_exact")
                    .alias("within_envelope"),
                    (F.col("est_w") == F.col("est_j"))
                    .alias("window_merge_consistent")))


@q("median_interpolated", ("A1", "W1", "F7"), oracle="""
WITH t AS (
  SELECT l_returnflag AS grp,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v
  FROM lineitem
), h AS (SELECT grp, v, COUNT(*) AS c FROM t GROUP BY grp, v),
c AS (
  SELECT grp, v, SUM(c) OVER (PARTITION BY grp ORDER BY v) AS cum,
         SUM(c) OVER (PARTITION BY grp) AS n
  FROM h
)
SELECT grp, CAST(MAX(n) AS BIGINT) AS n,
       CAST(MIN(CASE WHEN cum >= (n + 1) // 2 THEN v END)
          + MIN(CASE WHEN cum >= (n + 2) // 2 THEN v END) AS BIGINT)
           AS median_2x_cent
FROM c GROUP BY grp
""")
def median_interpolated(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Interpolated (percentile_cont-style) median per group, held
    EXACT by reporting in doubled units: median_2x = lower-middle +
    upper-middle order statistic (equal for odd n, adjacent for even n
    — half their sum is the textbook interpolated median, and the sum
    itself is always an integer, so no float ever appears).

    Scale design: same histogram machinery as winsorized_stats /
    weighted_median — per-value counts map-side, grid-sized cumsum,
    and BOTH order statistics come from one pass as integer
    rank tests (cum ≥ (n+1)÷2 and cum ≥ (n+2)÷2).  This closes
    the percentile family: nearest-rank (curriculum_order), weighted
    (weighted_median), clipped (winsorized_stats), interpolated —
    all from one reusable histogram shape, none via percentile_cont
    float paths that cannot hash-match across engines.
    """
    li = load(spark, sf_dir, "lineitem")
    t = li.select(F.col("l_returnflag").alias("grp"),
                  F.round(F.col("l_extendedprice") * 100).cast("long")
                  .alias("v"))
    h = t.groupBy("grp", "v").agg(F.count("*").alias("c"))
    wcum = (W.partitionBy("grp").orderBy("v")
            .rowsBetween(W.unboundedPreceding, W.currentRow))
    c = h.select("grp", "v",
                 F.sum("c").over(wcum).alias("cum"),
                 F.sum("c").over(W.partitionBy("grp")).alias("n"))
    p1 = F.expr("(n + 1) div 2")      # lower-middle rank
    p2 = F.expr("(n + 2) div 2")      # upper-middle rank
    lo = F.min(F.when(F.col("cum") >= p1, F.col("v")))
    hi = F.min(F.when(F.col("cum") >= p2, F.col("v")))
    return (c.groupBy("grp")
            .agg(F.max("n").cast("long").alias("n"),
                 (lo + hi).cast("long").alias("median_2x_cent")))


# =========================================================================
# RFM segmentation ([EXT] — the classic CRM scoring matrix)
# =========================================================================

@q("rfm_segmentation", ("A1", "W1", "F7"), oracle="""
WITH mx AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS ref_date
            FROM orders),
base AS (
  SELECT o_custkey AS customer,
         datediff('day', MAX(CAST(o_orderdate AS DATE)),
                  (SELECT ref_date FROM mx)) AS recency_days,
         COUNT(*) AS frequency,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS monetary_cents
  FROM orders GROUP BY o_custkey
)
SELECT customer, CAST(recency_days AS BIGINT) AS recency_days,
       frequency, monetary_cents,
       CAST(6 - NTILE(5) OVER (ORDER BY recency_days, customer) AS BIGINT)
           AS r_score,
       CAST(NTILE(5) OVER (ORDER BY frequency, customer) AS BIGINT)
           AS f_score,
       CAST(NTILE(5) OVER (ORDER BY monetary_cents, customer) AS BIGINT)
           AS m_score
FROM base
""")
def rfm_segmentation(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """RFM scoring: per customer recency / frequency / monetary with
    1-5 quintile scores (5 = best; recency inverted) — the classic
    segmentation matrix behind retention campaigns, here as three
    NTILE windows over one aggregated base.

    Scale design: the base is ONE map-side-combined aggregation (one
    row per customer); each quintile comes from
    ``operators.prefix.global_ntile`` (range-partitioned rank +
    driver-folded offsets), so NO single-partition window exists even
    over a planet-scale customer base — three slim range shuffles of
    the per-customer relation, deterministic via the customer tiebreak
    (NTILE without a total order is not a function — same doctrine as
    mode's tie-break).  The scores are then broadcast-joinable back
    onto any fact table as features.
    """
    o = load(spark, sf_dir, "orders")
    mx = o.groupBy().agg(F.max(F.col("o_orderdate").cast("date"))
                         .alias("ref_date"))
    base = (o.groupBy(F.col("o_custkey").alias("customer"))
            .agg(F.max(F.col("o_orderdate").cast("date")).alias("last_d"),
                 F.count("*").alias("frequency"),
                 F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                 .cast("long").alias("monetary_cents"))
            .join(F.broadcast(mx))
            .select("customer",
                    F.datediff("ref_date", "last_d").cast("long")
                    .alias("recency_days"),
                    "frequency", "monetary_cents"))
    base = global_ntile(base, [F.col("recency_days"), F.col("customer")],
                        5, "_rt")
    base = global_ntile(base, [F.col("frequency"), F.col("customer")],
                        5, "_ft")
    base = global_ntile(base, [F.col("monetary_cents"), F.col("customer")],
                        5, "_mt")
    return base.select("customer", "recency_days", "frequency",
                       "monetary_cents",
                       (6 - F.col("_rt")).cast("long").alias("r_score"),
                       F.col("_ft").cast("long").alias("f_score"),
                       F.col("_mt").cast("long").alias("m_score"))


# =========================================================================
# ABC / Pareto classification ([EXT])
# =========================================================================

@q("abc_pareto_classification", ("A1", "W1"), oracle="""
WITH rev AS (
  SELECT l_partkey AS part,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents
  FROM lineitem GROUP BY l_partkey
), c AS (
  SELECT part, revenue_cents,
         SUM(revenue_cents) OVER (ORDER BY revenue_cents DESC, part)
             AS cum,
         SUM(revenue_cents) OVER () AS tot
  FROM rev
)
SELECT part, revenue_cents,
       CASE WHEN cum * 100 <= tot * 80 THEN 'A'
            WHEN cum * 100 <= tot * 95 THEN 'B'
            ELSE 'C' END AS abc_class
FROM c
""")
def abc_pareto_classification(spark: "SparkSession",
                              sf_dir: str) -> "DataFrame":
    """ABC (Pareto) classification of parts by revenue: class A covers
    the first 80% of cumulative revenue, B the next 15%, C the tail —
    the inventory-prioritization classic, with the 80/95 boundaries as
    integer cross-multiplications (cum·100 ≤ tot·80) so no float share
    ever decides a class.

    Scale design: per-part revenue map-side combines; the ranking
    cumsum runs over the PART-cardinality relation (the distinct-key
    doctrine again) via ``operators.prefix.ranged_prefix`` — the
    two-level prefix sum the old docstring only promised: range-
    partitioned local cumsums + driver-folded bucket offsets, so no
    single-partition window exists at ANY catalog size; the grand
    total rides back as a literal instead of a second global window.
    The fact volume never touches the window either way.
    """
    li = load(spark, sf_dir, "lineitem")
    rev = (li.groupBy(F.col("l_partkey").alias("part"))
           .agg(F.sum(F.round(F.col("l_extendedprice") * 100)
                      .cast("long")).cast("long").alias("revenue_cents")))
    c, totals = ranged_prefix(
        rev, [F.col("revenue_cents").desc(), F.col("part")],
        sums={"cum": "revenue_cents"})
    tot = F.lit(totals["cum"]).cast("long")
    return c.select(
        "part", "revenue_cents",
        F.when(F.col("cum") * 100 <= tot * 80, "A")
         .when(F.col("cum") * 100 <= tot * 95, "B")
         .otherwise("C").alias("abc_class"))


# =========================================================================
# New vs returning users per day ([EXT] — growth accounting)
# =========================================================================

@q("new_vs_returning_daily", ("A1", "W1"), oracle="""
WITH f AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day FROM events
  GROUP BY user_id
), act AS (
  SELECT DISTINCT e.user_id, CAST(e.ts AS DATE) AS day, f.first_day
  FROM events e JOIN f ON e.user_id = f.user_id
)
SELECT day,
       CAST(SUM(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT)
           AS new_users,
       CAST(SUM(CASE WHEN day <> first_day THEN 1 ELSE 0 END) AS BIGINT)
           AS returning_users
FROM act GROUP BY day
""")
def new_vs_returning_daily(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Growth accounting: per day, how many active users were NEW
    (first-ever activity) vs RETURNING — the decomposition every
    growth dashboard leads with, and the input to quick-ratio metrics.

    Scale design: first-touch day is a per-user window MIN over the
    same user_id shuffle the activity-dedup DISTINCT reuses (one
    exchange total, the cohort_retention pattern); the final aggregate
    is calendar-sized.  No join against a separate first-seen table —
    at 100 TB the windowed one-pass form wins until cohorts live in a
    different store.
    """
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id")
    d = F.col("ts").cast("date")
    act = (e.select("user_id", d.alias("day"),
                    F.min(d).over(w).alias("first_day"))
           .distinct())
    return (act.groupBy("day")
            .agg(F.sum(F.when(F.col("day") == F.col("first_day"), 1)
                       .otherwise(0)).cast("long").alias("new_users"),
                 F.sum(F.when(F.col("day") != F.col("first_day"), 1)
                       .otherwise(0)).cast("long")
                 .alias("returning_users")))


# =========================================================================
# Weekday seasonality index ([EXT] — multiplicative seasonal factors)
# =========================================================================

@q("weekday_seasonality", ("A1", "F7"), oracle="""
WITH d AS (
  SELECT CAST(l_shipdate AS DATE) AS day,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS rev
  FROM lineitem GROUP BY 1
), w AS (
  SELECT dayofweek(day) AS dow, CAST(SUM(rev) AS BIGINT) AS rev,
         CAST(COUNT(*) AS BIGINT) AS n_days
  FROM d GROUP BY 1
), g AS (SELECT CAST(SUM(rev) AS BIGINT) AS tot,
                CAST(SUM(n_days) AS BIGINT) AS nd FROM w)
SELECT CAST(dow AS BIGINT) AS dow, rev, n_days,
       CAST((CAST(rev AS HUGEINT) * g.nd * 1000)
            // (CAST(g.tot AS HUGEINT) * n_days)
            AS BIGINT) AS seasonal_milli
FROM w CROSS JOIN g
""")
def weekday_seasonality(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Multiplicative day-of-week seasonal index for shipped revenue:
    factor = (mean revenue on weekday d) / (overall daily mean), in
    integer milli so 1000 = no seasonality — the decomposition step
    before any forecast (ewma_forecast deliberately smooths THROUGH
    seasonality; this factors it out).

    Scale design: two nested map-side-combined aggregations (day grain
    then weekday grain — 7 cells), totals broadcast; the factor is one
    integer cross-multiplied floor division, no float shares.  DOW
    numbering: Spark dayofweek ≡ DuckDB dayofweek+1 — aligned
    explicitly below rather than trusting either default.
    """
    li = load(spark, sf_dir, "lineitem")
    d = (li.groupBy(F.col("l_shipdate").cast("date").alias("day"))
         .agg(F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
              .cast("long").alias("rev")))
    # DuckDB dayofweek: 0=Sunday..6; Spark dayofweek: 1=Sunday..7
    wk = (d.groupBy((F.dayofweek("day") - 1).cast("long").alias("dow"))
          .agg(F.sum("rev").cast("long").alias("rev"),
               F.count("*").cast("long").alias("n_days")))
    g = wk.groupBy().agg(F.sum("rev").cast("long").alias("tot"),
                         F.sum("n_days").cast("long").alias("nd"))
    # the cross-multiplication runs in 128-bit (Spark DECIMAL(38,0)
    # IntegralDivide ≡ DuckDB HUGEINT //, both exact and positive so
    # truncation == floor): rev·nd·1000 in CENTS overflows int64 once
    # the corpus grows ~10× past sf0.1 — caught by the ×10-replica
    # oracle sweep as a live ARITHMETIC_OVERFLOW
    return (wk.join(F.broadcast(g))
            .selectExpr("dow", "rev", "n_days",
                        "CAST((CAST(rev AS DECIMAL(38,0)) * nd * 1000)"
                        " div (CAST(tot AS DECIMAL(38,0)) * n_days)"
                        " AS BIGINT) AS seasonal_milli"))


@q("gini_concentration", ("A1", "W1", "F7"), oracle="""
WITH s AS (
  SELECT CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS spend
  FROM orders GROUP BY o_custkey
), r AS (
  SELECT spend,
         ROW_NUMBER() OVER (ORDER BY spend) AS i,
         COUNT(*) OVER () AS n,
         SUM(spend) OVER () AS tot
  FROM s
)
SELECT CAST(MAX(n) AS BIGINT) AS n_customers,
       CAST(MAX(tot) AS BIGINT) AS total_cents,
       CAST(ROUND((2 * CAST(SUM(CAST(i AS DECIMAL(38,0)) * spend)
                            AS DOUBLE)
                   - (MAX(n) + 1) * CAST(MAX(tot) AS DOUBLE))
                  / (MAX(n) * CAST(MAX(tot) AS DOUBLE)) * 1e6)
            AS BIGINT) AS gini_ppm
FROM r
""")
def gini_concentration(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Gini coefficient of customer spend concentration, exact:
    G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx) over the spend-sorted
    sequence, in integer ppm — the single-number companion to the ABC
    curve and skew_profile's entropy (0 = equal, →1 = one whale).

    Scale design: per-customer spend map-side combines; the rank
    comes from ``operators.prefix.ranged_prefix`` (range-partitioned
    local row_numbers + driver-folded offsets — no single-partition
    window over the CUSTOMER-sized relation), with the customer key as
    the bucketing tiebreak; ties resolve identically on both engines
    because equal spends contribute the same Σ i·x regardless of
    order — the formula is tie-invariant.  n and Σx come from the
    final 1-row aggregate (which collapses the relation anyway).  All
    integer until the final ppm floor division.
    """
    o = load(spark, sf_dir, "orders")
    s = (o.groupBy("o_custkey")
         .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
              .cast("long").alias("spend")))
    ranked, _ = ranged_prefix(
        s, [F.col("spend"), F.col("o_custkey")], rank_col="i")
    return (ranked
            .groupBy()
            .agg(F.count("*").cast("long").alias("n_customers"),
                 F.sum("spend").cast("long").alias("total_cents"),
                 F.sum(F.col("i").cast("decimal(38,0)") * F.col("spend"))
                 .cast("double").alias("iws"))
            .select("n_customers", "total_cents",
                    F.round((2 * F.col("iws")
                             - (F.col("n_customers") + 1)
                             * F.col("total_cents").cast("double"))
                            / (F.col("n_customers")
                               * F.col("total_cents").cast("double"))
                            * 1e6).cast("long").alias("gini_ppm")))


@q("skew_salted_join", ("J1", "A1"), oracle=f"""
SELECT o.o_orderpriority AS priority,
       COUNT(*) AS n_items,
       {osum('l.l_quantity')} AS sum_qty
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1
""")
def skew_salted_join(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Salted fact⋈dim join (operators/skew.py:salted_join): the fact
    side gets a uniform random salt, the dim side explodes ×salts, and
    the equi-join runs on (key, salt) — splitting any hot key across
    ``salts`` reducers.  The oracle is the PLAIN join: salting must be
    semantically invisible (rand() affects placement, never results),
    which is exactly what this gate certifies.  Production stance: AQE
    skew-join handles moderate skew automatically; explicit salting is
    for the pathological hot-row case AQE cannot split (single giant
    key inside one row group) — same plan shape either way."""
    from .operators.skew import salted_join
    from .queries import dsum
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority")
    joined = salted_join(li, o, key="l_orderkey", salts=8)
    return (joined.groupBy(F.col("o_orderpriority").alias("priority"))
            .agg(F.count(F.lit(1)).alias("n_items"),
                 dsum("l_quantity").alias("sum_qty")))


@q("collation_casefold_group", ("A1", "F3"), oracle="""
SELECT min(c_mktsegment) AS segment, COUNT(*) AS n
FROM (SELECT CASE WHEN c_custkey % 2 = 0 THEN c_mktsegment
                  ELSE lower(c_mktsegment) END AS c_mktsegment
      FROM customer)
GROUP BY lower(c_mktsegment)
""")
def collation_casefold_group(spark: "SparkSession",
                             sf_dir: str) -> "DataFrame":
    """Case-insensitive grouping via Spark 4 COLLATIONS
    (`collate(col, 'UTF8_LCASE')`): the mixed-case segment labels
    (synthesized deterministically: even keys keep original case, odd
    keys lowercase) group together WITHOUT materializing a lowercased
    key column — the collation rides the type, so every comparison,
    join and sort downstream inherits case-insensitivity.  The emitted
    representative is min(raw) because the collated group's own
    representative value is engine-arbitrary; the oracle restates with
    GROUP BY lower().  At 100 TB this replaces a whole class of
    lower()-wrapper columns (and their lost scan-stat pruning)."""
    c = load(spark, sf_dir, "customer")
    mixed = c.select(
        F.when(F.col("c_custkey") % 2 == 0, F.col("c_mktsegment"))
        .otherwise(F.lower("c_mktsegment")).alias("seg"))
    return (mixed.groupBy(F.collate("seg", "UTF8_LCASE"))
            .agg(F.min("seg").alias("segment"),
                 F.count(F.lit(1)).alias("n"))
            .select("segment", "n"))


@q("unpivot_metric_melt", ("P2", "A1"), oracle="""
SELECT metric, COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(val * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM (
  SELECT 'acctbal' AS metric, c_acctbal AS val FROM customer
  UNION ALL
  SELECT 'custkey_mod' AS metric,
         CAST(c_custkey % 1000 AS DOUBLE) AS val FROM customer
)
GROUP BY 1
""")
def unpivot_metric_melt(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Wide→long melt via the native `DataFrame.unpivot` (ANSI UNPIVOT
    — the inverse of pivot_type_counts): per-metric long rows feed one
    grouped aggregate.  Unpivot is an Expand under the hood (one pass,
    rows × metrics output, no shuffle before the aggregate) — the
    right shape for metric-catalog fan-out at scale, vs K self-reads."""
    c = load(spark, sf_dir, "customer")
    wide = c.select(
        "c_custkey",
        F.col("c_acctbal").alias("acctbal"),
        (F.col("c_custkey") % 1000).cast("double").alias("custkey_mod"))
    long = wide.unpivot("c_custkey", ["acctbal", "custkey_mod"],
                        "metric", "val")
    return (long.groupBy("metric")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.round(F.col("val") * 100).cast("long"))
                 .cast("long").alias("sum_cents")))


@q("listagg_ordered_concat", ("A1", "F3"), oracle="""
SELECT n.n_name AS nation,
       string_agg(DISTINCT c.c_mktsegment, '|' ORDER BY c.c_mktsegment)
         AS segments,
       COUNT(*) AS n_customers
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY 1
""")
def listagg_ordered_concat(spark: "SparkSession",
                           sf_dir: str) -> "DataFrame":
    """Ordered string aggregation via Spark 4's ANSI `LISTAGG ...
    WITHIN GROUP` — deterministic BECAUSE of the mandatory ordering
    (an unordered collect_list + concat varies with partitioning and
    could never sit under a hash gate).  DISTINCT + ORDER BY inside
    one aggregate; the result column is the classic "which segments
    does each nation span" report cell."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return (c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
            .groupBy(F.col("n_name").alias("nation"))
            .agg(F.expr("listagg(DISTINCT c_mktsegment, '|') "
                        "WITHIN GROUP (ORDER BY c_mktsegment)")
                 .alias("segments"),
                 F.count(F.lit(1)).alias("n_customers")))


@q("try_functions_dirty_cast", ("P7", "F1"), oracle="""
SELECT COUNT(*) AS n_rows,
       COUNT(TRY_CAST(json_extract_string(props, '$.k') AS INT))
         AS n_castable,
       CAST(SUM(CASE WHEN CAST(json_extract_string(props, '$.k') AS INT)
                          % 10 = 0
                     THEN NULL
                     ELSE (CAST(json_extract_string(props, '$.k') AS INT)
                           * 100)
                       / NULLIF(CAST(json_extract_string(props, '$.k')
                                     AS INT) % 10, 0) END)
         AS BIGINT) AS sum_ratio
FROM events
""")
def try_functions_dirty_cast(spark: "SparkSession",
                             sf_dir: str) -> "DataFrame":
    """ANSI-mode-safe dirty-data arithmetic: ``try_cast`` instead of a
    crash on malformed input and ``try_divide`` instead of a
    divide-by-zero failure — the functions that let a 100 TB pipeline
    run with ANSI SQL semantics ON (Spark 4's default) without
    wrapping every expression in CASE.  Zero divisors yield NULL and
    drop out of the SUM, matching the oracle's NULLIF restatement."""
    e = load(spark, sf_dir, "events")
    k = F.expr("try_cast(get_json_object(props, '$.k') as int)")
    return e.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(k).alias("n_castable"),
        F.sum(F.try_divide(k * 100, k % 10)).cast("long").alias("sum_ratio"))
