"""Behavioral / event-sequence analytics over the ``events`` table:
funnel conversion, cohort retention, transition matrices, exact heavy
hitters, and distribution-rank windows.

The reference's README positions the lake as the substrate for device
*and* user analytics (``README_DBT.md:189-206`` — ``agg_customer_summary``,
device health scores); these queries are the event-sequence shapes that
layer on the same silver events stream.  All stay fully JVM-side.

Scale stance (100 TB): every query here shuffles at most on
``user_id`` (high cardinality, near-uniform — the natural partition key
for behavioral data) or on a low-cardinality grouping whose result is
tiny.  Nothing materializes per-pair state, nothing collects to the
driver, and the single-row "total" sides of ratio computations are
broadcast, never recomputed per row via a global window.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .functions.units import to_units
from .queries import load, q

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession


# =========================================================================
# Funnel conversion — ordered multi-stage min-timestamp chain
# =========================================================================

@q("funnel_conversion", ("A1", "W1", "F7"), oracle="""
WITH s AS (
  SELECT user_id, MIN(ts) AS signup_ts
  FROM events WHERE event_type = 'signup' GROUP BY 1
), v AS (
  SELECT e.user_id, MIN(e.ts) AS view_ts
  FROM events e JOIN s ON e.user_id = s.user_id AND e.ts > s.signup_ts
  WHERE e.event_type = 'view' GROUP BY 1
), p AS (
  SELECT e.user_id, MIN(e.ts) AS purchase_ts
  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.view_ts
  WHERE e.event_type = 'purchase' GROUP BY 1
)
SELECT (SELECT COUNT(*) FROM s) AS n_signup,
       (SELECT COUNT(*) FROM v) AS n_view_after,
       (SELECT COUNT(*) FROM p) AS n_purchase_after
""")
def funnel_conversion(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Ordered funnel signup → view → purchase: a user advances a stage
    only with an event strictly AFTER their previous stage's first
    event.  Implemented as one shuffle on ``user_id``: stage timestamps
    are per-user window minima computed sequentially over the same
    partitioning (no joins, no re-shuffle — each ``withColumn`` reuses
    the exchange), then a single global count.  At 100 TB the events
    scan dominates; per-user state is three timestamps."""
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id")
    ts, et = F.col("ts"), F.col("event_type")
    e = e.withColumn(
        "signup_ts", F.min(F.when(et == "signup", ts)).over(w))
    e = e.withColumn(
        "view_ts", F.min(F.when((et == "view") &
                                (ts > F.col("signup_ts")), ts)).over(w))
    e = e.withColumn(
        "purchase_ts", F.min(F.when((et == "purchase") &
                                    (ts > F.col("view_ts")), ts)).over(w))
    return e.agg(
        F.count_distinct(
            F.when(F.col("signup_ts").isNotNull(), F.col("user_id")))
         .alias("n_signup"),
        F.count_distinct(
            F.when(F.col("view_ts").isNotNull(), F.col("user_id")))
         .alias("n_view_after"),
        F.count_distinct(
            F.when(F.col("purchase_ts").isNotNull(), F.col("user_id")))
         .alias("n_purchase_after"))


# =========================================================================
# Cohort retention — first-touch cohort × week-offset activity matrix
# =========================================================================

@q("cohort_retention", ("A1", "W1", "F2"), oracle="""
WITH f AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
  FROM events GROUP BY 1
), a AS (
  SELECT DISTINCT e.user_id, f.cohort_day,
         CAST(FLOOR(date_diff('day', f.cohort_day, CAST(e.ts AS DATE))
                    / 7) AS BIGINT) AS week_offset
  FROM events e JOIN f ON e.user_id = f.user_id
)
SELECT cohort_day, week_offset, COUNT(*) AS n_users
FROM a GROUP BY 1, 2
""")
def cohort_retention(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Classic retention triangle: users bucketed by first-activity day
    (cohort), counted once per (cohort, weeks-since-cohort) cell.  The
    cohort day is a per-user window MIN over the same ``user_id``
    shuffle that the de-dup DISTINCT then reuses; the final aggregate's
    key space (days × weeks) is tiny, so its shuffle is negligible.
    At 100 TB: no join against a first-touch table is needed — the
    window form keeps it one pass — but if cohorts were computed from a
    different (smaller) stream, the two-phase agg + shuffle-join on
    user_id is the fallback shape."""
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id")
    d = F.col("ts").cast("date")
    cohort = F.min(d).over(w)
    return (e.select(
                F.col("user_id"),
                cohort.alias("cohort_day"),
                F.floor(F.datediff(d, cohort) / 7).cast("bigint")
                 .alias("week_offset"))
            .distinct()
            .groupBy("cohort_day", "week_offset")
            .agg(F.count(F.lit(1)).alias("n_users")))


# =========================================================================
# Event-type transition matrix — per-user consecutive-pair counts
# =========================================================================

@q("event_transition_matrix", ("W1", "A1"), oracle="""
WITH pairs AS (
  SELECT event_type AS from_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS to_type
  FROM events
), cnt AS (
  SELECT from_type, to_type, COUNT(*) AS n
  FROM pairs WHERE to_type IS NOT NULL GROUP BY 1, 2
)
SELECT from_type, to_type, n,
       CAST(n AS DOUBLE) /
         CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
FROM cnt
""")
def event_transition_matrix(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """First-order Markov transition matrix of event types: LEAD over
    each user's timeline, pair counts, and a row-normalized probability.
    One shuffle on ``user_id`` for the LEAD; the pair-count aggregate
    collapses to |types|² rows, so the normalizing window (partitioned
    by ``from_type``) runs on a trivially small relation — the
    anti-pattern to avoid at scale is the reverse order, normalizing
    over the raw pair stream."""
    e = load(spark, sf_dir, "events")
    seq = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = e.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(seq).alias("to_type"))
    cnt = (pairs.filter(F.col("to_type").isNotNull())
           .groupBy("from_type", "to_type")
           .agg(F.count(F.lit(1)).alias("n")))
    norm = W.partitionBy("from_type")
    # raw exact-int quotient (no ROUND) — cross-engine boundary hazard
    return cnt.withColumn(
        "p", F.col("n").cast("double") /
             F.sum("n").over(norm).cast("double"))


# =========================================================================
# Exact heavy hitters — support-threshold frequent items
# =========================================================================

@q("heavy_hitters_exact", ("A1", "A8", "P6"), oracle="""
SELECT l_partkey AS item, COUNT(*) AS cnt
FROM lineitem
GROUP BY 1
HAVING COUNT(*) * 1500 > (SELECT COUNT(*) FROM lineitem)
""")
def heavy_hitters_exact(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Items whose support exceeds 1/1500 of the stream — the exact
    answer a Misra-Gries / count-min sketch approximates.  Shape: one
    map-side-combined count aggregate (shuffle carries ≤ |items| partial
    counts per task, not rows), and the scalar total arrives as a
    broadcast single-row cross join — NOT a global window over the
    counts, which would funnel every item through one partition.  This
    two-agg + broadcast shape is exactly how the threshold generalizes
    to 100 TB; the sketch variant only becomes necessary when the
    distinct-item space itself cannot be shuffled."""
    li = load(spark, sf_dir, "lineitem")
    counts = (li.groupBy(F.col("l_partkey").alias("item"))
              .agg(F.count(F.lit(1)).alias("cnt")))
    total = li.agg(F.count(F.lit(1)).alias("_total"))
    return (counts.crossJoin(F.broadcast(total))
            .filter(F.col("cnt") * 1500 > F.col("_total"))
            .select("item", "cnt"))


# =========================================================================
# Distribution ranks — PERCENT_RANK / CUME_DIST per segment
# =========================================================================

@q("percent_rank_segment", ("W3", "A7"), oracle="""
SELECT c_custkey AS customer, c_mktsegment AS segment,
       PERCENT_RANK() OVER w AS pr,
       CUME_DIST() OVER w AS cd
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal)
""")
def percent_rank_segment(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Within-segment account-balance percentile of every customer
    (PERCENT_RANK + CUME_DIST — rank-based, so ties are deterministic
    without a tiebreaker column).  One shuffle on the segment key; at
    100 TB a 5-value segment key is skew-prone, so the scale path
    pre-aggregates by (segment, balance) first or uses ntile over a
    salted two-level rank — noted here because the naive form is fine
    only while per-segment rows fit one task's sort."""
    c = load(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal")
    return c.select(
        F.col("c_custkey").alias("customer"),
        F.col("c_mktsegment").alias("segment"),
        # raw (rank−1)/(n−1) and rank/n quotients of exact ints — bit-
        # identical across engines; ROUND(q, 6) carried the HALF_UP
        # boundary hazard
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"))


# =========================================================================
# Next-event training pairs ([EXT] — sequence-dataset construction)
# =========================================================================

@q("next_event_training_pairs", ("W1", "F9"), oracle="""
SELECT user_id, event_id,
       concat_ws(',',
         LAG(event_type, 3) OVER w,
         LAG(event_type, 2) OVER w,
         LAG(event_type, 1) OVER w) AS history,
       event_type AS label
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
QUALIFY LAG(event_type, 1) OVER w IS NOT NULL
""")
def next_event_training_pairs(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Sequence-model dataset construction: for every event with at
    least one predecessor, (history = up to 3 previous event types,
    label = the event's own type) — the supervised next-action shape
    behind session-based recommenders and next-token-style behavioral
    models.

    Scale design: pure offset windows over ONE user_id shuffle — no
    self-joins, no collect_list of unbounded sessions; history width is
    a constant, so row width is bounded and the dataset is exactly
    |events with a predecessor| rows.  concat_ws skips the NULLs of
    short heads identically on both engines, so sequence starts need no
    special-casing.  Longer horizons stay O(k) lag columns; a variable-
    length variant would switch to the rows-frame collect_list window.
    """
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    lag = lambda k: F.lag("event_type", k).over(w)  # noqa: E731
    return (e.select("user_id", "event_id",
                     F.concat_ws(",", lag(3), lag(2), lag(1)).alias("history"),
                     F.col("event_type").alias("label"),
                     lag(1).alias("_p"))
            .filter(F.col("_p").isNotNull())
            .drop("_p"))


# =========================================================================
# Frequent event trigrams ([EXT] — sequential pattern mining)
# =========================================================================

@q("event_trigram_patterns", ("W1", "A1"), oracle="""
WITH g AS (
  SELECT event_type || '>' || LEAD(event_type, 1) OVER w
             || '>' || LEAD(event_type, 2) OVER w AS trigram
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
  QUALIFY LEAD(event_type, 2) OVER w IS NOT NULL
)
SELECT trigram, COUNT(*) AS n
FROM g GROUP BY trigram
ORDER BY n DESC, trigram LIMIT 50
""")
def event_trigram_patterns(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Top-50 most frequent 3-step behavior paths — the order-3
    extension of event_transition_matrix's bigrams, i.e. sequential
    pattern mining at fixed depth (the practical core of SPADE-style
    miners: almost all signal is in short patterns).

    Scale design: LEAD offsets assemble trigrams inside the SAME
    user_id shuffle the other behavioral queries use — no self-joins
    (the classic trigram formulation is events⋈events⋈events; offset
    windows make it one pass).  The trigram-count agg map-side
    combines to ≤|types|³ cells, and the final top-50 is
    TakeOrderedAndProject.  Deeper patterns stay O(depth) lag columns,
    never a join chain.
    """
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    t1 = F.lead("event_type", 1).over(w)
    t2 = F.lead("event_type", 2).over(w)
    g = (e.select(F.concat_ws(">", F.col("event_type"), t1, t2)
                  .alias("trigram"), t2.alias("_t2"))
         .filter(F.col("_t2").isNotNull()))
    return (g.groupBy("trigram").agg(F.count("*").alias("n"))
            .orderBy(F.col("n").desc(), "trigram").limit(50))


# =========================================================================
# Conversion rate with Wilson interval ([EXT] — experimentation)
# =========================================================================

@q("conversion_rate_wilson", ("A1", "W1", "F7"), oracle="""
WITH u AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN ts END) AS signup_ts,
         MAX(CASE WHEN event_type = 'purchase' THEN ts END)
             AS last_purchase_ts
  FROM events GROUP BY user_id
), s AS (
  SELECT CAST(DATE_TRUNC('week', signup_ts) AS TIMESTAMP) AS signup_week,
         CASE WHEN last_purchase_ts > signup_ts THEN 1 ELSE 0 END AS conv
  FROM u WHERE signup_ts IS NOT NULL
), g AS (
  SELECT signup_week, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(conv) AS BIGINT) AS k
  FROM s GROUP BY signup_week
)
SELECT signup_week, n, k,
       CAST(k * 1000000 // n AS BIGINT) AS rate_ppm,
       GREATEST(0, CAST(floor(((CAST(k AS DOUBLE) / n
                 + (1.96::DOUBLE * 1.96::DOUBLE)
                 / (2 * CAST(n AS DOUBLE)))
              - 1.96::DOUBLE * SQRT((CAST(k AS DOUBLE) / n)
                  * (1 - CAST(k AS DOUBLE) / n) / CAST(n AS DOUBLE)
                  + (1.96::DOUBLE * 1.96::DOUBLE)
                    / (4 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
             / (1 + (1.96::DOUBLE * 1.96::DOUBLE) / CAST(n AS DOUBLE))
             * 1e9) AS BIGINT)) AS wilson_lo_nano,
       LEAST(1000000000, CAST(floor(((CAST(k AS DOUBLE) / n
                 + (1.96::DOUBLE * 1.96::DOUBLE)
                 / (2 * CAST(n AS DOUBLE)))
              + 1.96::DOUBLE * SQRT((CAST(k AS DOUBLE) / n)
                  * (1 - CAST(k AS DOUBLE) / n) / CAST(n AS DOUBLE)
                  + (1.96::DOUBLE * 1.96::DOUBLE)
                    / (4 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
             / (1 + (1.96::DOUBLE * 1.96::DOUBLE) / CAST(n AS DOUBLE))
             * 1e9) AS BIGINT)) AS wilson_hi_nano
FROM g
""")
def conversion_rate_wilson(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Signup→purchase conversion rate per signup week with the Wilson
    95% score interval — the uncertainty-aware form of the funnel
    metric (a 3/4 cohort and a 3000/4000 cohort have the same point
    rate and very different intervals; dashboards that omit the
    interval invite bad ship decisions).  Bounds are emitted in
    integer nano-units (floor(x·1e9), BIGINT).

    Scale design: one conditional-aggregation pass per user (map-side
    combined on user_id — the same shuffle every behavioral query
    uses), then a week-cardinality-sized group stage; the interval is
    per-group constant double work from integer (n, k), identical
    expression tree both engines (z pinned to 1.96 as a DOUBLE
    literal).  Mergeable: per-shard (n, k) pairs add.
    """
    e = load(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts")))
        .alias("signup_ts"),
        F.max(F.when(F.col("event_type") == "purchase", F.col("ts")))
        .alias("last_purchase_ts"))
    s = (u.filter(F.col("signup_ts").isNotNull())
         .select(F.date_trunc("week", "signup_ts").alias("signup_week"),
                 F.when(F.col("last_purchase_ts") > F.col("signup_ts"), 1)
                 .otherwise(0).alias("conv")))
    g = s.groupBy("signup_week").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("conv").cast("long").alias("k"))
    z = 1.96
    n, k = F.col("n").cast("double"), F.col("k").cast("double")
    p = k / F.col("n")
    center = p + (z * z) / (2 * n)
    half = z * F.sqrt(p * (1 - p) / n + (z * z) / (4 * n * n))
    denom = 1 + (z * z) / n
    return g.select(
        "signup_week", "n", "k",
        F.expr("k * 1000000 div n").alias("rate_ppm"),
        # interval bounds in integer NANO-UNITS (floor(x*1e9)) — the
        # repo determinism recipe; fractional ROUND(x, 9) was the
        # HALF_UP cross-engine hazard.  Bounds are finite for n ≥ 1.
        # Clamped to [0, 1e9]: at k=0 (and symmetrically k=n) the true
        # bound is exactly 0 (resp. 1) but float noise can land a few
        # ulps past it, making the floor -1 / 1e9+… — a nonsensical
        # probability bound.  Same clamp on both engines.
        F.greatest(F.lit(0).cast("long"),
                   to_units((center - half) / denom, 9))
        .alias("wilson_lo_nano"),
        F.least(F.lit(1_000_000_000).cast("long"),
                to_units((center + half) / denom, 9))
        .alias("wilson_hi_nano"))


# =========================================================================
# Kaplan–Meier survival curve ([EXT] — time-to-churn)
# =========================================================================

_KM = dict(censor_days=7)


@q("kaplan_meier_churn", ("A1", "W1", "F7"), oracle=f"""
WITH span AS (SELECT MAX(ts) AS tmax FROM events),
u AS (
  SELECT user_id,
         datediff('day', MIN(ts), MAX(ts)) AS dur,
         CASE WHEN datediff('day', MAX(ts), (SELECT tmax FROM span))
                   < {_KM['censor_days']} THEN 0 ELSE 1 END AS died
  FROM events GROUP BY user_id
), grid AS (
  SELECT dur, CAST(SUM(died) AS BIGINT) AS d,
         CAST(COUNT(*) AS BIGINT) AS leaving
  FROM u GROUP BY dur
), risk AS (
  SELECT dur, d,
         CAST(SUM(leaving) OVER (ORDER BY dur DESC) AS BIGINT) AS n_risk
  FROM grid
)
SELECT dur AS day, d AS deaths, n_risk,
       CAST(SUM(CASE WHEN d > 0 THEN CAST(ROUND(
           LN((CAST(n_risk AS DOUBLE) - d) / n_risk) * 1e9) AS BIGINT)
           ELSE 0 END) OVER (ORDER BY dur) AS BIGINT) AS ln_survival_nano
FROM risk
WHERE n_risk > d
ORDER BY day
""")
def kaplan_meier_churn(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Kaplan–Meier survival curve for user lifetime (first→last event,
    right-censored when the user was still active in the final
    {censor_days} days): S(t) = Π_(s≤t) (1 − d_s/n_s), carried in LOG
    space as an integer-nano cumulative sum — the estimator behind
    churn/retention curves, done distributed and bit-deterministically.

    Scale design: the product over risk sets factorizes into per-user
    aggregation (one user_id shuffle), a DAY-grid histogram (bounded
    by the calendar, not by users — the KS/count-min distinct-key move
    again), a reverse cumsum for n_at_risk and a forward cumsum for
    ln S, both over the tiny grid.  Each ln term is rounded to int64
    nanos BEFORE the cumulative sum, so the running product is exact
    integer arithmetic — no float accumulation across the curve, and
    per-shard curves can be re-derived by merging the (dur, d, leaving)
    histograms.  Rows where the risk set would hit zero are the curve's
    terminal point (S=0, ln S=−∞) and are excluded by definition.
    """
    e = load(spark, sf_dir, "events")
    span = e.groupBy().agg(F.max("ts").alias("tmax"))
    u = (e.groupBy("user_id")
         .agg(F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts"))
         .join(F.broadcast(span))
         .select(F.datediff(F.col("last_ts"), F.col("first_ts"))
                 .alias("dur"),
                 F.when(F.datediff(F.col("tmax"), F.col("last_ts"))
                        < _KM["censor_days"], 0).otherwise(1).alias("died")))
    grid = u.groupBy("dur").agg(F.sum("died").cast("long").alias("d"),
                                F.count("*").cast("long").alias("leaving"))
    w_rev = (W.orderBy(F.col("dur").desc())
             .rowsBetween(W.unboundedPreceding, W.currentRow))
    risk = grid.select("dur", "d",
                       F.sum("leaving").over(w_rev).cast("long")
                       .alias("n_risk"))
    term = F.when(F.col("d") > 0, F.round(
        F.log((F.col("n_risk").cast("double") - F.col("d")) /
              F.col("n_risk")) * 1e9).cast("long")).otherwise(F.lit(0))
    w_fwd = (W.orderBy("dur")
             .rowsBetween(W.unboundedPreceding, W.currentRow))
    return (risk.filter(F.col("n_risk") > F.col("d"))
            .select(F.col("dur").cast("long").alias("day"),
                    F.col("d").alias("deaths"),
                    "n_risk",
                    F.sum(term).over(w_fwd).cast("long")
                    .alias("ln_survival_nano")))


# =========================================================================
# Sliding weekly active users ([EXT] — the WAU metric, exact)
# =========================================================================

@q("weekly_active_users", ("A6", "A2", "W1"), oracle="""
WITH pairs AS (
  SELECT DISTINCT user_id,
         CAST(datediff('day', DATE '1970-01-01',
                       CAST(ts AS DATE)) AS BIGINT) AS day
  FROM events
), bounds AS (SELECT MAX(day) AS max_day FROM pairs),
cover AS (
  SELECT p.user_id, p.day + o.off AS window_end
  FROM pairs p
  CROSS JOIN (SELECT UNNEST(range(7)) AS off) o
)
SELECT window_end, COUNT(DISTINCT user_id) AS wau
FROM cover CROSS JOIN bounds
WHERE window_end <= bounds.max_day
GROUP BY window_end
""")
def weekly_active_users(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Exact sliding 7-day active users for every day — the WAU curve,
    the one sliding-window metric a simple tumbling rollup cannot give
    (a user active Mon and Sun counts once in every window that spans
    both).

    Scale design: the standard exact decomposition — reduce events to
    DISTINCT (user, day) pairs first (map-side combined; this is the
    small relation: activity, not events), then each pair COVERS the 7
    window-ends it contributes to (a constant ×7 explode of the pair
    relation), and the per-window COUNT(DISTINCT) dedups users who
    were active on several days of the same window.  Cost scales with
    active-pairs × window-size, independent of raw event volume.  When
    ×7 is too much (90-day MAU), the sketch route replaces the explode:
    per-day HLL sketches union-merged over the window —
    streaming_hll_rollup is exactly that machinery.
    """
    e = load(spark, sf_dir, "events")
    pairs = (e.select("user_id",
                      F.datediff(F.col("ts").cast("date"),
                                 F.lit("1970-01-01").cast("date"))
                      .cast("long").alias("day"))
             .distinct())
    bounds = pairs.groupBy().agg(F.max("day").alias("max_day"))
    cover = (pairs.select(
        "user_id", "day",
        F.explode(F.array(*[F.lit(i) for i in range(7)])).alias("off"))
        .select("user_id", (F.col("day") + F.col("off"))
                .alias("window_end")))
    return (cover.join(F.broadcast(bounds))
            .filter(F.col("window_end") <= F.col("max_day"))
            .groupBy("window_end")
            .agg(F.countDistinct("user_id").alias("wau")))


# =========================================================================
# CEP pattern match ([EXT] — MATCH_RECOGNIZE-style sequence predicate)
# =========================================================================

_CEP = dict(within_us=3_600_000_000)  # 1 hour


@q("cep_purchase_error_no_click", ("W1", "J4"), oracle=f"""
WITH seq AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS tsu,
         MIN(CASE WHEN event_type = 'error' THEN epoch_us(ts) END)
             OVER w AS next_error_us,
         MIN(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
             OVER w AS next_click_us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
)
SELECT user_id, event_id AS purchase_id,
       next_error_us - tsu AS latency_us
FROM seq
WHERE event_type = 'purchase'
  AND next_error_us IS NOT NULL
  AND next_error_us - tsu <= {_CEP['within_us']}
  AND (next_click_us IS NULL OR next_click_us >= next_error_us)
""")
def cep_purchase_error_no_click(spark: "SparkSession",
                                sf_dir: str) -> "DataFrame":
    """Complex-event-processing pattern: ``purchase → error within 1 h
    with NO click in between`` — the MATCH_RECOGNIZE / Flink-CEP shape
    (checkout failed before the user did anything else), expressed as
    conditional aggregates over a FOLLOWING window frame.

    Scale design: the naive CEP formulation is a 3-way self-join
    (purchase ⋈ error ⋈ absence-of-click) with interval predicates;
    the window form does it in the ONE user_id shuffle every
    behavioral query shares: per row, "next error instant" and "next
    click instant" are conditional MINs over the rows-following frame
    (O(1) running state scanned backwards by the engine), and the
    pattern is then a map-side predicate.  Longer patterns compose by
    stacking conditional aggregates, never by adding joins.  The
    negative condition (no click between) is exactly the piece
    relational joins express worst and windows express for free.
    """
    e = load(spark, sf_dir, "events")
    w = (W.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(1, W.unboundedFollowing))
    tsu = F.unix_micros("ts")
    nerr = F.min(F.when(F.col("event_type") == "error", tsu)).over(w)
    nclk = F.min(F.when(F.col("event_type") == "click", tsu)).over(w)
    seq = e.select("user_id", "event_id", "event_type", tsu.alias("tsu"),
                   nerr.alias("next_error_us"), nclk.alias("next_click_us"))
    return (seq.filter(
        (F.col("event_type") == "purchase") &
        F.col("next_error_us").isNotNull() &
        ((F.col("next_error_us") - F.col("tsu")) <= _CEP["within_us"]) &
        (F.col("next_click_us").isNull() |
         (F.col("next_click_us") >= F.col("next_error_us"))))
        .select("user_id", F.col("event_id").alias("purchase_id"),
                (F.col("next_error_us") - F.col("tsu")).alias("latency_us")))


# =========================================================================
# Multi-touch attribution ([EXT] — exact linear credit split)
# =========================================================================

_ATTR = dict(window_days=7, touches=("view", "click"))


@q("attribution_linear", ("W1", "J4", "A1"), oracle=f"""
WITH p AS (
  SELECT event_id AS purchase_id, user_id, ts AS pts,
         CAST(ROUND(value * 1000000) AS BIGINT) AS value_micro
  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
), t AS (
  SELECT event_id AS touch_id, user_id, ts AS tts, event_type
  FROM events WHERE event_type IN ('view', 'click')
), pairs AS (
  SELECT p.purchase_id, p.value_micro, t.touch_id, t.event_type,
         ROW_NUMBER() OVER (PARTITION BY p.purchase_id
                            ORDER BY t.tts, t.touch_id) AS pos,
         COUNT(*) OVER (PARTITION BY p.purchase_id) AS n_touches
  FROM p JOIN t ON t.user_id = p.user_id
   AND t.tts < p.pts
   AND t.tts >= p.pts - INTERVAL {_ATTR['window_days']} DAY
)
SELECT purchase_id, touch_id, event_type,
       CAST(value_micro // n_touches
            + CASE WHEN pos = 1
                   THEN value_micro % n_touches ELSE 0 END AS BIGINT)
           AS credit_micro
FROM pairs
""")
def attribution_linear(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Linear multi-touch attribution: each purchase's value splits
    equally across the user's view/click touchpoints in the prior
    {window_days} days, with the integer remainder assigned to the
    FIRST touch so credit conserves exactly (Σ credits ≡ purchase
    value, the invariant finance reconciliation demands — floor-only
    splits leak micros).

    Scale design: the purchase⋈touch pairing is an EQUI-join on
    user_id with the time window as a residual predicate — per-user
    touch history is bounded by retention, so pairs are linear in
    purchases × per-user touches, never a time-range explosion (the
    as-of union-window trick doesn't apply because attribution needs
    ALL touches in the window, not the latest).  Position/count
    windows run per purchase over those bounded pair groups.
    First/last-touch attribution are the same query with pos=1 /
    pos=n filters; position-decay swaps the equal split for a
    weight-by-pos division — all on this one pair relation.
    """
    e = load(spark, sf_dir, "events")
    p = (e.filter((F.col("event_type") == "purchase") &
                  F.col("value").isNotNull())
         .select(F.col("event_id").alias("purchase_id"),
                 F.col("user_id").alias("pu"), F.col("ts").alias("pts"),
                 F.round(F.col("value") * 1000000).cast("long")
                 .alias("value_micro")))
    t = (e.filter(F.col("event_type").isin(*_ATTR["touches"]))
         .select(F.col("event_id").alias("touch_id"),
                 F.col("user_id").alias("tu"), F.col("ts").alias("tts"),
                 "event_type"))
    lo = F.col("pts") - F.expr(f"INTERVAL {_ATTR['window_days']} DAY")
    pairs = (p.join(t, (F.col("tu") == F.col("pu")) &
                    (F.col("tts") < F.col("pts")) & (F.col("tts") >= lo)))
    wp = W.partitionBy("purchase_id").orderBy("tts", "touch_id")
    wc = W.partitionBy("purchase_id")
    ranked = pairs.select(
        "purchase_id", "value_micro", "touch_id", "event_type",
        F.row_number().over(wp).alias("pos"),
        F.count("*").over(wc).alias("n_touches"))
    return ranked.selectExpr(
        "purchase_id", "touch_id", "event_type",
        "value_micro div n_touches + CASE WHEN pos = 1 "
        "THEN value_micro % n_touches ELSE 0 END AS credit_micro")


# Interpolate the parameter placeholders into the real
# __doc__ attributes (a '"""...""".format(...)' first statement
# is a discarded expression, not a docstring — help()/inspect
# saw None for these functions until this pass).
kaplan_meier_churn.__doc__ = kaplan_meier_churn.__doc__.format(**_KM)
attribution_linear.__doc__ = attribution_linear.__doc__.format(**_ATTR)
