"""Time-series repair and anomaly operators over the ``events`` stream:
date-spine gap filling with linear interpolation, exact-moment z-score
outlier flagging, and downtime (gap) detection.

These are the sensor-stream shapes the reference's IoT domain implies
(``README_DBT.md:204-206`` — hourly/daily device rollups, device health
scores): a real device fleet has missing readings, drift, and outages,
and the silver→gold hop needs deterministic repair operators.

Float determinism: interpolation and z-scores are scalar IEEE-double
expressions evaluated identically by Spark and DuckDB, fed from
exact DECIMAL moment sums (see queries.py module docstring), with a
final ROUND on both sides.

Scale stance (100 TB): everything shuffles once on ``user_id`` (the
device key at scale) and uses bounded per-key window state.  The spine
explode multiplies rows only by days-per-key, and the two
fill-direction windows reuse the same exchange + sort.
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
# Gap fill + linear interpolation over a per-key date spine
# =========================================================================

@q("ts_gap_fill_interpolate", ("A6", "W1", "F2", "F7"), oracle="""
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS d,
         100 * SUM(CAST(ROUND(value * 10000) AS BIGINT))
           // COUNT(value) AS v_u
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
), b AS (
  SELECT user_id, MIN(d) AS d0, MAX(d) AS d1 FROM daily GROUP BY 1
), spine AS (
  SELECT user_id,
         CAST(UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS d
  FROM b
), s AS (
  SELECT spine.user_id, spine.d, daily.v_u
  FROM spine LEFT JOIN daily
    ON spine.user_id = daily.user_id AND spine.d = daily.d
), fill AS (
  SELECT user_id, d, v_u,
         LAST_VALUE(v_u IGNORE NULLS) OVER wp AS pvu,
         LAST_VALUE(CASE WHEN v_u IS NOT NULL THEN d END IGNORE NULLS)
           OVER wp AS pd,
         FIRST_VALUE(v_u IGNORE NULLS) OVER wn AS nvu,
         FIRST_VALUE(CASE WHEN v_u IS NOT NULL THEN d END IGNORE NULLS)
           OVER wn AS nd
  FROM s
  WINDOW wp AS (PARTITION BY user_id ORDER BY d
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wn AS (PARTITION BY user_id ORDER BY d
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
, units AS (
  SELECT user_id, d, v_u, pvu, nvu,
         date_diff('day', pd, d) AS dd_prev,
         date_diff('day', d, nd) AS dd_next,
         date_diff('day', pd, nd) AS den
  FROM fill
)
SELECT user_id, d AS day,
       CAST(CASE WHEN v_u IS NOT NULL THEN v_u
            ELSE (2 * (pvu * dd_next + nvu * dd_prev) + den)
                 // (2 * NULLIF(den, 0))
       END AS BIGINT) AS value_filled_u,
       CAST(v_u IS NULL AS INT) AS interpolated
FROM units
""")
def ts_gap_fill_interpolate(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Per-user daily mean series with missing days restored by linear
    interpolation between the nearest observed neighbors.  Pipeline:
    daily aggregate → per-key min/max bounds → ``sequence()`` date
    spine explode → left join back → two frame windows (last-non-null
    looking back, first-non-null looking forward) → scalar interp.

    The spine join is co-partitioned with the daily aggregate (same
    ``user_id`` key), and both windows sort once on (user_id, d) — one
    exchange end-to-end after the aggregate.  Endpoints are always
    observed (spine is bounded by the key's own min/max), so interior
    NULLs always have both neighbors.  At 100 TB the multiplier is
    days-per-device (bounded, e.g. ≤ a retention window), never
    rows × rows.

    Determinism: the whole series is integer micro-units end-to-end —
    4-dp readings scale to exact deci-milli ints, the daily mean is
    ONE integer floor-division ``(100·Σvq) div count`` (v_u =
    floor(mean·1e6); the old 6-dp ROUND of the double quotient was
    the HALF_UP cross-engine hazard class), gap rows interpolate the
    neighbor v_u's half-up as ``(2n + d) div 2d`` entirely in
    integers, and the output column ``value_filled_u`` stays BIGINT.
    All operands non-negative (value ≥ 0), so Spark's ``div`` and
    DuckDB's ``//`` agree."""
    e = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    daily = (e.groupBy("user_id", F.col("ts").cast("date").alias("d"))
             .agg(F.expr(
                 "100 * sum(CAST(round(value * 10000, 0) AS BIGINT))"
                 " div count(value)").alias("v_u")))
    spine = (daily.groupBy("user_id")
             .agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
             .select("user_id",
                     F.explode(F.sequence("d0", "d1")).alias("d")))
    s = spine.join(daily, ["user_id", "d"], "left")
    wp = (W.partitionBy("user_id").orderBy("d")
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    wn = (W.partitionBy("user_id").orderBy("d")
          .rowsBetween(W.currentRow, W.unboundedFollowing))
    v, d = F.col("v_u"), F.col("d")
    pv = F.last(v, ignorenulls=True).over(wp)
    pd_ = F.last(F.when(v.isNotNull(), d), ignorenulls=True).over(wp)
    nv = F.first(v, ignorenulls=True).over(wn)
    nd = F.first(F.when(v.isNotNull(), d), ignorenulls=True).over(wn)
    units = (s.withColumn("pvu", pv).withColumn("pd", pd_)
             .withColumn("nvu", nv).withColumn("nd", nd)
             .select(
                 "user_id", d, v, "pvu", "nvu",
                 F.datediff(d, F.col("pd")).cast("bigint").alias("dd_prev"),
                 F.datediff(F.col("nd"), d).cast("bigint").alias("dd_next"),
                 F.datediff(F.col("nd"), F.col("pd")).cast("bigint")
                  .alias("den")))
    interp_u = F.expr(
        "(2 * (pvu * dd_next + nvu * dd_prev) + den)"
        " div (2 * nullif(den, 0))")
    return units.select(
        "user_id", d.alias("day"),
        F.when(v.isNotNull(), v).otherwise(interp_u)
         .cast("bigint").alias("value_filled_u"),
        v.isNull().cast("int").alias("interpolated"))


# =========================================================================
# Z-score anomaly flags from exact decimal moments
# =========================================================================

#: shared by the batch query and its streaming stream-static twin
ANOMALY_ZSCORE_ORACLE = """
WITH m AS (
  SELECT event_id, user_id, value,
         CAST(SUM(CAST(value AS DECIMAL(25,4))) OVER w AS DOUBLE) AS s1,
         CAST(SUM(CAST(CAST(value AS DECIMAL(18,4)) *
                       CAST(value AS DECIMAL(18,4)) AS DECIMAL(38,8)))
              OVER w AS DOUBLE) AS s2,
         CAST(COUNT(value) OVER w AS DOUBLE) AS n
  FROM events
  WINDOW w AS (PARTITION BY user_id)
)
, zz AS (
  SELECT event_id, user_id, value,
         CAST(floor((value - s1 / n) /
               SQRT((s2 - s1 * s1 / n) / (n - 1)) * 1e6) AS BIGINT) AS z_u
  FROM m
  WHERE n > 1 AND (s2 - s1 * s1 / n) > 0
)
SELECT * FROM zz WHERE z_u > 1500000 OR z_u < -1500000
"""


@q("anomaly_zscore", ("A7", "A8", "W1"), oracle=ANOMALY_ZSCORE_ORACLE)
def anomaly_zscore(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Per-user z-score outlier flags computed from exact moment sums:
    Σv and Σv² accumulate as DECIMAL (2-dp inputs square to exactly
    4 dp, so both sums are exact and order-independent), and only the
    final mean/variance/sqrt arithmetic runs in doubles — identical
    expressions on both engines, quantized to integer micro-units
    (floor(z·1e6)) for the cross-engine hash compare.

    Shape: one shuffle on ``user_id``; the whole-partition window keeps
    per-key state to three numbers.  For heavy-hitter keys at 100 TB
    the same math re-expresses as a two-phase aggregate (map-side
    partials of (Σv, Σv², n) merge associatively) joined back to the
    stream — the window form is chosen here because it reuses a single
    exchange and the per-device row count is bounded."""
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id")
    v = F.col("value")
    s1 = F.sum(v.cast("decimal(25,4)")).over(w).cast("double")
    s2 = F.sum((v.cast("decimal(18,4)") * v.cast("decimal(18,4)"))
               .cast("decimal(38,8)")).over(w).cast("double")
    n = F.count(v).over(w).cast("double")
    # z in integer MICRO-UNITS (floor(z*1e6), BIGINT) — the repo-wide
    # determinism recipe; ROUND(z, 4) was the fractional-ROUND HALF_UP
    # cross-engine hazard class.  Degenerate groups (n=1, zero
    # variance) are excluded by the same guard on both engines, so no
    # ±inf/NaN reaches the floor.
    m = e.select("event_id", "user_id", "value",
                 s1.alias("s1"), s2.alias("s2"), n.alias("n"))
    s1c, s2c, nc = F.col("s1"), F.col("s2"), F.col("n")
    z_u = to_units((v - s1c / nc) /
                   F.sqrt((s2c - s1c * s1c / nc) / (nc - 1)), 6)
    # NOTE the floor-based flag is asymmetric by one micro-unit around
    # ±1.5: positives need z ≥ 1.500001 (floor(z·1e6) > 1_500_000)
    # while negatives flag at any z < -1.5 strictly.  Acceptable for
    # determinism — both engines apply the identical rule — but any
    # future threshold edit must keep BOTH signs and BOTH engines (the
    # streaming twin in queries_streaming.py uses the same rule)
    # intentional together.
    return (m.filter((nc > 1) & (s2c - s1c * s1c / nc > 0))
            .select("event_id", "user_id", "value", z_u.alias("z_u"))
            .filter((F.col("z_u") > 1_500_000)
                    | (F.col("z_u") < -1_500_000)))


# =========================================================================
# Downtime detection — inter-event gaps above threshold
# =========================================================================

@q("downtime_gaps", ("W1", "F7"), oracle="""
WITH g AS (
  SELECT user_id, ts AS gap_start,
         LEAD(ts) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id) AS gap_end
  FROM events
)
SELECT user_id, gap_start, gap_end,
       (epoch_us(gap_end) - epoch_us(gap_start)) // 1000000 AS gap_seconds
FROM g
WHERE epoch_us(gap_end) - epoch_us(gap_start) > 43200000000
""")
def downtime_gaps(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Outage windows: consecutive same-key events more than 12 h apart
    (the device-fleet complement of sessionization — the reference's
    health-score models, README_DBT.md:206, need exactly this).  LEAD
    over one ``user_id`` shuffle; gap arithmetic in exact integer
    microseconds (no float drift), floor-divided to whole seconds on
    both engines."""
    e = load(spark, sf_dir, "events")
    seq = W.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(seq)
    out = e.select("user_id", F.col("ts").alias("gap_start"),
                   nxt.alias("gap_end"))
    gap_us = (F.unix_micros(F.col("gap_end")) -
              F.unix_micros(F.col("gap_start")))
    return (out.filter(gap_us > 12 * 3600 * 1_000_000)
            .withColumn("gap_seconds",
                        F.floor(gap_us / F.lit(1_000_000)).cast("bigint")))


# =========================================================================
# Time-weighted average — duration-weighted sensor reading per device
# =========================================================================

@q("time_weighted_avg", ("A6", "W1", "F7"), oracle="""
WITH seq AS (
  SELECT user_id, value, ts,
         LEAD(ts) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id) AS nxt
  FROM events
), seg AS (
  SELECT user_id,
         CAST(ROUND(value * 10000) AS BIGINT) AS vq,
         (epoch_us(nxt) - epoch_us(ts)) // 1000000 AS dur_s
  FROM seq WHERE nxt IS NOT NULL
)
SELECT user_id,
       CAST(SUM(dur_s) AS BIGINT) AS active_sec,
       CAST(SUM(CAST(vq AS HUGEINT) * dur_s) * 100 // SUM(dur_s)
            AS BIGINT) AS twa_u
FROM seg WHERE dur_s > 0 GROUP BY user_id
""")
def time_weighted_avg(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Time-weighted average reading per device — each value holds
    until the next event, so it is weighted by its holding duration
    (the sample-and-hold semantics plain AVG silently gets wrong when
    reporting intervals vary, which real sensor fleets always do).

    One shuffle on user_id: LEAD gives the segment end, then a plain
    aggregate.  Exactness: 4-dp values scale to integer deci-milli
    units and durations truncate to whole seconds, so the weighted sum
    is exact integer arithmetic — 128-bit through the aggregate
    (Spark DECIMAL(38,0) / DuckDB HUGEINT: per-segment vq·dur ≈ 1e13,
    so a corpus-scale SUM·100 can pass int64) — and the average is
    ONE integer floor-division at the end, emitted in micro-units
    (``twa_u`` = floor(twa·1e6); the old 6-dp ROUND of the raw double
    quotient was the HALF_UP cross-engine hazard class).  Operands
    are non-negative (value ≥ 0, dur > 0), so Spark's
    truncate-toward-zero ``div`` and DuckDB's flooring ``//`` agree.
    Zero-length segments (same-second ties) drop on both sides."""
    ev = load(spark, sf_dir, "events")
    wuser = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("nxt", F.lead("ts").over(wuser))
    seg = (seq.filter(F.col("nxt").isNotNull())
           .select("user_id",
                   F.round(F.col("value") * 10000, 0).cast("bigint")
                   .alias("vq"),
                   F.expr("(unix_micros(nxt) - unix_micros(ts)) "
                          "div 1000000").alias("dur_s"))
           .filter(F.col("dur_s") > 0))
    return (seg.groupBy("user_id")
            .agg(F.sum("dur_s").cast("bigint").alias("active_sec"),
                 F.expr("CAST(sum(CAST(vq AS DECIMAL(38,0)) * dur_s)"
                        " * 100 div sum(dur_s) AS BIGINT)")
                 .alias("twa_u")))


# =========================================================================
# OHLC resampling — open/high/low/close bars per (event_type, day)
# =========================================================================

@q("ohlc_bars", ("A6", "W1", "F7"), oracle="""
WITH ranked AS (
  SELECT event_type, CAST(ts AS DATE) AS day, value,
         ROW_NUMBER() OVER (PARTITION BY event_type, CAST(ts AS DATE)
                            ORDER BY ts, event_id) AS rn_a,
         ROW_NUMBER() OVER (PARTITION BY event_type, CAST(ts AS DATE)
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events
)
SELECT event_type, day,
       MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
       MAX(value) AS high, MIN(value) AS low,
       MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
       COUNT(*) AS n
FROM ranked GROUP BY 1, 2
""")
def ohlc_bars(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Downsample each event stream to daily OHLC bars — the canonical
    resampling shape (candlesticks, sensor summaries).  Open/close are
    first/last by full (ts, event_id) tie-break, so bars are
    deterministic even with same-timestamp readings — the reason this
    uses two ROW_NUMBERs over ONE exchange rather than arg_min/arg_max
    (whose tie behavior is engine-private).  High/low/count are plain
    aggregates; no value arithmetic at all, so doubles pass through
    bit-identical on both engines."""
    ev = load(spark, sf_dir, "events")
    part = [F.col("event_type"), F.col("ts").cast("date").alias("day")]
    asc = W.partitionBy("event_type", F.col("ts").cast("date")) \
           .orderBy("ts", "event_id")
    desc = W.partitionBy("event_type", F.col("ts").cast("date")) \
            .orderBy(F.col("ts").desc(), F.col("event_id").desc())
    ranked = ev.select(
        *part, "value",
        F.row_number().over(asc).alias("rn_a"),
        F.row_number().over(desc).alias("rn_d"))
    return (ranked.groupBy("event_type", "day")
            .agg(F.max(F.when(F.col("rn_a") == 1, F.col("value")))
                 .alias("open"),
                 F.max("value").alias("high"),
                 F.min("value").alias("low"),
                 F.max(F.when(F.col("rn_d") == 1, F.col("value")))
                 .alias("close"),
                 F.count(F.lit(1)).alias("n")))


# =========================================================================
# CUSUM change-point detection — drift flagging without any division
# =========================================================================

@q("cusum_changepoints", ("W1", "A8", "F7"), oracle="""
WITH q AS (
  SELECT user_id, event_id, ts,
         CAST(ROUND(value * 100) AS BIGINT) AS vq
  FROM events
), r AS (
  SELECT user_id, event_id, vq,
         SUM(vq) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS c,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS i,
         SUM(vq) OVER (PARTITION BY user_id) AS s,
         SUM(vq * vq) OVER (PARTITION BY user_id) AS q2,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM q
), d AS (
  SELECT user_id, event_id,
         CAST(n * c - i * s AS DECIMAL(19,0)) AS dev,
         CAST(16 * (n * q2 - s * s) AS DECIMAL(38,0)) AS rhs
  FROM r
)
SELECT user_id, event_id,
       CASE WHEN dev > 0 THEN 'up' ELSE 'down' END AS direction
FROM d WHERE dev * dev > rhs
""")
def cusum_changepoints(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """CUSUM drift detection per device: flag readings where the
    cumulative deviation from the device's own mean exceeds 4σ — the
    classic change-point/drift monitor (sensor recalibration, sudden
    baseline shift).

    Division-free exactness: the textbook test |Σ_{j≤i}(v_j − μ)| >
    k·σ multiplies through by n (μ = S/n) and squares, giving
    (n·C_i − i·S)² > k²·(n·Q − S²) — every term an exact integer in
    centi-units (values are 2-dp), so both engines compare identical
    numbers with NO float mean, NO sqrt, NO rounding policy at all.
    The squares go through DECIMAL(19,0)→(38,0) so the comparison
    cannot overflow int64 at larger scale factors.

    One shuffle on user_id: the running sum, row number, and all three
    whole-partition totals share a single exchange + sort (Spark
    computes the unbounded-frame aggregates as window functions over
    the same partitioning).  At 100 TB this is the same plan as
    anomaly_zscore with a running prefix added."""
    ev = load(spark, sf_dir, "events")
    wuser = W.partitionBy("user_id").orderBy("ts", "event_id")
    run = wuser.rowsBetween(W.unboundedPreceding, W.currentRow)
    whole = W.partitionBy("user_id")
    r = (ev.select("user_id", "event_id", "ts",
                   F.round(F.col("value") * 100, 0).cast("bigint")
                   .alias("vq"))
         .select("user_id", "event_id",
                 F.sum("vq").over(run).alias("c"),
                 F.row_number().over(wuser).alias("i"),
                 F.sum("vq").over(whole).alias("s"),
                 F.sum(F.col("vq") * F.col("vq")).over(whole).alias("q2"),
                 F.count(F.lit(1)).over(whole).alias("n")))
    d = r.select(
        "user_id", "event_id",
        (F.col("n") * F.col("c") - F.col("i") * F.col("s"))
        .cast("decimal(19,0)").alias("dev"),
        (16 * (F.col("n") * F.col("q2") - F.col("s") * F.col("s")))
        .cast("decimal(38,0)").alias("rhs"))
    return (d.filter(F.col("dev") * F.col("dev") > F.col("rhs"))
            .select("user_id", "event_id",
                    F.when(F.col("dev") > 0, "up").otherwise("down")
                    .alias("direction")))


# =========================================================================
# Capped running balance — the recurrence SQL windows cannot express
# =========================================================================

_BAL_CAP = 10_000     # centi-units (100.00)
_BAL_DRAIN = 2_500    # per-event drain: delta = value_cents - this


@q("capped_running_balance", ("W1", "A7"), oracle=f"""
WITH RECURSIVE seq AS (
  SELECT user_id, event_id,
         CAST(ROUND(value * 100) AS BIGINT) - {_BAL_DRAIN} AS d,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS i
  FROM events
), bal AS (
  SELECT user_id, event_id, i,
         LEAST(GREATEST(d, 0), {_BAL_CAP}) AS b
  FROM seq WHERE i = 1
  UNION ALL
  SELECT s.user_id, s.event_id, s.i,
         LEAST(GREATEST(bal.b + s.d, 0), {_BAL_CAP})
  FROM bal JOIN seq s ON s.user_id = bal.user_id AND s.i = bal.i + 1
)
SELECT user_id, event_id, b AS balance FROM bal
""")
def capped_running_balance(spark: "SparkSession", sf_dir: str
                           ) -> "DataFrame":
    """Clamped running balance per device (battery / inventory / token-
    bucket semantics): b_i = clamp(b_{i-1} + Δ_i, 0, cap).

    This recurrence is NON-ASSOCIATIVE — the clamp makes it
    inexpressible as any window aggregate (running SUM + post-clamp is
    wrong the moment a bound is hit mid-stream), which is precisely the
    case for a per-key stateful scan: grouped ``applyInPandas``, one
    Arrow batch per device, an honest sequential fold inside.  This is
    the batch twin of streaming/stateful.py's running totals, and the
    only Python-in-the-row-path member of the gate besides it — kept
    deterministic by integer centi-unit arithmetic (no float state).
    Scale: one shuffle on user_id; per-key state is one int; a device
    with 10⁸ events bounds the Arrow batch, so pair this with the
    skew-salting notes if keys run away.  The DuckDB oracle replays
    the recurrence as a recursive CTE (depth = max events/key)."""
    ev = load(spark, sf_dir, "events")
    seq = ev.select("user_id", "event_id",
                    F.unix_micros("ts").alias("tsm"),
                    (F.round(F.col("value") * 100, 0).cast("bigint")
                     - F.lit(_BAL_DRAIN)).alias("d"))

    def fold(pdf):
        pdf = pdf.sort_values(["tsm", "event_id"])
        b, out = 0, []
        for d in pdf["d"]:
            b = min(max(b + int(d), 0), _BAL_CAP)
            out.append(b)
        pdf = pdf.assign(balance=out)
        return pdf[["user_id", "event_id", "balance"]]

    return (seq.repartition("user_id").groupBy("user_id")
            .applyInPandas(fold,
                           "user_id bigint, event_id bigint, "
                           "balance bigint"))


# =========================================================================
# Rolling 30-day correlation ([EXT] — windowed co-moments)
# =========================================================================

@q("rolling_corr_30d", ("W1", "A1", "F7"), oracle="""
WITH d AS (
  SELECT CAST(datediff('day', DATE '1970-01-01',
                       CAST(l_shipdate AS DATE)) AS BIGINT) AS day,
         CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS x,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS y
  FROM lineitem GROUP BY 1
), m AS (
  SELECT day,
         CAST(COUNT(*) OVER w AS DOUBLE) AS n,
         CAST(SUM(CAST(x AS DECIMAL(38,0))) OVER w AS DOUBLE) AS sx,
         CAST(SUM(CAST(y AS DECIMAL(38,0))) OVER w AS DOUBLE) AS sy,
         CAST(SUM(CAST(x AS DECIMAL(38,0)) * y) OVER w AS DOUBLE) AS sxy,
         CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) OVER w AS DOUBLE) AS sxx,
         CAST(SUM(CAST(y AS DECIMAL(38,0)) * y) OVER w AS DOUBLE) AS syy
  FROM d
  WINDOW w AS (ORDER BY day RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)
)
SELECT day, CAST(n AS BIGINT) AS n_days,
       CAST(floor((n * sxy - sx * sy) /
             (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)) * 1e9)
            AS BIGINT) AS rolling_r_nano
FROM m
WHERE n >= 10 AND (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
""")
def rolling_corr_30d(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Rolling 30-day Pearson correlation between daily shipped
    quantity and daily revenue — the windowed form of
    corr_regression_exact, i.e. a drift detector over the RELATIONSHIP
    between two metrics rather than either one's level.

    Scale design: the co-moment trick composes with RANGE frames —
    pre-aggregate to days first (map-side combined; the window's input
    is calendar-sized, not fact-sized), then all six moment sums run
    over ONE day-ordered frame in a single window pass, exact in
    DECIMAL(38,0).  The final ratio is the usual deterministic double
    expression.  Day keys are integer epoch-days so the RANGE frame is
    pure integer arithmetic on both engines.  Windows with fewer than
    10 days are suppressed (unstable estimates, and the head of the
    series differs from a production run that has history).
    """
    li = load(spark, sf_dir, "lineitem")
    d = (li.groupBy(F.datediff(F.col("l_shipdate").cast("date"),
                               F.lit("1970-01-01").cast("date"))
                    .cast("long").alias("day"))
         .agg(F.sum(F.round(F.col("l_quantity") * 100).cast("long"))
              .cast("long").alias("x"),
              F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
              .cast("long").alias("y")))
    w = W.orderBy("day").rangeBetween(-29, W.currentRow)
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = d.select(
        "day",
        F.count("*").over(w).cast("double").alias("n"),
        F.sum(dec("x")).over(w).cast("double").alias("sx"),
        F.sum(dec("y")).over(w).cast("double").alias("sy"),
        F.sum(dec("x") * F.col("y")).over(w).cast("double").alias("sxy"),
        F.sum(dec("x") * F.col("x")).over(w).cast("double").alias("sxx"),
        F.sum(dec("y") * F.col("y")).over(w).cast("double").alias("syy"))
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    r = (n * sxy - sx * sy) / (F.sqrt(n * sxx - sx * sx) *
                               F.sqrt(n * syy - sy * sy))
    # nano-unit integer r (floor(r*1e9)) — fractional ROUND(r, 9) was
    # the cross-engine HALF_UP hazard; zero-variance frames (either
    # side constant) are excluded by the same guard on both engines.
    return (m.filter((n >= 10) & (n * sxx - sx * sx > 0)
                     & (n * syy - sy * sy > 0))
            .select("day", n.cast("long").alias("n_days"),
                    to_units(r, 9).alias("rolling_r_nano")))


# =========================================================================
# EWMA level + one-step-ahead forecast ([EXT] — stateful scan family)
# =========================================================================

_EWMA = dict(a=3, m=10)  # alpha = a/m = 0.3


@q("ewma_forecast", ("W1", "A7"), oracle=f"""
WITH RECURSIVE daily AS (
  SELECT user_id,
         CAST(datediff('day', DATE '1970-01-01',
                       CAST(ts AS DATE)) AS BIGINT) AS day,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
), seq AS (
  SELECT user_id, day, x,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS i
  FROM daily
), lvl AS (
  SELECT user_id, day, x, i, x AS s, CAST(NULL AS BIGINT) AS f
  FROM seq WHERE i = 1
  UNION ALL
  SELECT s2.user_id, s2.day, s2.x, s2.i,
         ({_EWMA['a']} * s2.x + {_EWMA['m'] - _EWMA['a']} * lvl.s)
             // {_EWMA['m']},
         lvl.s
  FROM lvl JOIN seq s2 ON s2.user_id = lvl.user_id AND s2.i = lvl.i + 1
)
SELECT user_id, day, x AS actual_cents, s AS level_cents,
       f AS forecast_cents
FROM lvl
""")
def ewma_forecast(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Per-device EWMA level (α={a}/{m}) over the daily value series,
    with the one-step-ahead forecast (yesterday's level) alongside the
    actual — the simplest real forecaster and the residual source for
    forecast-based anomaly detection.

    Like capped_running_balance, the INTEGER recurrence
    s_t = (a·x_t + (m−a)·s_(t-1)) div m is non-associative (floor at
    every step), so no window algebra expresses it: grouped
    ``applyInPandas`` folds each device's day series in one Arrow
    batch.  The input is PRE-AGGREGATED to the day grid first, so the
    Python stage sees calendar-bounded series, not raw events — the
    fold costs O(days) per device no matter how hot the device is
    (the same grid-bounding move as KS/Kaplan–Meier).  Integer state
    end-to-end ⇒ bit-identical to the recursive-CTE oracle.
    """
    ev = load(spark, sf_dir, "events")
    daily = (ev.groupBy("user_id",
                        F.datediff(F.col("ts").cast("date"),
                                   F.lit("1970-01-01").cast("date"))
                        .cast("long").alias("day"))
             .agg(F.sum(F.round(F.col("value") * 100).cast("long"))
                  .cast("long").alias("x")))
    a, m = _EWMA["a"], _EWMA["m"]

    def fold(pdf):
        pdf = pdf.sort_values("day")
        s = None
        levels, forecasts = [], []
        for x in pdf["x"]:
            x = int(x)
            if s is None:
                forecasts.append(None)
                s = x
            else:
                forecasts.append(s)
                # truncate-toward-zero to match DuckDB/Spark integer
                # div (ADVICE r2: Python // floors, diverging when the
                # numerator goes negative — latent on shipped data but
                # wrong for any signed metric)
                num = a * x + (m - a) * s
                q_, r_ = divmod(num, m)
                s = q_ + 1 if (q_ < 0 and r_ != 0) else q_
            levels.append(s)
        pdf = pdf.assign(level_cents=levels, forecast_cents=forecasts)
        return pdf[["user_id", "day", "x", "level_cents", "forecast_cents"]]

    out = (daily.repartition("user_id").groupBy("user_id")
           .applyInPandas(fold,
                          "user_id bigint, day bigint, x bigint, "
                          "level_cents bigint, forecast_cents bigint"))
    return out.withColumnRenamed("x", "actual_cents")


# =========================================================================
# Hysteresis alerting ([EXT] — two-threshold state, window-expressible)
# =========================================================================

_HYST = dict(hi=200_00, lo=50_00)  # value_cents thresholds


@q("hysteresis_alerts", ("W1", "P5"), oracle=f"""
WITH t AS (
  SELECT user_id, event_id, ts,
         CAST(ROUND(value * 100) AS BIGINT) AS v
  FROM events WHERE value IS NOT NULL
), c AS (
  SELECT user_id, event_id, ts, v,
         CASE WHEN v >= {_HYST['hi']} THEN 1
              WHEN v <  {_HYST['lo']} THEN 0 END AS cross_state
  FROM t
), s AS (
  SELECT user_id, event_id, ts, v,
         COALESCE(LAST_VALUE(cross_state IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING), 0) AS alert_on
  FROM c
)
SELECT user_id, event_id, ts, v AS value_cents,
       CAST(alert_on AS BIGINT) AS alert_on,
       CAST(CASE WHEN alert_on = 1 AND COALESCE(LAG(alert_on) OVER (
             PARTITION BY user_id ORDER BY ts, event_id), 0) = 0
            THEN 1 ELSE 0 END AS BIGINT) AS alert_started
FROM s
""")
def hysteresis_alerts(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Two-threshold (Schmitt-trigger) alerting per device: the alert
    LATCHES on when value ≥ {hi} cents and clears only below {lo} —
    the debounced alert state every monitoring system uses instead of
    a flappy single threshold (the reference documents exactly this
    surface: fct_alerts vs alert_thresholds, README_DBT.md:169,182).

    The state LOOKS like a sequential fold, but latching state is the
    direction of the LAST THRESHOLD CROSSING — a last-non-null window
    over crossing events, fully associative and JVM-side (contrast
    capped_running_balance, where the clamp makes every step depend on
    accumulated state and an honest Python fold is required; knowing
    which side of that line an operator falls on is the difference
    between a window and an applyInPandas at 100 TB).  Episode starts
    fall out of a LAG over the same shuffle.
    """
    e = load(spark, sf_dir, "events")
    t = (e.filter(F.col("value").isNotNull())
         .select("user_id", "event_id", "ts",
                 F.round(F.col("value") * 100).cast("long").alias("v")))
    cross = (F.when(F.col("v") >= _HYST["hi"], 1)
             .when(F.col("v") < _HYST["lo"], 0))
    w = (W.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    wl = W.partitionBy("user_id").orderBy("ts", "event_id")
    s = t.select("user_id", "event_id", "ts", "v",
                 F.coalesce(F.last(cross, ignorenulls=True).over(w),
                            F.lit(0)).alias("alert_on"))
    return s.select(
        "user_id", "event_id", "ts", F.col("v").alias("value_cents"),
        F.col("alert_on").cast("long").alias("alert_on"),
        F.when((F.col("alert_on") == 1) &
               (F.coalesce(F.lag("alert_on").over(wl), F.lit(0)) == 0), 1)
        .otherwise(0).cast("long").alias("alert_started"))


# Interpolate the parameter placeholders into the real
# __doc__ attributes (a '"""...""".format(...)' first statement
# is a discarded expression, not a docstring — help()/inspect
# saw None for these functions until this pass).
ewma_forecast.__doc__ = ewma_forecast.__doc__.format(**_EWMA)
hysteresis_alerts.__doc__ = hysteresis_alerts.__doc__.format(**_HYST)
