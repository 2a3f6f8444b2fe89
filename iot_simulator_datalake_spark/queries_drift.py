"""Distribution-drift monitoring and experimentation statistics ([EXT]):
two-sample KS, PSI, chi-squared independence, Spearman rank
correlation, Welch's t-test, and leave-one-out target encoding.

A 100 TB training-data platform needs these as FIRST-CLASS relational
ops: drift gates decide whether yesterday's corpus slice may join the
training mix, independence tests catch label leakage across feature
columns, and LOO target encoding is the canonical "aggregate feature
without self-leakage" transform.  The reference stops at rollup
aggregates (``gold_device_health_summary.sql``); this family extends
the same exact-arithmetic discipline to inferential statistics.

Float determinism: every statistic is assembled from integer counts /
micro-unit sums; irrational functions (ln, sqrt) are evaluated per
term, rounded to integer nano-units, and SUMMED AS INTEGERS — so the
reduction is order-independent and hash-identical across engines.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import Column
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .queries import load, q

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession

#: the two event segments drift tests compare (old vs new population)
_SEG = dict(a="purchase", b="click")


# =========================================================================
# Two-sample Kolmogorov–Smirnov on a quantized grid ([EXT] — A-family)
# =========================================================================

@q("ks_drift_detect", ("A1", "W1"), oracle=f"""
WITH t AS (
  SELECT CAST(ROUND(value * 1000) AS BIGINT) AS v,
         CASE WHEN event_type = '{_SEG['a']}' THEN 1 ELSE 0 END AS ina,
         CASE WHEN event_type = '{_SEG['b']}' THEN 1 ELSE 0 END AS inb
  FROM events WHERE event_type IN ('{_SEG['a']}', '{_SEG['b']}')
    AND value IS NOT NULL
), g AS (
  SELECT v, SUM(ina) AS ca, SUM(inb) AS cb FROM t GROUP BY v
), c AS (
  SELECT v,
         SUM(ca) OVER (ORDER BY v) AS cuma,
         SUM(cb) OVER (ORDER BY v) AS cumb,
         (SELECT SUM(ca) FROM g) AS na,
         (SELECT SUM(cb) FROM g) AS nb
  FROM g
)
SELECT CAST(MAX(na) AS BIGINT) AS n_a, CAST(MAX(nb) AS BIGINT) AS n_b,
       CAST(MAX(ABS(CAST(cuma AS HUGEINT) * nb - CAST(cumb AS HUGEINT) * na))
            AS BIGINT) AS d_num,
       CAST((MAX(ABS(CAST(cuma AS HUGEINT) * nb
                     - CAST(cumb AS HUGEINT) * na)) * 1000000)
           // (CAST(MAX(na) AS HUGEINT) * MAX(nb)) AS BIGINT) AS d_ppm
FROM c
""")
def ks_drift_detect(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Two-sample Kolmogorov–Smirnov distance between the value
    distributions of two event segments, on a milli-unit quantized
    grid: D = max_x |F_a(x) − F_b(x)|, reported as exact integer
    numerator and floor-divided ppm.

    Scale design: exact KS needs a GLOBAL cumulative sum — the one
    primitive that doesn't shard.  The fix is the same distinct-key
    move as count-min: per-VALUE counts pre-aggregate first (map-side
    combined, shuffle carries one row per distinct quantized value),
    so the single-partition window runs over the GRID, not the events
    — quantization bounds the grid regardless of row count (here ≤
    range×1000 cells).  The cross-multiplied form |cuma·nb − cumb·na|
    keeps everything in int64 — no ECDF floats anywhere.  On a
    1000-executor cluster the grid cumsum is a driver-sized stage; if
    the grid itself ever grew, a two-level prefix-sum (per-range
    partials + offset broadcast) is the standard escalation.
    """
    e = load(spark, sf_dir, "events")
    t = (e.filter(F.col("event_type").isin(_SEG["a"], _SEG["b"]) &
                  F.col("value").isNotNull())
         .select(F.round(F.col("value") * 1000).cast("long").alias("v"),
                 F.when(F.col("event_type") == _SEG["a"], 1).otherwise(0)
                 .alias("ina"),
                 F.when(F.col("event_type") == _SEG["b"], 1).otherwise(0)
                 .alias("inb")))
    g = t.groupBy("v").agg(F.sum("ina").alias("ca"), F.sum("inb").alias("cb"))
    wcum = W.orderBy("v").rowsBetween(W.unboundedPreceding, W.currentRow)
    c = g.select(
        F.sum("ca").over(wcum).alias("cuma"),
        F.sum("cb").over(wcum).alias("cumb"),
        F.sum("ca").over(W.partitionBy()).alias("na"),
        F.sum("cb").over(W.partitionBy()).alias("nb"))
    # the cross-multiplications run in 128-bit (DECIMAL(38,0) ≡ DuckDB
    # HUGEINT): cuma·nb is segment², which exits int64 past ~3e9 rows
    # per segment — the ×10 sweep measured na·nb·10⁶ already at 6e18,
    # one decade from silent wraparound.  The d_ppm QUOTIENT (≤ 10⁶)
    # and d_num (≤ na·nb) stay BIGINT-reportable far longer; d_num's
    # own envelope is na·nb ≤ 9.2e18.
    dec = "decimal(38,0)"
    return (c.select((F.abs(F.col("cuma").cast(dec) * F.col("nb") -
                            F.col("cumb").cast(dec) * F.col("na")))
                     .alias("dn"),
                     "na", "nb")
            .groupBy().agg(F.max("na").alias("n_a"), F.max("nb").alias("n_b"),
                           F.max("dn").alias("dnm"))
            .selectExpr("n_a", "n_b", "CAST(dnm AS BIGINT) AS d_num",
                        "CAST((dnm * 1000000) div "
                        "(CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)"
                        " AS d_ppm"))


# =========================================================================
# Population Stability Index over fixed bins ([EXT])
# =========================================================================

_PSI = dict(bins=20, lo=0, hi=500)


PSI_ORACLE = f"""
WITH t AS (
  SELECT LEAST({_PSI['bins'] - 1}, GREATEST(0,
           CAST(FLOOR((value - {_PSI['lo']}) * {_PSI['bins']}
                / ({_PSI['hi']} - {_PSI['lo']})) AS BIGINT))) AS bin,
         CASE WHEN event_type = '{_SEG['a']}' THEN 1 ELSE 0 END AS ina,
         CASE WHEN event_type = '{_SEG['b']}' THEN 1 ELSE 0 END AS inb
  FROM events WHERE event_type IN ('{_SEG['a']}', '{_SEG['b']}')
    AND value IS NOT NULL
), spine AS (SELECT UNNEST(range({_PSI['bins']})) AS bin),
gc AS (SELECT bin, SUM(ina) AS ra, SUM(inb) AS rb FROM t GROUP BY bin),
g AS (
  SELECT spine.bin, COALESCE(ra, 0) + 1 AS ca, COALESCE(rb, 0) + 1 AS cb
  FROM spine LEFT JOIN gc ON spine.bin = gc.bin
), n AS (SELECT SUM(ca) AS na, SUM(cb) AS nb FROM g)
SELECT CAST(SUM(CAST(ROUND(
         (CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb) *
         LN((CAST(ca AS DOUBLE) * nb) / (CAST(cb AS DOUBLE) * na)) * 1e9)
       AS BIGINT)) AS BIGINT) AS psi_nano,
       COUNT(*) AS n_bins
FROM g CROSS JOIN n
"""


def psi_bin(col: Column = None) -> Column:
    """Clamped equal-width bin id for the configured PSI spec."""
    b, lo, hi = _PSI["bins"], _PSI["lo"], _PSI["hi"]
    v = col if col is not None else F.col("value")
    return F.least(F.lit(b - 1), F.greatest(F.lit(0), F.floor(
        (v - lo) * b / (hi - lo)).cast("long")))


def psi_from_bin_counts(spark: "SparkSession", ga: "DataFrame",
                        gb: "DataFrame") -> "DataFrame":
    """Serving-layer PSI: given per-bin counts for the reference
    segment (``ga``: bin, ra) and the live segment (``gb``: bin, rb),
    smooth over the full configured spine and reduce to
    (psi_nano, n_bins).  Both inputs are bin-cardinality-sized, so
    this stage costs nothing regardless of where the counts came from
    (batch scan, drained stream state, or a merged pair of shards)."""
    b = _PSI["bins"]
    spine = spark.range(b).select(F.col("id").alias("bin"))
    g = (spine.join(F.broadcast(ga), "bin", "left")
         .join(F.broadcast(gb), "bin", "left")
         .select("bin", (F.coalesce("ra", F.lit(0)) + 1).alias("ca"),
                 (F.coalesce("rb", F.lit(0)) + 1).alias("cb")))
    n = g.groupBy().agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    ca, cb = F.col("ca").cast("double"), F.col("cb").cast("double")
    na, nb = F.col("na"), F.col("nb")
    term = ((ca / na - cb / nb) * F.log((ca * nb) / (cb * na)) * 1e9)
    return (g.join(F.broadcast(n))
            .select(F.round(term).cast("long").alias("tn"))
            .groupBy().agg(F.sum("tn").alias("psi_nano"),
                           F.count("*").alias("n_bins")))


@q("psi_drift_bins", ("A1", "F7"), oracle=PSI_ORACLE)
def psi_drift_bins(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Population Stability Index between two segments over {bins}
    fixed equal-width bins (add-one smoothed):
    PSI = Σ_bins (p_i − q_i)·ln(p_i/q_i), reported in integer
    nano-units.

    Scale design: binned drift is the shardable counterpart of KS —
    the per-bin count map-side combines to ≤{bins} rows per partition,
    the totals broadcast, and the irrational part (ln) is evaluated
    per BIN, rounded to int64 nanos, and integer-summed, so the {bins}
    -term reduction is order-independent (a double Σ would hash-drift
    with partitioning).  Laplace smoothing keeps empty bins finite,
    which also makes the statistic well-defined on disjoint supports.
    This is the per-feature drift gate you run per ingest batch; bins
    come from a frozen reference spec, so batches never rescan history.
    """
    e = load(spark, sf_dir, "events")
    # full configured-bin spine inside psi_from_bin_counts: empty bins
    # still get their smoothing pseudo-count, so PSI is well-defined
    # and n_bins is always `bins`
    base = e.filter(F.col("value").isNotNull()).select(
        "event_type", psi_bin().alias("bin"))
    ga = (base.filter(F.col("event_type") == _SEG["a"])
          .groupBy("bin").agg(F.count("*").alias("ra")))
    gb = (base.filter(F.col("event_type") == _SEG["b"])
          .groupBy("bin").agg(F.count("*").alias("rb")))
    return psi_from_bin_counts(spark, ga, gb)


# =========================================================================
# Chi-squared independence test ([EXT])
# =========================================================================

@q("chi2_independence", ("A1", "J1"), oracle="""
WITH o AS (
  SELECT event_type AS et, EXTRACT(hour FROM ts) // 6 AS hq,
         COUNT(*) AS obs
  FROM events GROUP BY 1, 2
), rt AS (SELECT et, SUM(obs) AS r FROM o GROUP BY et),
ct AS (SELECT hq, SUM(obs) AS c FROM o GROUP BY hq),
n AS (SELECT SUM(obs) AS n FROM o)
SELECT CAST(SUM(CAST(ROUND(
         POW(obs - (CAST(r AS DOUBLE) * c) / n, 2)
         / ((CAST(r AS DOUBLE) * c) / n) * 1e9) AS BIGINT)) AS BIGINT)
           AS chi2_nano,
       (COUNT(DISTINCT o.et) - 1) * (COUNT(DISTINCT o.hq) - 1) AS dof
FROM o JOIN rt USING (et) JOIN ct USING (hq) CROSS JOIN n
""")
def chi2_independence(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Pearson chi-squared independence test between event_type and
    6-hour time-of-day quadrant: χ² = Σ_cells (O−E)²/E with
    E = row_total·col_total/N, in integer nano-units + degrees of
    freedom — the leakage probe for categorical feature pairs.

    Scale design: one contingency-table aggregation (map-side
    combined; cells ≤ |types|×4), then the marginals are
    CELL-relation-sized aggregates that broadcast back — three
    KB-sized joins, no second fact scan.  Per-cell terms round to
    int64 nanos before the final integer sum (order-independent).
    The cell count, not the fact count, bounds all post-scan work, so
    the test costs one pass at any scale.
    """
    e = load(spark, sf_dir, "events")
    o = (e.select(F.col("event_type").alias("et"),
                  F.expr("CAST(hour(ts) AS BIGINT) div 6").alias("hq"))
         .groupBy("et", "hq").agg(F.count("*").alias("obs")))
    rt = o.groupBy("et").agg(F.sum("obs").alias("r"))
    ct = o.groupBy("hq").agg(F.sum("obs").alias("c"))
    n = o.groupBy().agg(F.sum("obs").alias("n"))
    exp = (F.col("r").cast("double") * F.col("c")) / F.col("n")
    term = F.pow(F.col("obs") - exp, F.lit(2)) / exp * 1e9
    return (o.join(F.broadcast(rt), "et").join(F.broadcast(ct), "hq")
            .join(F.broadcast(n))
            .select(F.round(term).cast("long").alias("tn"), "et", "hq")
            .groupBy().agg(
                F.sum("tn").alias("chi2_nano"),
                ((F.countDistinct("et") - 1) *
                 (F.countDistinct("hq") - 1)).alias("dof")))


# =========================================================================
# Spearman rank correlation ([EXT] — the robust twin of Pearson)
# =========================================================================

@q("spearman_rank_corr", ("A1", "W1", "F7"), oracle="""
WITH t AS (
  SELECT l_returnflag AS grp,
         CAST(ROUND(l_quantity * 100) AS BIGINT) AS x,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
  FROM lineitem
), r AS (
  SELECT grp,
         2 * RANK() OVER (PARTITION BY grp ORDER BY x)
           + COUNT(*) OVER (PARTITION BY grp, x) - 1 AS rx,
         2 * RANK() OVER (PARTITION BY grp ORDER BY y)
           + COUNT(*) OVER (PARTITION BY grp, y) - 1 AS ry
  FROM t
), m AS (
  SELECT grp,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(rx AS DECIMAL(38,0))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(ry AS DECIMAL(38,0))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(rx AS DECIMAL(38,0)) * ry) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(rx AS DECIMAL(38,0)) * rx) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(ry AS DECIMAL(38,0)) * ry) AS DOUBLE) AS syy
  FROM r GROUP BY grp
)
SELECT grp, n,
       ROUND((n * sxy - sx * sy) /
             (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)), 9)
           AS spearman_rho
FROM m
""")
def spearman_rank_corr(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Per-group Spearman rank correlation (quantity vs extended
    price): Pearson over AVERAGE-TIE ranks, held exactly in integers
    by working in doubled rank units (2·avg_rank = 2·min_rank +
    tie_count − 1 — always an integer).

    Scale design: two rank windows share ONE shuffle (both partition
    by grp); ranks then feed the same exact DECIMAL(38,0) moment
    machinery as corr_regression_exact, so only the final ratio is
    floating point.  Rank-based statistics are the outlier-immune
    drift detectors (monotone transformations can't move ρ), which is
    why the pair (r, ρ) and their divergence is a standard data-QA
    signal.  Per-group sorts shard by group key; a single giant group
    would use the range-partitioned rank escalation (zipWithIndex-free
    two-pass histogram ranking, as in curriculum_order).
    """
    li = load(spark, sf_dir, "lineitem")
    t = li.select(F.col("l_returnflag").alias("grp"),
                  F.round(F.col("l_quantity") * 100).cast("long").alias("x"),
                  F.round(F.col("l_extendedprice") * 100).cast("long")
                  .alias("y"))
    rx = (2 * F.rank().over(W.partitionBy("grp").orderBy("x")) +
          F.count("*").over(W.partitionBy("grp", "x")) - 1)
    ry = (2 * F.rank().over(W.partitionBy("grp").orderBy("y")) +
          F.count("*").over(W.partitionBy("grp", "y")) - 1)
    r = t.select("grp", rx.cast("long").alias("rx"),
                 ry.cast("long").alias("ry"))
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = r.groupBy("grp").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(dec("rx")).cast("double").alias("sx"),
        F.sum(dec("ry")).cast("double").alias("sy"),
        F.sum(dec("rx") * F.col("ry")).cast("double").alias("sxy"),
        F.sum(dec("rx") * F.col("rx")).cast("double").alias("sxx"),
        F.sum(dec("ry") * F.col("ry")).cast("double").alias("syy"))
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    rho = (n * sxy - sx * sy) / (F.sqrt(n * sxx - sx * sx) *
                                 F.sqrt(n * syy - sy * sy))
    return m.select("grp", "n", F.round(rho, 9).alias("spearman_rho"))


# =========================================================================
# Welch's t-test ([EXT] — experimentation / A-B gate)
# =========================================================================

@q("ab_ttest_welch", ("A1", "F7"), oracle=f"""
WITH t AS (
  SELECT event_type AS seg, CAST(ROUND(value * 1000000) AS BIGINT) AS x
  FROM events
  WHERE event_type IN ('{_SEG['a']}', '{_SEG['b']}') AND value IS NOT NULL
), m AS (
  SELECT seg, CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS s,
         CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS DOUBLE) AS ss
  FROM t GROUP BY seg
)
SELECT a.n AS n_a, b.n AS n_b,
       ROUND((a.s / a.n - b.s / b.n) / SQRT(
         ((a.ss - a.s * a.s / a.n) / (a.n - 1)) / a.n +
         ((b.ss - b.s * b.s / b.n) / (b.n - 1)) / b.n), 9) AS t_stat,
       a.s / a.n - b.s / b.n AS mean_diff_micro
FROM (SELECT * FROM m WHERE seg = '{_SEG['a']}') a
CROSS JOIN (SELECT * FROM m WHERE seg = '{_SEG['b']}') b
""")
def ab_ttest_welch(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Welch's unequal-variance t-statistic comparing mean event value
    across two segments — the A/B experimentation gate, from exact
    micro-unit moment sums.

    Scale design: one segmented-aggregate pass (two groups, map-side
    combined), then a 2-row crunch — the statistic is free at any
    scale; the entire cost is the scan.  Same mergeable-moments
    contract as corr_regression_exact: per-shard (n, Σx, Σx²) triples
    add, so sequential testing / per-day accumulation needs no rescan.
    """
    e = load(spark, sf_dir, "events")
    t = (e.filter(F.col("event_type").isin(_SEG["a"], _SEG["b"]) &
                  F.col("value").isNotNull())
         .select(F.col("event_type").alias("seg"),
                 F.round(F.col("value") * 1000000).cast("long").alias("x")))
    dec = F.col("x").cast("decimal(38,0)")
    m = t.groupBy("seg").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(dec).cast("double").alias("s"),
        F.sum(dec * F.col("x")).cast("double").alias("ss"))
    a = m.filter(F.col("seg") == _SEG["a"]).alias("a")
    b = m.filter(F.col("seg") == _SEG["b"]).alias("b")
    an, as_, ass = F.col("a.n"), F.col("a.s"), F.col("a.ss")
    bn, bs, bss = F.col("b.n"), F.col("b.s"), F.col("b.ss")
    se = F.sqrt(((ass - as_ * as_ / an) / (an - 1)) / an +
                ((bss - bs * bs / bn) / (bn - 1)) / bn)
    return a.crossJoin(b).select(
        an.alias("n_a"), bn.alias("n_b"),
        F.round((as_ / an - bs / bn) / se, 9).alias("t_stat"),
        # raw difference of exact-int quotients (no ROUND — the
        # dyadic-boundary hazard); t_stat keeps its 9-digit round:
        # the sqrt makes a boundary landing measure-zero
        (as_ / an - bs / bn).alias("mean_diff_micro"))


# =========================================================================
# Leave-one-out target encoding ([EXT] — leakage-free feature transform)
# =========================================================================

_LOO = dict(m=10)


@q("target_encode_loo", ("A1", "J1"), oracle=f"""
WITH g AS (
  SELECT c_mktsegment AS seg,
         SUM(CAST(ROUND(c_acctbal * 1000000) AS BIGINT)) AS ssum,
         COUNT(*) AS n
  FROM customer GROUP BY 1
), p AS (
  SELECT SUM(ssum) // SUM(n) AS prior FROM g
)
SELECT c_custkey AS customer, c_mktsegment AS seg,
       CAST((g.ssum - CAST(ROUND(c_acctbal * 1000000) AS BIGINT)
        + {_LOO['m']} * p.prior) // (g.n - 1 + {_LOO['m']}) AS BIGINT)
           AS encoded_micro
FROM customer JOIN g ON c_mktsegment = g.seg CROSS JOIN p
""")
def target_encode_loo(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Leave-one-out target encoding of market segment against account
    balance with m={m} smoothing toward the global prior:
    enc_i = (Σ_seg − x_i + m·prior) / (n_seg − 1 + m) — each row's own
    target EXCLUDED, the canonical leakage-free categorical encoder.

    Scale design: the naive formulation is a per-row correlated
    aggregate; the relational one is two tiny aggregates (per-segment
    sums — category-cardinality-sized — and the global prior) BROADCAST
    back onto the fact scan: one pass, zero fact shuffles, map-only
    encode.  Exact integer micro-units with floor division end-to-end,
    so the encoding is bit-reproducible across engines, retries and
    backfills — the property a feature store needs for training/serving
    skew audits.
    """
    c = load(spark, sf_dir, "customer")
    xm = F.round(F.col("c_acctbal") * 1000000).cast("long")
    g = (c.groupBy(F.col("c_mktsegment").alias("seg"))
         .agg(F.sum(xm).alias("ssum"), F.count("*").alias("n")))
    prior_row = (g.groupBy().agg(F.sum("ssum").alias("ts"),
                                 F.sum("n").alias("tn"))
                 .selectExpr("ts div tn AS prior"))
    return (c.join(F.broadcast(g), c.c_mktsegment == g.seg)
            .join(F.broadcast(prior_row))
            .select(F.col("c_custkey").alias("customer"), "seg",
                    (F.col("ssum") - xm + _LOO["m"] * F.col("prior"))
                    .alias("num"), (F.col("n") - 1 + _LOO["m"]).alias("den"))
            .selectExpr("customer", "seg", "num div den AS encoded_micro"))


# =========================================================================
# k-anonymity audit ([EXT] — training-data governance)
# =========================================================================

_KANON = dict(k=5, bucket=100_000)  # acctbal bucket width, cents


@q("k_anonymity_violations", ("A5", "P7"), oracle=f"""
SELECT c_nationkey AS nationkey, c_mktsegment AS seg,
       CAST(ROUND(c_acctbal * 100) AS BIGINT) // {_KANON['bucket']}
           AS bal_bucket,
       COUNT(*) AS group_size
FROM customer
GROUP BY 1, 2, 3
HAVING COUNT(*) < {_KANON['k']}
""")
def k_anonymity_violations(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """k-anonymity audit over the quasi-identifier tuple (nation,
    segment, balance bucket): every equivalence class smaller than
    k={k} is a re-identification risk — the groups a privacy-aware
    training-data release must suppress or generalize before export.

    Scale design: one map-side-combined groupBy over the QI tuple; the
    violating set is by definition small (each row < k members), so
    the output — the suppression worklist — is tiny even when the
    input is 100 TB.  Composes with the engine: run it as an
    expectation (engine/checks.py) gating the gold export, the same
    way accepted_values gates dirty codes.  Bucketing the continuous
    column is itself the generalization step of k-anonymization —
    widen `bucket` until this relation is empty.
    """
    c = load(spark, sf_dir, "customer")
    bb = F.expr(
        f"CAST(ROUND(c_acctbal * 100) AS BIGINT) div {_KANON['bucket']}")
    return (c.groupBy(F.col("c_nationkey").alias("nationkey"),
                      F.col("c_mktsegment").alias("seg"),
                      bb.alias("bal_bucket"))
            .agg(F.count("*").alias("group_size"))
            .filter(F.col("group_size") < _KANON["k"]))


# Interpolate the parameter placeholders into the real
# __doc__ attributes (a '"""...""".format(...)' first statement
# is a discarded expression, not a docstring — help()/inspect
# saw None for these functions until this pass).
psi_drift_bins.__doc__ = psi_drift_bins.__doc__.format(**_PSI)
target_encode_loo.__doc__ = target_encode_loo.__doc__.format(**_LOO)
k_anonymity_violations.__doc__ = k_anonymity_violations.__doc__.format(**_KANON)
