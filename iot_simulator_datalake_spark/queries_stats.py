"""Statistical mining and locality operators ([EXT] beyond SURVEY §2):
association rules (market basket), exact Pearson/OLS regression,
count-min frequency sketch, grid-bucketed spatial neighbor join, and
the point-in-time (SCD2 as-of) feature join.

The reference's analytics stop at GROUP-BY rollups
(``gold_device_health_summary.sql``); these add the model-adjacent
statistics a training-data platform computes over the same tables.
Scale notes inline per query; everything stays JVM-side.

Float determinism: regression/corr moments are accumulated as exact
integer micro-unit sums (DECIMAL(38,0)), then the final ratios are
computed in DOUBLE with an identical expression tree on both engines —
same inputs + same IEEE ops = identical bits.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .queries import load, q

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession


# =========================================================================
# Association rules / market basket ([EXT] — A-family composite)
# =========================================================================

@q("market_basket_lift", ("A1", "J4"), oracle="""
WITH b AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
n AS (SELECT COUNT(DISTINCT ok) AS n_orders FROM b),
ic AS (SELECT pk, COUNT(*) AS cnt FROM b GROUP BY pk),
pc AS (
  SELECT a.pk AS part_a, c.pk AS part_b, COUNT(*) AS pair_cnt
  FROM b a JOIN b c ON a.ok = c.ok AND a.pk < c.pk
  GROUP BY 1, 2
)
SELECT part_a, part_b, pair_cnt,
       ia.cnt AS cnt_a, ib.cnt AS cnt_b,
       (pair_cnt * 1000000) // n.n_orders AS support_ppm,
       (pair_cnt * 1000000) // ia.cnt AS confidence_ppm,
       (n.n_orders * pair_cnt * 1000000) // (ia.cnt * ib.cnt) AS lift_ppm
FROM pc JOIN ic ia ON pc.part_a = ia.pk
        JOIN ic ib ON pc.part_b = ib.pk
        CROSS JOIN n
WHERE pair_cnt >= 2
""")
def market_basket_lift(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Association-rule mining over order baskets: support, confidence
    and lift for every part pair co-ordered ≥2 times.

    Scale design: the pair generation is a SELF EQUI-JOIN on the basket
    key — TPC-H baskets hold ≤7 lines, so pairs are ≤C(7,2)=21 per
    order, i.e. LINEAR in order count, never quadratic in parts (this
    is why basket mining shuffles on orderkey, not partkey).  Pair and
    item counts both map-side combine; the item-count relation is
    parts-sized, so it broadcasts back onto the (much larger) pair
    relation, and the single global order count rides along as a
    literal-sized broadcast too.  All three metrics are integer
    parts-per-million with floor division — bit-stable cross-engine.
    At 100 TB the only big exchange is lineitem hashed by orderkey;
    a pathological mega-basket (k² blowup) would be handled the same
    way minhash handles giant LSH buckets: cap basket size and route
    outliers separately.
    """
    li = load(spark, sf_dir, "lineitem")
    b = li.select(F.col("l_orderkey").alias("ok"),
                  F.col("l_partkey").alias("pk")).distinct()
    n_orders = b.select(F.countDistinct("ok").alias("n_orders"))
    ic = b.groupBy(F.col("pk")).agg(F.count("*").alias("cnt"))
    a2, c2 = b.alias("a"), b.alias("c")
    pc = (a2.join(c2, (F.col("a.ok") == F.col("c.ok")) &
                  (F.col("a.pk") < F.col("c.pk")))
          .groupBy(F.col("a.pk").alias("part_a"),
                   F.col("c.pk").alias("part_b"))
          .agg(F.count("*").alias("pair_cnt"))
          .filter(F.col("pair_cnt") >= 2))
    ia = F.broadcast(ic.select(F.col("pk").alias("pk_a"),
                               F.col("cnt").alias("cnt_a")))
    ib = F.broadcast(ic.select(F.col("pk").alias("pk_b"),
                               F.col("cnt").alias("cnt_b")))
    M = F.lit(1000000)
    # integer (floor) division on both engines: Spark `div` ≡ DuckDB `//`
    return (pc.join(ia, F.col("part_a") == F.col("pk_a"))
            .join(ib, F.col("part_b") == F.col("pk_b"))
            .join(F.broadcast(n_orders))
            .select(
                "part_a", "part_b", "pair_cnt", "cnt_a", "cnt_b",
                (F.col("pair_cnt") * M).alias("pm"),
                F.col("n_orders"), (F.col("cnt_a") * F.col("cnt_b")).alias("ab"))
            .selectExpr(
                "part_a", "part_b", "pair_cnt", "cnt_a", "cnt_b",
                "pm div n_orders AS support_ppm",
                "pm div cnt_a AS confidence_ppm",
                "(n_orders * pm) div ab AS lift_ppm"))


# =========================================================================
# Exact Pearson correlation + OLS regression by group ([EXT] — F7)
# =========================================================================

_REG_FINAL = """
SELECT grp, n,
       ROUND((n * sxy - sx * sy) /
             (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)), 9)
           AS pearson_r,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 9) AS slope,
       ROUND((sy - sx * ((n * sxy - sx * sy) / (n * sxx - sx * sx))) / n,
             9) AS intercept_micro
FROM m
"""


@q("corr_regression_exact", ("A1", "F7"), oracle="""
WITH t AS (
  SELECT l_returnflag AS grp,
         CAST(ROUND(l_quantity * 1000000) AS BIGINT) AS x,
         CAST(ROUND(l_discount * 1000000) AS BIGINT) AS y
  FROM lineitem
), m AS (
  SELECT grp,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(x AS DECIMAL(38,0)) * y) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(y AS DECIMAL(38,0)) * y) AS DOUBLE) AS syy
  FROM t GROUP BY grp
)
""" + _REG_FINAL)
def corr_regression_exact(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Per-group Pearson r and simple OLS fit (discount ~ quantity) from
    EXACT moment sums — the closed-form twin of MLlib's summarizer.

    Scale design: one pass, one hash-agg shuffle.  Inputs quantize to
    integer micro-units; the five moment sums accumulate as
    DECIMAL(38,0) (x·y ≤ 5·10¹² per row leaves ~25 orders of magnitude
    of headroom — enough for ~10²⁵ rows), so partial aggregation is
    exact and order-independent — the property that makes the stat
    mergeable across partitions, shards and incremental batches.  Only
    the final per-group ratios drop to DOUBLE, via the same expression
    tree DuckDB evaluates: identical inputs + identical IEEE ops =
    identical bits, then rounded to 9 dp for formatting parity.  This
    is the fit-stage companion of embedding_dim_stats and
    stats_exact_moments (queries_ml.py / queries_analytics.py).
    """
    li = load(spark, sf_dir, "lineitem")
    x = F.round(F.col("l_quantity") * 1000000).cast("long")
    y = F.round(F.col("l_discount") * 1000000).cast("long")
    t = li.select(F.col("l_returnflag").alias("grp"),
                  x.alias("x"), y.alias("y"))
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = t.groupBy("grp").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(dec("x")).cast("double").alias("sx"),
        F.sum(dec("y")).cast("double").alias("sy"),
        F.sum(dec("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(dec("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(dec("y") * F.col("y")).cast("double").alias("syy"))
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    r = (n * sxy - sx * sy) / (F.sqrt(n * sxx - sx * sx) *
                               F.sqrt(n * syy - sy * sy))
    return m.select(
        "grp", "n",
        F.round(r, 9).alias("pearson_r"),
        F.round(slope, 9).alias("slope"),
        F.round((sy - sx * slope) / n, 9).alias("intercept_micro"))


# =========================================================================
# Count-min sketch ([EXT] — A8 family: the mergeable frequency sketch)
# =========================================================================

_CMS = dict(depth=4, width=512, probe_max=100)

# ONE md5 per input row; sketch row d reads its own disjoint 8-hex-char
# (32-bit) slice of the digest — 4 independent-enough hash functions for
# the price of one string hash (the hash dominates the build at scale:
# the 4-md5 version probed 4× slower on the ×10 dataset)


def _cms_buckets(col, depth: int, width: int):
    h = F.md5(F.concat(F.lit("cms:"), col.cast("string")))
    return F.array(*[
        F.conv(F.substring(h, 1 + 8 * d, 8), 16, 10).cast("long") % width
        for d in range(depth)])


def _o_cms_bucket(col: str, width: int) -> str:
    """DuckDB slice for sketch row ``d`` (correlated column)."""
    return (f"(('0x' || substr(md5('cms:' || CAST({col} AS VARCHAR)),"
            f" 1 + 8 * d, 8))::BIGINT % {width})")


@q("countmin_freq_estimate", ("A8", "F9"), oracle=f"""
WITH rows_ AS (SELECT UNNEST(range({_CMS['depth']})) AS d),
sk AS (
  SELECT d, {_o_cms_bucket('l_partkey', _CMS['width'])} AS bucket,
         COUNT(*) AS cnt
  FROM lineitem CROSS JOIN rows_ GROUP BY 1, 2
),
probe AS (SELECT DISTINCT l_partkey AS pk FROM lineitem
          WHERE l_partkey <= {_CMS['probe_max']})
SELECT pk AS part, MIN(cnt) AS est_count
FROM (SELECT p.pk, rows_.d,
             {_o_cms_bucket('p.pk', _CMS['width'])} AS pbucket
      FROM probe p CROSS JOIN rows_) q
JOIN sk ON sk.d = q.d AND sk.bucket = q.pbucket
GROUP BY 1
""")
def countmin_freq_estimate(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Count-min sketch: build a {depth}×{width} frequency sketch of
    l_partkey in one pass, then answer point-frequency queries for the
    probe set (parts ≤ {probe_max}) as min-over-rows.

    Scale design: the sketch is FIXED-SIZE — the groupBy(d, bucket)
    count map-side combines, so each scan partition contributes at most
    depth×width={depth}×{width} rows to the shuffle no matter how many
    fact rows it read; the reduced sketch is KB-sized and broadcasts to
    the probe side.  The expensive portable hash (md5) runs per DISTINCT
    key, not per row: an exact per-key pre-count (long-key hash agg)
    feeds weighted bucket sums — identical sketch, hashing cost bounded
    by key cardinality (probed 11.7s → 1.1s warm at sf0.1).  Counts add, so per-shard / per-hour sketches merge
    by bucket-wise SUM — the same mergeability contract as the HLL
    rollup (hll_mergeable_rollup) and the exact-moment stats; this is
    the heavy-hitter primitive you keep per time-bucket at 100 TB and
    union-merge at query time.  Hashes are md5-derived on both engines,
    so the sketch (and any collision over-count) is bit-identical —
    the oracle replays construction + probe, not a true-count compare
    (heavy_hitters_exact covers ground truth for this family).
    """
    li = load(spark, sf_dir, "lineitem")
    d, w = _CMS["depth"], _CMS["width"]
    # build: exact per-key counts FIRST (a cheap long-key hash agg that
    # map-side combines), then hash only the distinct keys and SUM the
    # weights into buckets — counts add, so the sketch is bit-identical
    # to per-row increments while md5 cost drops from |rows| to |keys|
    kc = li.groupBy("l_partkey").agg(F.count("*").alias("kc"))
    sk = (kc.select("kc",
                    F.posexplode(_cms_buckets(F.col("l_partkey"), d, w))
                    .alias("d", "bucket"))
          .groupBy("d", "bucket").agg(F.sum("kc").alias("cnt")))
    probe = (li.filter(F.col("l_partkey") <= _CMS["probe_max"])
             .select(F.col("l_partkey").alias("pk")).distinct()
             .select("pk", F.posexplode(_cms_buckets(F.col("pk"), d, w))
                     .alias("d", "pbucket")))
    return (probe.join(F.broadcast(sk),
                       (probe.d == sk.d) & (F.col("pbucket") == sk.bucket))
            .groupBy(F.col("pk").alias("part"))
            .agg(F.min("cnt").alias("est_count")))


# =========================================================================
# Grid-bucketed spatial neighbor join ([EXT] — J4/J5 family)
# =========================================================================

_GRID = dict(cell=2000, space=1000000)


@q("spatial_grid_join", ("J4", "J5"), oracle=f"""
WITH pts AS (
  SELECT c_custkey AS id,
         ('0x' || substr(md5('lat:' || CAST(c_custkey AS VARCHAR)), 1, 15))
             ::BIGINT % {_GRID['space']} AS x,
         ('0x' || substr(md5('lon:' || CAST(c_custkey AS VARCHAR)), 1, 15))
             ::BIGINT % {_GRID['space']} AS y
  FROM customer
)
SELECT a.id AS id_a, b.id AS id_b,
       GREATEST(ABS(a.x - b.x), ABS(a.y - b.y)) AS chebyshev
FROM pts a JOIN pts b
  ON a.id < b.id
 AND ABS(a.x - b.x) <= {_GRID['cell']}
 AND ABS(a.y - b.y) <= {_GRID['cell']}
""")
def spatial_grid_join(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """All point pairs within Chebyshev distance {cell} in a
    {space}×{space} integer plane (pseudo-coordinates hashed from
    custkey — the driver tables carry no geo columns, so the geometry
    is synthesized deterministically; the JOIN STRATEGY is the point).

    Scale design: the textbook grid decomposition of a spatial theta
    join.  Cell size = the radius, so any qualifying pair lives in the
    same or one of the 8 neighboring cells; the LEFT side explodes ×9
    (its cell + 8 neighbors), the right side keeps its own cell, and
    the join becomes a plain EQUI-JOIN on cell id — hash-shuffled,
    AQE-skew-splittable, never BroadcastNestedLoopJoin.  Work is
    proportional to Σ(per-cell density²), i.e. local density, not n² —
    the same "bound the candidate space by a locality key" move as the
    interval bucket-grid join and the LSH band join.  id_a < id_b
    dedups the 9-fold candidate multiplicity (each pair found once per
    covering offset, DISTINCT collapses it).  Exact integer Chebyshev
    metric end-to-end.
    """
    cell, space = _GRID["cell"], _GRID["space"]

    def axis(seed: str):
        h = F.md5(F.concat(F.lit(f"{seed}:"), F.col("c_custkey").cast("string")))
        return F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % space

    pts = (load(spark, sf_dir, "customer")
           .select(F.col("c_custkey").alias("id"),
                   axis("lat").alias("x"), axis("lon").alias("y"))
           .withColumn("cx", F.floor(F.col("x") / cell))
           .withColumn("cy", F.floor(F.col("y") / cell)))
    offsets = F.explode(F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)])).alias("o")
    left = (pts.select("id", "x", "y", "cx", "cy", offsets)
            .select(F.col("id").alias("id_a"), F.col("x").alias("xa"),
                    F.col("y").alias("ya"),
                    (F.col("cx") + F.col("o.dx")).alias("jx"),
                    (F.col("cy") + F.col("o.dy")).alias("jy")))
    right = pts.select(F.col("id").alias("id_b"), F.col("x").alias("xb"),
                       F.col("y").alias("yb"), F.col("cx").alias("jx"),
                       F.col("cy").alias("jy"))
    return (left.join(right, ["jx", "jy"])
            .filter((F.col("id_a") < F.col("id_b")) &
                    (F.abs(F.col("xa") - F.col("xb")) <= cell) &
                    (F.abs(F.col("ya") - F.col("yb")) <= cell))
            .select("id_a", "id_b",
                    F.greatest(F.abs(F.col("xa") - F.col("xb")),
                               F.abs(F.col("ya") - F.col("yb")))
                    .alias("chebyshev"))
            .distinct())


# =========================================================================
# Point-in-time (SCD2 as-of) feature join ([EXT] — J4 + W1 composite)
# =========================================================================

@q("scd2_point_in_time_join", ("J4", "W1"), oracle="""
WITH v AS (
  SELECT user_id, event_id AS version_id, ts AS valid_from,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS valid_to,
         event_type AS v_type, value AS v_value
  FROM events WHERE event_type <> 'error'
)
SELECT p.event_id AS probe_id, p.user_id, p.ts,
       v.version_id, v.v_type,
       CAST(ROUND(v.v_value * 1000000) AS BIGINT) AS v_value_micro
FROM (SELECT * FROM events WHERE event_type = 'error') p
LEFT JOIN v ON v.user_id = p.user_id
           AND v.valid_from <= p.ts
           AND (v.valid_to IS NULL OR p.ts < v.valid_to)
""")
def scd2_point_in_time_join(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Point-in-time correct feature join: each probe row ('error'
    events) picks up the SCD2 dimension version (non-error events as
    versions) valid AT ITS OWN timestamp — the feature-store primitive
    that prevents training-data leakage from future dimension states.

    Scale design: NOT executed as the range join the oracle states.
    Because SCD2 validity intervals are contiguous per key
    (valid_to = next valid_from), "the version valid at ts" ≡ "the
    LAST version starting ≤ ts" — a backward as-of join, implemented
    with the union-window trick (operators/asof.py): union versions
    and probes, one shuffle on user_id, one sort on
    (ts, is_probe, id), then last(attr, ignorenulls) over the running
    frame.  Cost is a single exchange of versions+probes and an O(1)
    running state — no per-probe interval search, no range-join row
    explosion, and zero-length versions (same-ts ties) are skipped
    naturally because the later same-ts version overwrites them in
    sort order.  Probes before any version keep NULL features (left
    semantics).  Values quantized to micro bigints for hash parity.
    """
    e = load(spark, sf_dir, "events")
    # version attrs travel as ONE struct so the as-of fill can never mix
    # fields from different versions (a NULL v_value inside a version
    # must stay NULL, not inherit the previous version's value)
    vstruct = F.struct(
        F.col("event_id").alias("version_id"),
        F.col("event_type").alias("v_type"),
        F.round(F.col("value") * 1000000).cast("long").alias("v_value_micro"))
    versions = (e.filter(F.col("event_type") != "error")
                .select("user_id", "ts", "event_id",
                        F.lit(0).alias("is_probe"), vstruct.alias("v")))
    probes = (e.filter(F.col("event_type") == "error")
              .select("user_id", "ts", "event_id",
                      F.lit(1).alias("is_probe"),
                      F.lit(None).cast(
                          "struct<version_id:bigint,v_type:string,"
                          "v_value_micro:bigint>").alias("v")))
    w = (W.partitionBy("user_id")
         .orderBy("ts", "is_probe", "event_id")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    filled = versions.unionByName(probes).select(
        "user_id", "ts", "event_id", "is_probe",
        F.last("v", ignorenulls=True).over(w).alias("v"))
    return (filled.filter(F.col("is_probe") == 1)
            .select(F.col("event_id").alias("probe_id"), "user_id", "ts",
                    F.col("v.version_id").alias("version_id"),
                    F.col("v.v_type").alias("v_type"),
                    F.col("v.v_value_micro").alias("v_value_micro")))


# =========================================================================
# Key-skew profile ([EXT] — the diagnosis behind operators/skew.py)
# =========================================================================

@q("skew_profile", ("A1", "F7"), oracle="""
WITH k AS (SELECT user_id, COUNT(*) AS c FROM events GROUP BY user_id),
n AS (SELECT CAST(SUM(c) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(MAX(c) AS BIGINT) AS top1 FROM k)
SELECT n.n_keys, n.total, n.top1,
       CAST(n.top1 * 1000000 // n.total AS BIGINT) AS top1_share_ppm,
       CAST(SUM(CAST(ROUND(-(CAST(c AS DOUBLE) / n.total) *
           LN(CAST(c AS DOUBLE) / n.total) * 1e9) AS BIGINT)) AS BIGINT)
           AS entropy_nano
FROM k CROSS JOIN n
GROUP BY n.n_keys, n.total, n.top1
""")
def skew_profile(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Partition-key skew diagnosis for the events shuffle key: key
    count, hottest-key share (ppm) and Shannon entropy of the key
    distribution (nats, int64 nanos) in one pass.

    Scale design: this is the query you run BEFORE choosing a
    partitioning — entropy near ln(n_keys) means the key hashes flat;
    a top1 share above ~1/parallelism means one reducer owns the tail
    of the stage and operators/skew.py's salting is warranted.  Cost:
    one map-side-combined key count; everything downstream is
    key-cardinality-sized, the scalar marginals broadcast, and the
    per-key entropy terms round to int64 nanos before the integer sum
    (order-independent, engine-portable).
    """
    e = load(spark, sf_dir, "events")
    k = e.groupBy("user_id").agg(F.count("*").alias("c"))
    n = k.groupBy().agg(F.sum("c").cast("long").alias("total"),
                        F.count("*").cast("long").alias("n_keys"),
                        F.max("c").cast("long").alias("top1"))
    p = F.col("c").cast("double") / F.col("total")
    term = F.round(-p * F.log(p) * 1e9).cast("long")
    return (k.join(F.broadcast(n))
            .groupBy("n_keys", "total", "top1")
            .agg(F.sum(term).cast("long").alias("entropy_nano"))
            .selectExpr("n_keys", "total", "top1",
                        "(top1 * 1000000) div total AS top1_share_ppm",
                        "entropy_nano")
            .select("n_keys", "total", "top1", "top1_share_ppm",
                    "entropy_nano"))


# =========================================================================
# Join-size estimation ([EXT] — planner observability without the join)
# =========================================================================

@q("join_size_estimate", ("A1", "J1"), oracle="""
WITH a AS (SELECT l_orderkey AS k, COUNT(*) AS ca FROM lineitem GROUP BY 1),
b AS (SELECT o_orderkey AS k, COUNT(*) AS cb FROM orders GROUP BY 1)
SELECT CAST((SELECT COUNT(*) FROM a) AS BIGINT) AS nd_a,
       CAST((SELECT COUNT(*) FROM b) AS BIGINT) AS nd_b,
       CAST(SUM(ca * cb) AS BIGINT) AS exact_join_rows,
       CAST(MAX(ca * cb) AS BIGINT) AS max_key_product
FROM a JOIN b USING (k)
""")
def join_size_estimate(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Exact output cardinality of lineitem⋈orders — computed WITHOUT
    running the join: Σ_k ca(k)·cb(k) over per-side key histograms,
    plus the max per-key product (the skew red flag).

    Scale design: the planner-observability primitive — both key
    histograms map-side combine (the shuffle carries distinct keys,
    not facts), the histogram join is key-cardinality-sized, and the
    two output statistics tell you (a) whether the real join's output
    fits your stage budget and (b) whether one key will hot-spot a
    reducer (max_key_product ≫ mean ⇒ pre-salt).  This is how an
    engine should answer "dare we run this join?" — a KB-scale dry
    run, not an OOM discovery.
    """
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    a = li.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.count("*").alias("ca"))
    b = o.groupBy(F.col("o_orderkey").alias("k")).agg(
        F.count("*").alias("cb"))
    nd = a.groupBy().agg(F.count("*").cast("long").alias("nd_a")).crossJoin(
        b.groupBy().agg(F.count("*").cast("long").alias("nd_b")))
    j = (a.join(b, "k")
         .groupBy().agg(F.sum(F.col("ca") * F.col("cb")).cast("long")
                        .alias("exact_join_rows"),
                        F.max(F.col("ca") * F.col("cb")).cast("long")
                        .alias("max_key_product")))
    return (F.broadcast(nd).crossJoin(j)
            .select("nd_a", "nd_b", "exact_join_rows", "max_key_product"))


# =========================================================================
# Two-feature OLS via centered normal equations ([EXT])
# =========================================================================

@q("ols_two_feature", ("A1", "F7"), oracle="""
WITH t AS (
  SELECT l_returnflag AS grp,
         CAST(ROUND(l_quantity * 100) AS BIGINT) AS x1,
         CAST(ROUND(l_discount * 1000000) AS BIGINT) AS x2,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
  FROM lineitem
), m AS (
  SELECT grp, CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(x1 AS DECIMAL(38,0))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(x2 AS DECIMAL(38,0))) AS DOUBLE) AS s2,
         CAST(SUM(CAST(y  AS DECIMAL(38,0))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(x1 AS DECIMAL(38,0)) * x1) AS DOUBLE) AS s11,
         CAST(SUM(CAST(x1 AS DECIMAL(38,0)) * x2) AS DOUBLE) AS s12,
         CAST(SUM(CAST(x2 AS DECIMAL(38,0)) * x2) AS DOUBLE) AS s22,
         CAST(SUM(CAST(x1 AS DECIMAL(38,0)) * y)  AS DOUBLE) AS s1y,
         CAST(SUM(CAST(x2 AS DECIMAL(38,0)) * y)  AS DOUBLE) AS s2y,
         CAST(SUM(CAST(y  AS DECIMAL(38,0)) * y)  AS DOUBLE) AS syy
  FROM t GROUP BY grp
), c AS (
  SELECT grp, n, s1, s2, sy,
         s11 - s1 * s1 / n AS c11,
         s12 - s1 * s2 / n AS c12,
         s22 - s2 * s2 / n AS c22,
         s1y - s1 * sy / n AS c1y,
         s2y - s2 * sy / n AS c2y,
         syy - sy * sy / n AS cyy
  FROM m
)
SELECT grp, CAST(n AS BIGINT) AS n,
       ROUND((c22 * c1y - c12 * c2y) / (c11 * c22 - c12 * c12), 9) AS b1,
       ROUND((c11 * c2y - c12 * c1y) / (c11 * c22 - c12 * c12), 9) AS b2,
       ROUND((sy - ((c22 * c1y - c12 * c2y) / (c11 * c22 - c12 * c12)) * s1
                 - ((c11 * c2y - c12 * c1y) / (c11 * c22 - c12 * c12)) * s2)
             / n, 6) AS intercept,
       ROUND((((c22 * c1y - c12 * c2y) / (c11 * c22 - c12 * c12)) * c1y
            + ((c11 * c2y - c12 * c1y) / (c11 * c22 - c12 * c12)) * c2y)
             / cyy, 9) AS r2
FROM c
""")
def ols_two_feature(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Multiple regression price ~ quantity + discount per group, solved
    in closed form from centered normal equations (2×2 Cramer) over
    exact DECIMAL(38,0) moment sums — the d-feature generalization of
    corr_regression_exact (the moment matrix is d², the pattern holds
    for any small feature set).

    Scale design: identical profile to the single-feature fit — ONE
    hash-agg pass accumulates the 10 moments exactly (mergeable across
    partitions/shards/batches), and the solve is per-group constant
    work in deterministic double arithmetic (same expression tree both
    engines).  This is the distributed "fit a linear probe" primitive:
    no gradient loop, no second scan, bit-stable.
    """
    li = load(spark, sf_dir, "lineitem")
    t = li.select(
        F.col("l_returnflag").alias("grp"),
        F.round(F.col("l_quantity") * 100).cast("long").alias("x1"),
        F.round(F.col("l_discount") * 1000000).cast("long").alias("x2"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"))
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = t.groupBy("grp").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(dec("x1")).cast("double").alias("s1"),
        F.sum(dec("x2")).cast("double").alias("s2"),
        F.sum(dec("y")).cast("double").alias("sy"),
        F.sum(dec("x1") * F.col("x1")).cast("double").alias("s11"),
        F.sum(dec("x1") * F.col("x2")).cast("double").alias("s12"),
        F.sum(dec("x2") * F.col("x2")).cast("double").alias("s22"),
        F.sum(dec("x1") * F.col("y")).cast("double").alias("s1y"),
        F.sum(dec("x2") * F.col("y")).cast("double").alias("s2y"),
        F.sum(dec("y") * F.col("y")).cast("double").alias("syy"))
    n, s1, s2, sy = F.col("n"), F.col("s1"), F.col("s2"), F.col("sy")
    c11 = F.col("s11") - s1 * s1 / n
    c12 = F.col("s12") - s1 * s2 / n
    c22 = F.col("s22") - s2 * s2 / n
    c1y = F.col("s1y") - s1 * sy / n
    c2y = F.col("s2y") - s2 * sy / n
    cyy = F.col("syy") - sy * sy / n
    det = c11 * c22 - c12 * c12
    b1 = (c22 * c1y - c12 * c2y) / det
    b2 = (c11 * c2y - c12 * c1y) / det
    return m.select(
        "grp", n.cast("long").alias("n"),
        F.round(b1, 9).alias("b1"),
        F.round(b2, 9).alias("b2"),
        F.round((sy - b1 * s1 - b2 * s2) / n, 6).alias("intercept"),
        F.round((b1 * c1y + b2 * c2y) / cyy, 9).alias("r2"))


# =========================================================================
# Weighted sample without replacement ([EXT] — A-ES / priority sampling)
# =========================================================================

_WSAMP = dict(k=100, mod=1 << 40)


@q("weighted_sample_topk", ("W3", "F7"), oracle=f"""
WITH t AS (
  SELECT o_orderkey AS order_id,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS weight_cents,
         (('0x' || substr(md5('ws:' || CAST(o_orderkey AS VARCHAR)), 1, 10))
             ::BIGINT % {_WSAMP['mod']}) AS h
  FROM orders
), p AS (
  SELECT order_id, weight_cents,
         POW((h + 0.5) / {_WSAMP['mod']},
             1.0 / CAST(weight_cents AS DOUBLE)) AS priority
  FROM t
)
SELECT order_id, weight_cents
FROM p ORDER BY priority DESC, order_id LIMIT {_WSAMP['k']}
""")
def weighted_sample_topk(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Weighted sample WITHOUT replacement, k={k}: Efraimidis–Spirakis
    A-ES priority sampling — each row draws u ∈ (0,1) from a
    deterministic md5 coin and survives if u^(1/w) ranks top-k.
    Inclusion probability is proportional to weight (here order value),
    the estimator behind weighted corpus subsampling and pay-as-you-go
    data valuation.

    Scale design: A-ES is THE distributed weighted-sampling algorithm —
    priorities are computed map-side (one hash + one pow per row, no
    state), and top-k by priority is TakeOrderedAndProject: each
    partition surrenders at most k rows, merged on the driver; no
    global sort, no second pass, and per-shard top-k lists MERGE (take
    the k best of the union), so the sample maintains itself
    incrementally.  The md5 coin (not rand()) makes the sample
    reproducible across engines, retries and backfills — same property
    as hash_sample_stratified, extended to weighted inclusion.
    """
    o = load(spark, sf_dir, "orders")
    mod = _WSAMP["mod"]
    h = (F.conv(F.substring(
        F.md5(F.concat(F.lit("ws:"), F.col("o_orderkey").cast("string"))),
        1, 10), 16, 10).cast("long") % mod)
    w = F.round(F.col("o_totalprice") * 100).cast("long")
    p = o.select(F.col("o_orderkey").alias("order_id"),
                 w.alias("weight_cents"),
                 F.pow((h + 0.5) / mod,
                       1.0 / w.cast("double")).alias("priority"))
    return (p.orderBy(F.col("priority").desc(), "order_id")
            .limit(_WSAMP["k"]).select("order_id", "weight_cents"))


@q("mode_median_by_group", ("A1", "A8"), oracle="""
SELECT l_returnflag AS flag,
       mode(l_quantity ORDER BY l_quantity) AS mode_qty,
       median(l_quantity) AS median_qty,
       quantile_disc(l_quantity, 0.5) AS median_disc_qty
FROM lineitem GROUP BY 1
""")
def mode_median_by_group(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Order-statistic aggregates the sketch family can't replace:
    exact per-group ``mode`` (deterministic: Spark 4's mode(
    deterministic=true) returns the LOWEST most-frequent value, matching
    DuckDB's ORDER BY tie-break), exact continuous ``median`` (float-
    exact here: quantity medians are dyadic), and the discrete median
    (``percentile(..., DISC)`` ⇔ quantile_disc — the value form a
    "typical order size" dashboard wants).  All three run in ONE
    grouped aggregate pass; at 100 TB mode swaps for the count-min
    heavy-hitter sketch (gated separately) and median for
    percentile_approx — same query shape."""
    li = load(spark, sf_dir, "lineitem")
    return (li.groupBy(F.col("l_returnflag").alias("flag"))
            .agg(F.expr("mode(l_quantity, false)").alias("mode_qty"),
                 F.median("l_quantity").alias("median_qty"),
                 F.expr("percentile_disc(0.5) WITHIN GROUP "
                        "(ORDER BY l_quantity)")
                 .alias("median_disc_qty")))


@q("segment_overlap_distinct", ("A2", "A8", "J5"), oracle="""
WITH ut AS (
  SELECT DISTINCT user_id, event_type FROM events
), sz AS (
  SELECT event_type, COUNT(*) AS n FROM ut GROUP BY 1
), inter AS (
  SELECT a.event_type AS seg_a, b.event_type AS seg_b,
         COUNT(*) AS n_inter
  FROM ut a JOIN ut b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT i.seg_a, i.seg_b,
       sa.n AS n_a, sb.n AS n_b, i.n_inter,
       sa.n + sb.n - i.n_inter AS n_union,
       CAST(i.n_inter AS DOUBLE) / (sa.n + sb.n - i.n_inter) AS jaccard
FROM inter i
JOIN sz sa ON i.seg_a = sa.event_type
JOIN sz sb ON i.seg_b = sb.event_type
""")
def segment_overlap_distinct(spark: "SparkSession", sf_dir: str
                             ) -> "DataFrame":
    """Exact distinct-user overlap between every pair of behavioral
    segments (event types): |A|, |B|, |A∩B|, |A∪B| and Jaccard — the
    audience-overlap question theta sketches exist to answer
    (HLL unions but cannot intersect; theta sketches intersect
    approximately; this is the exact ground truth the sketch path is
    validated against, the same exact-twin discipline as
    `heavy_hitters_exact` for frequent-items).

    Scale design: dedup to distinct (user, segment) FIRST (one
    shuffle, map-side combine), then self-join on user_id — each user
    contributes at most |segments|² pairs, so the blow-up is bounded
    by segment-count², never user-count².  Segment sizes ride a
    separate segment-keyed aggregate; the final joins are
    segment-cardinality-sized.  At 100 TB with thousands of segments,
    swap the exact intersection for theta sketches per segment and
    keep THIS query on a hash-sample as the recall gate.
    """
    e = load(spark, sf_dir, "events")
    ut = e.select("user_id", "event_type").distinct()
    sz = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a, b = ut.alias("a"), ut.alias("b")
    inter = (a.join(b, (F.col("a.user_id") == F.col("b.user_id")) &
                    (F.col("a.event_type") < F.col("b.event_type")))
             .groupBy(F.col("a.event_type").alias("seg_a"),
                      F.col("b.event_type").alias("seg_b"))
             .agg(F.count(F.lit(1)).alias("n_inter")))
    sa = sz.select(F.col("event_type").alias("seg_a"),
                   F.col("n").alias("n_a"))
    sb = sz.select(F.col("event_type").alias("seg_b"),
                   F.col("n").alias("n_b"))
    u = F.col("n_a") + F.col("n_b") - F.col("n_inter")
    return (inter.join(sa, "seg_a").join(sb, "seg_b")
            .select("seg_a", "seg_b", "n_a", "n_b", "n_inter",
                    u.alias("n_union"),
                    (F.col("n_inter").cast("double") / u)
                    .alias("jaccard")))


_KMV_K = 64


@q("segment_overlap_kmv", ("A8", "W3"), oracle=f"""
WITH ut AS (
  SELECT DISTINCT user_id, event_type FROM events
), h AS (
  SELECT DISTINCT event_type,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
           AS hv
  FROM ut
), sk AS (
  SELECT event_type, hv FROM (
    SELECT event_type, hv,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) AS r
    FROM h
  ) WHERE r <= {_KMV_K}
), uni AS (
  SELECT s1.event_type AS seg_a, s2.event_type AS seg_b, hv
  FROM (SELECT DISTINCT event_type FROM sk) s1
  JOIN (SELECT DISTINCT event_type FROM sk) s2
    ON s1.event_type < s2.event_type
  JOIN sk u ON u.event_type IN (s1.event_type, s2.event_type)
  GROUP BY 1, 2, hv
), unionk AS (
  SELECT seg_a, seg_b, hv,
         ROW_NUMBER() OVER (PARTITION BY seg_a, seg_b ORDER BY hv) AS r
  FROM uni
), theta AS (
  SELECT seg_a, seg_b, COUNT(*) AS ku
  FROM unionk WHERE r <= {_KMV_K} GROUP BY 1, 2
), inboth AS (
  SELECT u.seg_a, u.seg_b,
         COUNT(*) FILTER (WHERE a.hv IS NOT NULL
                          AND b.hv IS NOT NULL) AS n_both
  FROM (SELECT seg_a, seg_b, hv FROM unionk WHERE r <= {_KMV_K}) u
  LEFT JOIN sk a ON a.event_type = u.seg_a AND a.hv = u.hv
  LEFT JOIN sk b ON b.event_type = u.seg_b AND b.hv = u.hv
  GROUP BY 1, 2
)
SELECT t.seg_a, t.seg_b, t.ku::INT AS k_union,
       i.n_both::INT AS n_both,
       CAST(i.n_both AS DOUBLE) / t.ku AS jaccard_est
FROM theta t JOIN inboth i USING (seg_a, seg_b)
""")
def segment_overlap_kmv(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Approximate segment overlap via K-Minimum-Values sketches — the
    scale path beside ``segment_overlap_distinct``'s exact twin: per
    segment keep the K smallest md5(user) values; for each segment
    pair, Jaccard ≈ |both-sketch members among the union's K smallest|
    / K (Beyer et al., SIGMOD'07).  md5 makes the sketch DETERMINISTIC,
    so the estimate itself is oracle-gated — the approximation is
    certified, not just the machinery.

    Scale design: sketches are K rows per segment (a per-segment top-K
    window with WindowGroupLimit partial ranking — no full sort);
    everything pairwise happens between K-row sketches, so pair cost is
    segments²·K regardless of user count.  The exact query above is
    the recall gate; at production segment counts only this one runs.
    """
    e = load(spark, sf_dir, "events")
    ut = e.select("user_id", "event_type").distinct()
    hv = (F.conv(F.substring(
        F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint"))
    # the sketch is a SET of hash values: distinct first, so a 60-bit
    # collision between two users in one segment contributes one value
    # (and the membership joins below cannot fan out)
    h = ut.select("event_type", hv.alias("hv")).distinct()
    w = W.partitionBy("event_type").orderBy("hv")
    sk = (h.withColumn("r", F.row_number().over(w))
          .filter(F.col("r") <= _KMV_K).drop("r").cache())
    segs = sk.select("event_type").distinct()
    sp = (segs.alias("s1").join(
        segs.alias("s2"),
        F.col("s1.event_type") < F.col("s2.event_type"))
        .select(F.col("s1.event_type").alias("seg_a"),
                F.col("s2.event_type").alias("seg_b")))
    # union sample: both sketches' values per pair, deduped, K smallest
    ua = sp.join(sk.select(F.col("event_type").alias("seg_a"), "hv"),
                 "seg_a")
    ub = sp.join(sk.select(F.col("event_type").alias("seg_b"), "hv"),
                 "seg_b")
    uni = ua.unionByName(ub).distinct()
    wk = W.partitionBy("seg_a", "seg_b").orderBy("hv")
    unionk = (uni.withColumn("r", F.row_number().over(wk))
              .filter(F.col("r") <= _KMV_K).drop("r"))
    a_side = sk.select(F.col("event_type").alias("et_a"),
                       F.col("hv").alias("hv_a"))
    b_side = sk.select(F.col("event_type").alias("et_b"),
                       F.col("hv").alias("hv_b"))
    # k_union is a property of the union sample alone — count it BEFORE
    # the membership joins (the oracle's theta CTE does the same)
    kcnt = unionk.groupBy("seg_a", "seg_b").agg(
        F.count(F.lit(1)).cast("int").alias("k_union"))
    marked = (unionk
              .join(a_side, (F.col("seg_a") == F.col("et_a")) &
                    (F.col("hv") == F.col("hv_a")), "left")
              .join(b_side, (F.col("seg_b") == F.col("et_b")) &
                    (F.col("hv") == F.col("hv_b")), "left"))
    both = (marked.groupBy("seg_a", "seg_b")
            .agg(F.count_if(F.col("hv_a").isNotNull() &
                            F.col("hv_b").isNotNull())
                 .cast("int").alias("n_both")))
    return (kcnt.join(both, ["seg_a", "seg_b"])
            .select("seg_a", "seg_b", "k_union", "n_both",
                    (F.col("n_both").cast("double") / F.col("k_union"))
                    .alias("jaccard_est")))


# Interpolate the parameter placeholders into the real
# __doc__ attributes (a '"""...""".format(...)' first statement
# is a discarded expression, not a docstring — help()/inspect
# saw None for these functions until this pass).
countmin_freq_estimate.__doc__ = countmin_freq_estimate.__doc__.format(**_CMS)
spatial_grid_join.__doc__ = spatial_grid_join.__doc__.format(**_GRID)
weighted_sample_topk.__doc__ = weighted_sample_topk.__doc__.format(**_WSAMP)


# =========================================================================
# Mergeable quantile sketch ([EXT] A8/A6 — the quantile slot of the
# sketch family: HLL=distinct, CMS=frequency, KMV=overlap, this=order
# statistics; operators/qsketch.py holds the algebra + rationale)
# =========================================================================

_QSK = {"k": 64, "tol_ppm": 250_000}

#: shared oracle recipe — the hour→day bottom-k merge replayed in SQL
#: (same md5 domain, same row_number cuts), ending in CTE ``dsk``
#: (day-level sketch rows) and ``est`` (per-day order-statistic
#: estimates).  Both sketch queries compose it so the sample logic
#: cannot drift between the rollup and its error gate.
_QSK_CTE = f"""
base AS (
  SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
         DATE_TRUNC('hour', ts) AS hr, value, event_id,
         md5('qsk:' || CAST(event_id AS VARCHAR)) AS h
  FROM events WHERE value IS NOT NULL
), hsk AS (
  SELECT day, value, event_id, h FROM (
    SELECT base.*,
           ROW_NUMBER() OVER (PARTITION BY day, hr ORDER BY h) AS rn
    FROM base) WHERE rn <= {_QSK['k']}
), dsk AS (
  SELECT day, value, event_id, h FROM (
    SELECT hsk.*,
           ROW_NUMBER() OVER (PARTITION BY day ORDER BY h) AS rn2
    FROM hsk) WHERE rn2 <= {_QSK['k']}
), pos AS (
  SELECT day, value,
         ROW_NUMBER() OVER (PARTITION BY day
                            ORDER BY value, event_id) AS vr,
         COUNT(*) OVER (PARTITION BY day) AS m
  FROM dsk
), est AS (
  SELECT day, MAX(m) AS m,
         MAX(CASE WHEN vr = ((m-1)*50)//100 + 1 THEN value END)
           AS p50_est,
         MAX(CASE WHEN vr = ((m-1)*90)//100 + 1 THEN value END)
           AS p90_est
  FROM pos GROUP BY day
)"""


def _qsk_day_est(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Shared Spark recipe behind both sketch queries: hour sketches →
    merged day sketch → per-day p50/p90 order-statistic estimates."""
    from .operators.qsketch import bottom_k, sample_quantiles, sketch_hash
    from .queries import load
    e = load(spark, sf_dir, "events")
    base = (e.filter(F.col("value").isNotNull())
            .select(F.date_trunc("day", "ts").alias("day"),
                    F.date_trunc("hour", "ts").alias("hr"),
                    "value", "event_id",
                    sketch_hash(F.col("event_id")).alias("h")))
    hsk = bottom_k(base, ["day", "hr"], _QSK["k"])
    dsk = bottom_k(hsk.drop("hr"), ["day"], _QSK["k"])
    return sample_quantiles(dsk, ["day"], "value", "event_id", (50, 90))


@q("quantile_sketch_rollup", ("A8", "A6"), oracle=f"""
WITH {_QSK_CTE}
SELECT day, m, p50_est, p90_est FROM est
""")
def quantile_sketch_rollup(spark: "SparkSession",
                           sf_dir: str) -> "DataFrame":
    """Hierarchical quantile rollup via the mergeable bottom-k sketch:
    per-HOUR sketches (k={k}) merged upward into per-DAY sketches,
    then p50/p90 read off the merged sample — the t-digest/KLL rollup
    pattern (hour→day→week re-aggregation without re-reading raw
    data), in the deterministic form a SQL oracle can replay exactly
    (operators/qsketch.py documents why t-digest itself cannot be
    oracle-gated: centroid merges are order-dependent).

    Scale design: ONE shuffle over raw events (on the hour key) cuts
    every hour to ≤k rows; the day merge unions hour sketches —
    24k rows/day, KB-sized — and re-cuts, so adding week/month levels
    costs only sketch-sized merges.  The semilattice law (merged ==
    direct bottom-k, asserted on real data in tests/test_qsketch.py)
    means the merge TREE is free to follow the partition layout at
    100 TB.  Estimates are picked raw values at integer positions —
    hash-exact vs DuckDB."""
    return _qsk_day_est(spark, sf_dir)


@q("quantile_sketch_error_eval", ("A8", "A6"), oracle=f"""
WITH {_QSK_CTE},
ev AS (
  SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day, value
  FROM events WHERE value IS NOT NULL
)
SELECT ev.day, est.m, COUNT(*) AS n,
       (COUNT(CASE WHEN ev.value <= est.p50_est THEN 1 END)
        * 1000000) // COUNT(*) AS r50_ppm,
       (COUNT(CASE WHEN ev.value <= est.p90_est THEN 1 END)
        * 1000000) // COUNT(*) AS r90_ppm,
       ABS((COUNT(CASE WHEN ev.value <= est.p50_est THEN 1 END)
            * 1000000) // COUNT(*) - 500000) <= {_QSK['tol_ppm']}
         AS ok50,
       ABS((COUNT(CASE WHEN ev.value <= est.p90_est THEN 1 END)
            * 1000000) // COUNT(*) - 900000) <= {_QSK['tol_ppm']}
         AS ok90
FROM ev JOIN est ON ev.day = est.day
GROUP BY ev.day, est.m, est.p50_est, est.p90_est
""")
def quantile_sketch_error_eval(spark: "SparkSession",
                               sf_dir: str) -> "DataFrame":
    """Measured rank error of the sketch estimates — the honesty gate
    for the approximation (the ann_recall_eval pattern): for each day,
    the TRUE rank (in ppm of the full day's rows) of the sketched
    p50/p90, and whether it sits within ±{tol_ppm} ppm of the target.
    Hoeffding bounds the k={k} sample's rank error at ~sqrt(q(1-q)/k)
    ≈ 6%% ranks (1σ) at the median, so the tolerance is ~4σ — a
    failure means the sketch algebra broke, not bad luck.

    Scale design: the eval joins day estimates (calendar-bounded, hard
    broadcast is safe) back to raw events and reduces map-side to
    per-day counts — one scan, one day-keyed shuffle of counters.  All
    rank math in integer ppm (non-negative floor division), so the
    verdict booleans are bit-stable across engines."""
    est = quantile_sketch_rollup(spark, sf_dir)
    from .queries import load
    ev = (load(spark, sf_dir, "events")
          .filter(F.col("value").isNotNull())
          .select(F.date_trunc("day", "ts").alias("day"), "value"))
    j = ev.join(F.broadcast(est), "day")
    agg = (j.groupBy("day")
           .agg(F.max("m").alias("m"),
                F.count(F.lit(1)).alias("n"),
                F.count(F.when(F.col("value") <= F.col("p50_est"), 1))
                .alias("_c50"),
                F.count(F.when(F.col("value") <= F.col("p90_est"), 1))
                .alias("_c90")))
    def _ppm(c):
        t = F.col(c) * 1000000
        return ((t - t % F.col("n")) / F.col("n")).cast("long")
    return (agg.select("day", "m", "n",
                       _ppm("_c50").alias("r50_ppm"),
                       _ppm("_c90").alias("r90_ppm"))
            .select("day", "m", "n", "r50_ppm", "r90_ppm",
                    (F.abs(F.col("r50_ppm") - 500000)
                     <= _QSK["tol_ppm"]).alias("ok50"),
                    (F.abs(F.col("r90_ppm") - 900000)
                     <= _QSK["tol_ppm"]).alias("ok90")))


quantile_sketch_rollup.__doc__ = \
    quantile_sketch_rollup.__doc__.format(k=_QSK["k"])
quantile_sketch_error_eval.__doc__ = \
    quantile_sketch_error_eval.__doc__.format(k=_QSK["k"],
                                              tol_ppm=_QSK["tol_ppm"])
