"""TPC-H-shaped analytics queries (Q1/Q3/Q5 silhouettes) on the driver
tables — breadth beyond the reference's own narrow join/agg surface,
exercising multi-aggregate scans, join+agg+top-N, and a 5-way join.

(Public TPC-H query shapes; constants adapted to the driver's synthetic
data ranges.)
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .operators.hints import maybe_broadcast
from .queries import davg, dsum, load, oavg, osum, q

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession


@q("tpch_q1_pricing_summary", ("A1", "P6", "F7"), bench=True, oracle=f"""
SELECT l_returnflag AS flag, l_linestatus AS status,
       {osum('l_quantity')} AS sum_qty,
       {osum('l_extendedprice')} AS sum_base_price,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                * CAST(1 - l_discount AS DECIMAL(18,4))), 4) AS DOUBLE)
         AS sum_disc_price,
       {oavg('l_quantity')} AS avg_qty,
       {oavg('l_discount')} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY 1, 2
""")
def tpch_q1_pricing_summary(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Q1 silhouette: one filtered scan, 6 aggregates, 2 group keys —
    the canonical map-side-combine stress test.  The discount product
    runs in exact decimal (decimal×decimal) for oracle determinism."""
    li = load(spark, sf_dir, "lineitem")
    disc_price = (F.col("l_extendedprice").cast("decimal(18,4)") *
                  (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)"))
    return (li.filter(F.col("l_shipdate") <= "1998-09-02")
            .groupBy(F.col("l_returnflag").alias("flag"),
                     F.col("l_linestatus").alias("status"))
            .agg(dsum("l_quantity").alias("sum_qty"),
                 dsum("l_extendedprice").alias("sum_base_price"),
                 F.round(F.sum(disc_price), 4).cast("double").alias("sum_disc_price"),
                 davg("l_quantity").alias("avg_qty"),
                 davg("l_discount").alias("avg_disc"),
                 F.count(F.lit(1)).alias("count_order")))


@q("tpch_q3_shipping_priority", ("J1", "A1", "W3"), oracle=f"""
SELECT l.l_orderkey AS order_id,
       CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                * CAST(1 - l.l_discount AS DECIMAL(18,4))), 4) AS DOUBLE)
         AS revenue,
       CAST(o.o_orderdate AS DATE) AS order_date
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY 1, 3
ORDER BY revenue DESC, order_id LIMIT 10
""")
def tpch_q3_shipping_priority(spark: "SparkSession",
                              sf_dir: str) -> "DataFrame":
    """Q3 silhouette: selective dim filter → join → agg → top-N.  The
    customer filter broadcasts; TakeOrderedAndProject avoids a full
    sort of the aggregate."""
    c = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    disc_price = (F.col("l_extendedprice").cast("decimal(18,4)") *
                  (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)"))
    return (li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .join(maybe_broadcast(c), o["o_custkey"] == c["c_custkey"])
            .groupBy(li["l_orderkey"].alias("order_id"),
                     o["o_orderdate"].cast("date").alias("order_date"))
            .agg(F.round(F.sum(disc_price), 4).cast("double").alias("revenue"))
            .orderBy(F.col("revenue").desc(), "order_id").limit(10))


@q("tpch_q6_forecast_revenue", ("P5", "A4", "F7"), bench=True, oracle="""
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
              * CAST(l_discount AS DECIMAL(18,4))), 4) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""")
def tpch_q6_forecast_revenue(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Q6 silhouette: pure filter + global aggregate, zero joins — the
    canonical predicate-pushdown benchmark.  All three predicates reach
    the parquet scan (PushedFilters) and only 4 columns are read; the
    agg is a single partial→final reduction with no wide shuffle.
    (Constants adapted to the driver data's 1995-2001 shipdate range.)"""
    li = load(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice").cast("decimal(18,4)") *
           F.col("l_discount").cast("decimal(18,4)"))
    return (li.filter((F.col("l_shipdate") >= "1996-01-01") &
                      (F.col("l_shipdate") < "1997-01-01") &
                      (F.col("l_discount").between(0.05, 0.07)) &
                      (F.col("l_quantity") < 24))
            .agg(F.round(F.sum(rev), 4).cast("double").alias("revenue"),
                 F.count(F.lit(1)).alias("n_items")))


@q("tpch_q4_order_priority", ("J3", "A1", "F2"), oracle="""
SELECT o.o_orderpriority AS priority, COUNT(*) AS n_orders
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY 1
""")
def tpch_q4_order_priority(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Q4 silhouette: EXISTS with a cross-table predicate → left-semi
    join whose condition references both sides, then a tiny agg.  The
    semi join shuffles both sides on orderkey once; the count-by-
    priority agg is over the already-reduced orders side.  (The driver
    lineitem has no commit/receipt dates, so the "late" predicate is
    adapted to shipdate > orderdate + 60 days.)"""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = ((o["o_orderkey"] == li["l_orderkey"]) &
            (li["l_shipdate"] > F.col("o_orderdate") +
             F.expr("INTERVAL 60 DAYS")))
    return (o.join(li, cond, "left_semi")
            .groupBy(F.col("o_orderpriority").alias("priority"))
            .agg(F.count(F.lit(1)).alias("n_orders")))


@q("tpch_q18_large_volume", ("A4", "J1", "W3"), oracle=f"""
WITH big AS (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
)
SELECT c.c_name AS name, c.c_custkey AS customer,
       o.o_orderkey AS order_id, CAST(o.o_orderdate AS DATE) AS order_date,
       o.o_totalprice AS total_price,
       {osum('l.l_quantity')} AS sum_qty
FROM orders o
JOIN big ON big.l_orderkey = o.o_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY 1, 2, 3, 4, 5
ORDER BY total_price DESC, order_id LIMIT 100
""")
def tpch_q18_large_volume(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Q18 silhouette: aggregate-derived semi filter (orders whose line
    quantity total clears a threshold) joined back to the fact.  The
    `big` set is small after the HAVING, so it broadcasts into the
    orders probe; lineitem is aggregated once on its natural key (no
    re-shuffle for the second join at scale with AQE).  Top-100 via
    TakeOrderedAndProject, never a global sort."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    # distinct lineage for the semi side: the filter-join below would
    # otherwise be an ambiguous self-join against `li`
    big = (load(spark, sf_dir, "lineitem")
           .groupBy(F.col("l_orderkey").alias("big_orderkey"))
           .agg(dsum("l_quantity").alias("_q"))
           .filter(F.col("_q") > 150)
           .select("big_orderkey"))
    return (o.join(maybe_broadcast(big), o["o_orderkey"] == big["big_orderkey"])
            .join(maybe_broadcast(c), c["c_custkey"] == o["o_custkey"])
            .join(li, li["l_orderkey"] == o["o_orderkey"])
            .groupBy(c["c_name"].alias("name"),
                     c["c_custkey"].alias("customer"),
                     o["o_orderkey"].alias("order_id"),
                     o["o_orderdate"].cast("date").alias("order_date"),
                     o["o_totalprice"].alias("total_price"))
            .agg(dsum(li["l_quantity"]).alias("sum_qty"))
            .orderBy(F.col("total_price").desc(), "order_id").limit(100))


@q("tpch_q5_local_volume", ("J1", "A1", "F7"), bench=True, oracle=f"""
SELECT n.n_name AS nation,
       CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                * CAST(1 - l.l_discount AS DECIMAL(18,4))), 4) AS DOUBLE)
         AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
              AND s.s_nationkey = c.c_nationkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY 1
""")
def tpch_q5_local_volume(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Q5 silhouette: 6-table join with a same-nation constraint.  Only
    lineitem⋈orders shuffles; customer/supplier/nation/region all
    broadcast, and the region filter prunes before joining."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    disc_price = (F.col("l_extendedprice").cast("decimal(18,4)") *
                  (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)"))
    # Size-gated join order (optimization r12, guide §3.2 "reduce the
    # big side before shuffling it").  CBO is off, so the WRITTEN
    # order is the executed order, and the right order flips with
    # customer's size — measured at three scales (interleaved A/B,
    # plans/r12/ab_q5.json):
    #
    # - customer PROVABLY BROADCASTABLE (sf0.1 scan ~1 MB, ×10 ~30 MB
    #   ≤ the 64 MB hint gate): the classic shape is optimal — ONE big
    #   shuffle (lineitem⋈orders), every dim side a broadcast.  The
    #   selective-first variant was 15% (sf0.1) to 1.6× (×10) SLOWER
    #   there: it pays an extra orders-sized exchange for pruning the
    #   big join's probe side, which the broadcast chain got for free.
    # - customer NOT broadcastable (×100 scan ~300 MB; any real
    #   scale): the classic shape degrades catastrophically — the
    #   customer join reshuffles the LINEITEM-SIZED join output by
    #   custkey (a second full shuffle of the widest stream).
    #   Selective-first folds region→nation into customer (broadcasts,
    #   ASIA prunes ~5×), pre-reduces ORDERS by that relation, and the
    #   lineitem join's output needs no further shuffle — measured
    #   14.8–18.3 s → 8.5–10.9 s at ×100 (~1.7×).
    #
    # The gate is maybe_broadcast's own decision (Catalyst stats vs
    # the hint gate) — data-derived, the same statistic a CBO would
    # use, and exercised at test scale via SPARK_GRAFT_BROADCAST_GATE.
    # Both orders are inner-join-equivalent; BOTH oracle-hash-verified
    # at sf0.001/0.01/0.1 (the selective-first path via a forced-gate
    # run) and value-checked at ×100.
    bc = maybe_broadcast(c)
    if bc is not c:   # customer provably small → broadcast-chain shape
        return (li.join(o, li["l_orderkey"] == o["o_orderkey"])
                .join(bc, o["o_custkey"] == c["c_custkey"])
                .join(maybe_broadcast(s),
                      (li["l_suppkey"] == s["s_suppkey"]) &
                      (s["s_nationkey"] == c["c_nationkey"]))
                .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
                .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
                .groupBy(n["n_name"].alias("nation"))
                .agg(F.round(F.sum(disc_price), 4).cast("double")
                     .alias("revenue")))
    c_asia = (c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
              .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
              .select(c["c_custkey"], c["c_nationkey"],
                      n["n_name"].alias("nation")))
    o_f = o.join(maybe_broadcast(c_asia),
                 o["o_custkey"] == c_asia["c_custkey"])
    return (li.join(o_f, li["l_orderkey"] == o_f["o_orderkey"])
            .join(maybe_broadcast(s),
                  (li["l_suppkey"] == s["s_suppkey"]) &
                  (s["s_nationkey"] == o_f["c_nationkey"]))
            .groupBy("nation")
            .agg(F.round(F.sum(disc_price), 4).cast("double")
                 .alias("revenue")))


@q("tpch_q7_volume_shipping", ("J1", "A1", "F2"), oracle="""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT) AS ship_year,
       CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                * CAST(1 - l.l_discount AS DECIMAL(18,4))), 4) AS DOUBLE)
         AS volume
FROM lineitem l
JOIN orders o    ON o.o_orderkey = l.l_orderkey
JOIN customer c  ON c.c_custkey = o.o_custkey
JOIN supplier s  ON s.s_suppkey = l.l_suppkey
JOIN nation sn   ON sn.n_nationkey = s.s_nationkey
JOIN nation cn   ON cn.n_nationkey = c.c_nationkey
WHERE ((sn.n_name = 'NATION_9' AND cn.n_name = 'NATION_10') OR
       (sn.n_name = 'NATION_10' AND cn.n_name = 'NATION_9'))
  AND l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3
""")
def tpch_q7_volume_shipping(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Q7 silhouette: bilateral trade volume — the same dimension table
    (nation) joined twice under different roles, with a disjunctive
    cross-role predicate.  Both nation copies broadcast (25 rows), and
    the nation-pair filter applies after the broadcasts but before the
    aggregate, so the only shuffle is lineitem⋈orders plus the final
    4-group agg.  Year extraction keeps the group key small (bigint,
    not a date)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") &
        (F.col("l_shipdate") < "1998-01-01"))
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    sn = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    cn = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    disc_price = (F.col("l_extendedprice").cast("decimal(18,4)") *
                  (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)"))
    pair = (((F.col("supp_nation") == "NATION_9") &
             (F.col("cust_nation") == "NATION_10")) |
            ((F.col("supp_nation") == "NATION_10") &
             (F.col("cust_nation") == "NATION_9")))
    return (li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .join(maybe_broadcast(c), o["o_custkey"] == c["c_custkey"])
            .join(maybe_broadcast(s), li["l_suppkey"] == s["s_suppkey"])
            .join(F.broadcast(sn), s["s_nationkey"] == F.col("sn_key"))
            .join(F.broadcast(cn), c["c_nationkey"] == F.col("cn_key"))
            .filter(pair)
            .groupBy("supp_nation", "cust_nation",
                     F.year("l_shipdate").cast("bigint").alias("ship_year"))
            .agg(F.round(F.sum(disc_price), 4).cast("double").alias("volume")))


@q("tpch_q10_returned_items", ("J1", "A1", "W3"), oracle="""
SELECT c.c_custkey AS customer, c.c_name AS name,
       CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                * CAST(1 - l.l_discount AS DECIMAL(18,4))), 4) AS DOUBLE)
         AS revenue,
       c.c_acctbal AS acctbal, n.n_name AS nation
FROM customer c
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON n.n_nationkey = c.c_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1996-04-01'
  AND l.l_returnflag = 'R'
GROUP BY 1, 2, 4, 5
ORDER BY revenue DESC, customer LIMIT 20
""")
def tpch_q10_returned_items(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Q10 silhouette: lost-revenue report over returned items in one
    quarter.  The returnflag filter pushes to the lineitem scan and the
    date range to the orders scan BEFORE their shuffle join — at 100 TB
    the quarter+flag selectivity (~1/24 of rows on each side) is the
    difference between joining terabytes and joining everything.
    customer and nation broadcast; top-20 via TakeOrderedAndProject."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") &
        (F.col("o_orderdate") < "1996-04-01"))
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    disc_price = (F.col("l_extendedprice").cast("decimal(18,4)") *
                  (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)"))
    return (li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .join(maybe_broadcast(c), o["o_custkey"] == c["c_custkey"])
            .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
            .groupBy(c["c_custkey"].alias("customer"),
                     c["c_name"].alias("name"),
                     c["c_acctbal"].alias("acctbal"),
                     n["n_name"].alias("nation"))
            .agg(F.round(F.sum(disc_price), 4).cast("double").alias("revenue"))
            .select("customer", "name", "revenue", "acctbal", "nation")
            .orderBy(F.col("revenue").desc(), "customer").limit(20))


@q("tpch_q14_promo_revenue", ("J1", "A1", "P6"), oracle="""
SELECT CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
               * CAST(1 - l.l_discount AS DECIMAL(18,4)))
            FILTER (WHERE p.p_type = 'PROMO'), 4) AS DOUBLE) AS promo_revenue,
       CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                * CAST(1 - l.l_discount AS DECIMAL(18,4))), 4) AS DOUBLE)
         AS total_revenue,
       ROUND(100.0 * CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                              * CAST(1 - l.l_discount AS DECIMAL(18,4)))
                          FILTER (WHERE p.p_type = 'PROMO'), 4) AS DOUBLE)
             / CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                        * CAST(1 - l.l_discount AS DECIMAL(18,4))), 4) AS DOUBLE),
             6) AS promo_pct
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
  AND l.l_shipdate <  TIMESTAMP '1996-10-01'
""")
def tpch_q14_promo_revenue(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Q14 silhouette: promotion share of one month's revenue — a
    fact⋈dim join feeding a conditional global aggregate.  part
    broadcasts (it's a pure lookup of p_type); the month filter pushes
    to the lineitem scan, and both revenue sums run in exact decimal so
    the final ratio's operands are bit-identical across engines before
    the one double division."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-09-01") &
        (F.col("l_shipdate") < "1996-10-01"))
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc_price = (F.col("l_extendedprice").cast("decimal(18,4)") *
                  (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)"))
    promo = F.round(F.sum(F.when(F.col("p_type") == "PROMO",
                                 disc_price)), 4).cast("double")
    total = F.round(F.sum(disc_price), 4).cast("double")
    return (li.join(maybe_broadcast(p), li["l_partkey"] == p["p_partkey"])
            .agg(promo.alias("promo_revenue"),
                 total.alias("total_revenue"),
                 F.round(F.lit(100.0) * promo / total, 6)
                 .alias("promo_pct")))


@q("tpch_q13_customer_distribution", ("J1", "A1", "A5"), oracle="""
WITH pc AS (
    SELECT c.c_custkey,
           COALESCE(oc.n, 0) AS c_count
    FROM customer c
    LEFT JOIN (SELECT o_custkey, COUNT(*) AS n
               FROM orders GROUP BY 1) oc
      ON oc.o_custkey = c.c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM pc GROUP BY 1
""")
def tpch_q13_customer_distribution(spark: "SparkSession",
                                   sf_dir: str) -> "DataFrame":
    """Q13 silhouette: order-count distribution over ALL customers
    (zero-order customers included).  Aggregate-before-join: orders
    collapses to one row per customer BEFORE the left join, so the join
    moves |customers| + |distinct custkeys| rows instead of every order
    — at 100 TB that pre-aggregation is the difference between joining
    billions of orders and joining millions of counts.  The final
    distribution agg is over a handful of distinct counts."""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    oc = (load(spark, sf_dir, "orders")
          .groupBy(F.col("o_custkey"))
          .agg(F.count(F.lit(1)).alias("n")))
    return (c.join(oc, c["c_custkey"] == oc["o_custkey"], "left")
            .select(F.coalesce(F.col("n"), F.lit(0).cast("bigint"))
                    .alias("c_count"))
            .groupBy("c_count")
            .agg(F.count(F.lit(1)).alias("custdist")))


@q("tpch_q17_small_quantity", ("J4", "A1", "W1"), oracle="""
WITH fl AS (
    SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1'
), w AS (
    SELECT l_extendedprice, l_quantity,
           CAST(SUM(CAST(l_quantity AS DECIMAL(25,4)))
                OVER (PARTITION BY l_partkey) AS DOUBLE)
           / COUNT(*) OVER (PARTITION BY l_partkey) AS avg_qty
    FROM fl
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,4))) AS DOUBLE) / 7.0
         AS avg_yearly,
       COUNT(*) AS n_items
FROM w WHERE l_quantity < 0.2 * avg_qty
""")
def tpch_q17_small_quantity(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Q17 silhouette: the correlated scalar subquery ("below 20% of
    this part's average quantity") decorrelated into a per-partkey
    window over the ALREADY part-filtered fact.  The brand filter
    broadcasts and prunes lineitem to ~1/25 of rows BEFORE the one
    shuffle on partkey; the window then computes each part's average
    in the same pass that filters against it — no second scan, no
    self-join.  The average is decimal-sum ÷ count in double (both
    engines bit-identical), and 0.2·avg can never tie an integral
    quantity exactly (0.2 has no finite binary form)."""
    p = (load(spark, sf_dir, "part")
         .filter(F.col("p_brand") == "Brand#1")
         .select("p_partkey"))
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice")
    w = W.partitionBy("l_partkey")
    avg_qty = (F.sum(F.col("l_quantity").cast("decimal(25,4)")).over(w)
               .cast("double") / F.count(F.lit(1)).over(w))
    return (li.join(maybe_broadcast(p), li["l_partkey"] == p["p_partkey"])
            .withColumn("avg_qty", avg_qty)
            .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
            .agg((F.sum(F.col("l_extendedprice").cast("decimal(25,4)"))
                  .cast("double") / F.lit(7.0)).alias("avg_yearly"),
                 F.count(F.lit(1)).alias("n_items")))


@q("tpch_q22_dormant_accounts", ("J3", "A1", "F7"), oracle=f"""
WITH a AS (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(25,4))) AS DOUBLE)
           / COUNT(*) AS avg_bal
    FROM customer WHERE c_acctbal > 0.0
)
SELECT c.c_nationkey AS nation_key, COUNT(*) AS numcust,
       {osum('c.c_acctbal')} AS totacctbal
FROM customer c, a
WHERE c.c_acctbal > a.avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY 1
""")
def tpch_q22_dormant_accounts(spark: "SparkSession",
                              sf_dir: str) -> "DataFrame":
    """Q22 silhouette: rich-but-dormant accounts — a GLOBAL scalar
    aggregate (average positive balance) applied as a filter via a
    broadcast cross join of its single row, then an anti join against
    recent orders.  (The driver's customer table has no phone column,
    so TPC-H's country-code grouping is adapted to nationkey, and
    "never ordered" to "no order since 2000-01-01" so the anti side is
    non-trivial.)  The recent-orders anti side is date-pruned at its
    scan; at 100 TB both the scalar row and nothing else broadcasts —
    the customer side never shuffles until the final tiny nationkey
    agg."""
    cust = load(spark, sf_dir, "customer")
    avg_row = (cust.filter(F.col("c_acctbal") > 0.0)
               .agg((F.sum(F.col("c_acctbal").cast("decimal(25,4)"))
                     .cast("double") / F.count(F.lit(1))).alias("avg_bal")))
    recent = (load(spark, sf_dir, "orders")
              .filter(F.col("o_orderdate") >= "2000-01-01")
              .select("o_custkey"))
    return (cust.crossJoin(F.broadcast(avg_row))
            .filter(F.col("c_acctbal") > F.col("avg_bal"))
            .join(recent, cust["c_custkey"] == recent["o_custkey"],
                  "left_anti")
            .groupBy(F.col("c_nationkey").alias("nation_key"))
            .agg(F.count(F.lit(1)).alias("numcust"),
                 dsum("c_acctbal").alias("totacctbal")))


@q("tpch_q2_min_cost_supplier", ("J1", "A1", "W1"), oracle="""
WITH offers AS (
    SELECT l.l_partkey AS partkey, l.l_suppkey AS suppkey,
           MIN(l.l_extendedprice / l.l_quantity) AS unit_price
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'EUROPE'
    GROUP BY 1, 2
)
SELECT s.s_acctbal AS acctbal, s.s_name AS supplier, n.n_name AS nation,
       p.p_partkey AS part_id, p.p_name AS part_name,
       o.unit_price AS price
FROM part p
JOIN offers o   ON o.partkey = p.p_partkey
JOIN supplier s ON s.s_suppkey = o.suppkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
WHERE p.p_size <= 15 AND p.p_type = 'LARGE'
  AND o.unit_price = (SELECT MIN(o2.unit_price) FROM offers o2
                      WHERE o2.partkey = p.p_partkey)
ORDER BY acctbal DESC, supplier, part_id LIMIT 100
""")
def tpch_q2_min_cost_supplier(spark: "SparkSession",
                              sf_dir: str) -> "DataFrame":
    """Q2 silhouette: cheapest regional supplier per part — the
    correlated MIN subquery ("this part's minimum price") decorrelated
    into a per-partkey window MIN over the offer list, computed in the
    same pass that filters against it.  (The driver has no partsupp
    table, so the part↔supplier price list is derived from lineitem:
    unit price = l_extendedprice / l_quantity, minimized per
    (part, supplier).)  supplier/nation/region broadcast into the
    lineitem scan; the only wide exchange is the (partkey, suppkey)
    offer aggregation, and the window reuses that same partkey
    partitioning — one shuffle total at any scale.  The oracle keeps
    the genuinely correlated subquery form, so the gate certifies the
    decorrelation, not just the arithmetic."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = (load(spark, sf_dir, "part")
         .filter((F.col("p_size") <= 15) & (F.col("p_type") == "LARGE"))
         .select("p_partkey", "p_name"))
    eu_supp = (s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
               .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
               .select("s_suppkey", "s_name", "s_acctbal",
                       F.col("n_name").alias("nation")))
    offers = (li.join(maybe_broadcast(eu_supp.select("s_suppkey")),
                      li["l_suppkey"] == F.col("s_suppkey"))
              .groupBy(F.col("l_partkey").alias("partkey"),
                       F.col("l_suppkey").alias("suppkey"))
              .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity"))
                   .alias("unit_price")))
    best = F.min("unit_price").over(W.partitionBy("partkey"))
    return (offers.withColumn("_best", best)
            .filter(F.col("unit_price") == F.col("_best"))
            .join(maybe_broadcast(p), F.col("partkey") == p["p_partkey"])
            .join(maybe_broadcast(eu_supp), F.col("suppkey") == F.col("s_suppkey"))
            .select(F.col("s_acctbal").alias("acctbal"),
                    F.col("s_name").alias("supplier"), "nation",
                    F.col("p_partkey").alias("part_id"),
                    F.col("p_name").alias("part_name"),
                    F.col("unit_price").alias("price"))
            .orderBy(F.col("acctbal").desc(), "supplier", "part_id")
            .limit(100))


@q("tpch_q8_market_share", ("J1", "A1", "P6"), oracle="""
SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS order_year,
       CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                * CAST(1 - l.l_discount AS DECIMAL(18,4)))
            FILTER (WHERE sn.n_name = 'NATION_5'), 4) AS DOUBLE)
         AS nation_volume,
       CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                * CAST(1 - l.l_discount AS DECIMAL(18,4))), 4) AS DOUBLE)
         AS total_volume,
       ROUND(COALESCE(CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                       * CAST(1 - l.l_discount AS DECIMAL(18,4)))
                   FILTER (WHERE sn.n_name = 'NATION_5'), 4) AS DOUBLE), 0.0)
             / CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                        * CAST(1 - l.l_discount AS DECIMAL(18,4))), 4) AS DOUBLE), 6) AS mkt_share
FROM lineitem l
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
JOIN region r   ON r.r_regionkey = cn.n_regionkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
JOIN part p     ON p.p_partkey = l.l_partkey
WHERE r.r_name = 'AMERICA' AND p.p_type = 'PROMO'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY 1
""")
def tpch_q8_market_share(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Q8 silhouette: one nation's share of regional promo-part volume
    per year — a 7-table join (nation twice, under customer and
    supplier roles) feeding a conditional-share aggregate.  Every
    dimension broadcasts (part's PROMO filter prunes it to ~1/6 before
    the broadcast); lineitem⋈orders is the single shuffle, with the
    two-year date window pushed to the orders scan.  Numerator and
    denominator both run in exact decimal; the share divides the two
    resulting doubles identically in both engines."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") &
        (F.col("o_orderdate") < "1998-01-01"))
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    cn = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"),
        F.col("n_regionkey").alias("cn_region"))
    sn = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_name").alias("supp_nation"))
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    p = (load(spark, sf_dir, "part")
         .filter(F.col("p_type") == "PROMO").select("p_partkey"))
    disc_price = (F.col("l_extendedprice").cast("decimal(18,4)") *
                  (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)"))
    nation_vol = F.round(F.sum(F.when(F.col("supp_nation") == "NATION_5",
                                      disc_price)), 4).cast("double")
    total_vol = F.round(F.sum(disc_price), 4).cast("double")
    return (li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .join(maybe_broadcast(c), o["o_custkey"] == c["c_custkey"])
            .join(F.broadcast(cn), c["c_nationkey"] == F.col("cn_key"))
            .join(F.broadcast(r), F.col("cn_region") == r["r_regionkey"])
            .join(maybe_broadcast(s), li["l_suppkey"] == s["s_suppkey"])
            .join(F.broadcast(sn), s["s_nationkey"] == F.col("sn_key"))
            .join(maybe_broadcast(p), li["l_partkey"] == p["p_partkey"])
            .groupBy(F.year("o_orderdate").cast("bigint")
                     .alias("order_year"))
            .agg(nation_vol.alias("nation_volume"),
                 total_vol.alias("total_volume"),
                 F.round(F.coalesce(nation_vol, F.lit(0.0)) / total_vol, 6)
                 .alias("mkt_share")))


@q("tpch_q9_product_profit", ("J1", "A1", "F3"), oracle="""
SELECT n.n_name AS nation,
       CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT) AS profit_year,
       CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                * CAST(1 - l.l_discount AS DECIMAL(18,4))), 4) AS DOUBLE)
         AS gross_revenue,
       ROUND(CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                      * CAST(1 - l.l_discount AS DECIMAL(18,4))), 4) AS DOUBLE)
             - 0.1 * CAST(ROUND(SUM(CAST(p.p_retailprice AS DECIMAL(18,4))
                              * CAST(l.l_quantity AS DECIMAL(18,4))), 4) AS DOUBLE), 6) AS profit
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
JOIN part p     ON p.p_partkey = l.l_partkey
WHERE p.p_name LIKE '%gear%'
GROUP BY 1, 2
""")
def tpch_q9_product_profit(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Q9 silhouette: profit on a product line by supplier nation and
    year.  (No partsupp table in the driver data, so supply cost is
    modeled as 10% of p_retailprice per unit — the shape, a revenue-
    minus-cost expression over a part-name LIKE filter, is what
    matters.)  The LIKE filter prunes part before its broadcast; both
    money sums run in exact decimal and the 0.1 cost factor is applied
    once to the group total (not per row), so the double arithmetic is
    two operations on identical operands in both engines."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    p = (load(spark, sf_dir, "part")
         .filter(F.col("p_name").like("%gear%"))
         .select("p_partkey", "p_retailprice"))
    disc_price = (F.col("l_extendedprice").cast("decimal(18,4)") *
                  (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)"))
    cost = (F.col("p_retailprice").cast("decimal(18,4)") *
            F.col("l_quantity").cast("decimal(18,4)"))
    gross = F.round(F.sum(disc_price), 4).cast("double")
    return (li.join(maybe_broadcast(p), li["l_partkey"] == p["p_partkey"])
            .join(maybe_broadcast(s), li["l_suppkey"] == s["s_suppkey"])
            .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
            .groupBy(F.col("n_name").alias("nation"),
                     F.year("l_shipdate").cast("bigint")
                     .alias("profit_year"))
            .agg(gross.alias("gross_revenue"),
                 F.round(gross - F.lit(0.1) * F.sum(cost).cast("double"), 6)
                 .alias("profit")))


@q("tpch_q11_important_parts", ("A4", "P6", "J3"), oracle="""
WITH nat_lines AS (
    SELECT l.l_partkey,
           CAST(l.l_extendedprice AS DECIMAL(18,4))
           * CAST(1 - l.l_discount AS DECIMAL(18,4)) AS val
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_7'
)
SELECT l_partkey AS part_id,
       CAST(SUM(val) AS DOUBLE) AS part_value
FROM nat_lines
GROUP BY 1
HAVING CAST(SUM(val) AS DOUBLE) >
       0.001 * (SELECT CAST(SUM(val) AS DOUBLE) FROM nat_lines)
""")
def tpch_q11_important_parts(spark: "SparkSession",
                             sf_dir: str) -> "DataFrame":
    """Q11 silhouette: parts representing a significant fraction of one
    nation's traded value — a grouped HAVING compared against a GLOBAL
    scalar aggregate of the same derived relation.  (partsupp value is
    modeled as discounted lineitem value of that nation's suppliers.)
    The nation filter broadcasts into the fact scan; the per-part
    decimal sums aggregate once on partkey, the global total is the
    exact decimal sum of the SAME rows (associative, so re-aggregating
    the partials is bit-identical), and the single total row broadcasts
    back as the threshold — the fact never shuffles twice."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    nat_supp = (s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
                .select("s_suppkey"))
    val = (F.col("l_extendedprice").cast("decimal(18,4)") *
           (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)"))
    per_part = (li.join(maybe_broadcast(nat_supp),
                        li["l_suppkey"] == F.col("s_suppkey"))
                .groupBy(F.col("l_partkey").alias("part_id"))
                .agg(F.sum(val).alias("_val_dec")))
    total = per_part.agg(F.sum("_val_dec").cast("double").alias("_total"))
    return (per_part.crossJoin(F.broadcast(total))
            .filter(F.col("_val_dec").cast("double") >
                    F.lit(0.001) * F.col("_total"))
            .select("part_id",
                    F.col("_val_dec").cast("double").alias("part_value")))


@q("tpch_q12_late_shipment_priority", ("J4", "A1", "P6"), oracle="""
SELECT l.l_linestatus AS status,
       COUNT(*) FILTER (WHERE o.o_orderpriority IN ('1-URGENT', '2-HIGH'))
         AS high_line_count,
       COUNT(*) FILTER (WHERE o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
         AS low_line_count
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  AND l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY 1
""")
def tpch_q12_late_shipment_priority(spark: "SparkSession",
                                    sf_dir: str) -> "DataFrame":
    """Q12 silhouette: order-priority mix among late shipments — an
    equi join carrying an extra cross-table theta predicate (shipped
    more than 90 days after ordering), feeding conditional counts.
    (The driver lineitem has no shipmode/commitdate/receiptdate, so
    the group key is l_linestatus and lateness is shipdate vs
    orderdate.)  The year filter pushes to the lineitem scan before
    the one orderkey shuffle; the theta predicate evaluates inside the
    join, never as a post-join blowup; the final agg is two rows."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") &
        (F.col("l_shipdate") < "1998-01-01"))
    o = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (li.join(o, (li["l_orderkey"] == o["o_orderkey"]) &
                    (li["l_shipdate"] > o["o_orderdate"] +
                     F.expr("INTERVAL 90 DAYS")))
            .groupBy(F.col("l_linestatus").alias("status"))
            .agg(F.count(F.when(high, 1)).alias("high_line_count"),
                 F.count(F.when(~high, 1)).alias("low_line_count")))


@q("tpch_q15_top_supplier", ("A4", "J3", "F7"), oracle="""
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                    * CAST(1 - l_discount AS DECIMAL(18,4))), 4) AS DOUBLE)
             AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1996-04-01'
    GROUP BY 1
)
SELECT s.s_suppkey AS supplier, s.s_name AS name,
       r.total_revenue AS total_revenue
FROM supplier s
JOIN revenue r ON r.supplier_no = s.s_suppkey
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""")
def tpch_q15_top_supplier(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Q15 silhouette: the supplier(s) with maximum quarterly revenue —
    a derived revenue view compared against its own scalar MAX.  The
    view aggregates once (date filter pushed to the scan, ~1/26 of
    rows); the MAX re-aggregates the view's 100 rows and broadcasts a
    single scalar back as the filter, so the fact is scanned exactly
    once.  Revenue is an exact decimal sum surfaced as double, making
    the equality comparison bit-safe across engines.  The oracle keeps
    the scalar-subquery form; the builder decorrelates it into a
    broadcast cross join."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") &
        (F.col("l_shipdate") < "1996-04-01"))
    disc_price = (F.col("l_extendedprice").cast("decimal(18,4)") *
                  (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)"))
    revenue = (li.groupBy(F.col("l_suppkey").alias("supplier_no"))
               .agg(F.round(F.sum(disc_price), 4).cast("double")
                    .alias("total_revenue")))
    best = revenue.agg(F.max("total_revenue").alias("_best"))
    s = load(spark, sf_dir, "supplier")
    return (revenue.crossJoin(F.broadcast(best))
            .filter(F.col("total_revenue") == F.col("_best"))
            .join(maybe_broadcast(s), F.col("supplier_no") == s["s_suppkey"])
            .select(F.col("s_suppkey").alias("supplier"),
                    F.col("s_name").alias("name"), "total_revenue"))


@q("tpch_q16_supplier_diversity", ("J3", "A8", "P8"), oracle="""
SELECT p.p_brand AS brand, p.p_type AS type, p.p_size AS size,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                          WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
""")
def tpch_q16_supplier_diversity(spark: "SparkSession",
                                sf_dir: str) -> "DataFrame":
    """Q16 silhouette: how many distinct suppliers can provide each
    (brand, type, size) combination, excluding a blocklisted supplier
    set — NOT IN over a non-null subquery compiled to an anti join,
    plus an exact COUNT(DISTINCT) per group.  (The driver supplier has
    no comment column, so 'complaints' is modeled as negative account
    balance.)  The blocklist anti side is ~100 rows → broadcast anti
    join, zero shuffle; part's triple filter prunes before broadcast;
    the only exchange is the distinct-count agg, which Spark executes
    as a two-phase expand+agg.  At 100 TB, swap the exact distinct for
    approx_count_distinct (A8) if 2% error is acceptable — noted, not
    done, because the oracle checks exact."""
    bad = (load(spark, sf_dir, "supplier")
           .filter(F.col("s_acctbal") < 0).select("s_suppkey"))
    p = (load(spark, sf_dir, "part")
         .filter((F.col("p_brand") != "Brand#1") &
                 (F.col("p_type") != "PROMO") &
                 F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
         .select("p_partkey", "p_brand", "p_type", "p_size"))
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (li.join(maybe_broadcast(bad), li["l_suppkey"] == bad["s_suppkey"],
                    "left_anti")
            .join(maybe_broadcast(p), li["l_partkey"] == p["p_partkey"])
            .groupBy(F.col("p_brand").alias("brand"),
                     F.col("p_type").alias("type"),
                     F.col("p_size").alias("size"))
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt")))


@q("tpch_q19_disjunctive_revenue", ("J4", "P5", "A4"), oracle="""
SELECT CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
               * CAST(1 - l.l_discount AS DECIMAL(18,4))), 4) AS DOUBLE)
         AS revenue,
       COUNT(*) AS n_items
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 20)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
       AND l.l_quantity BETWEEN 10 AND 30)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
       AND l.l_quantity BETWEEN 20 AND 40)
""")
def tpch_q19_disjunctive_revenue(spark: "SparkSession",
                                 sf_dir: str) -> "DataFrame":
    """Q19 silhouette: revenue under a disjunction of three conjunctive
    (brand, size-range, quantity-range) clauses spanning both join
    sides.  The implied single-side predicates are factored out and
    applied BEFORE the join — part to brand∈{1,2,3} (broadcast shrinks
    25×), lineitem to quantity∈[1,40] (pushed to the parquet scan) —
    so the OR only evaluates on rows that already passed the envelope;
    Catalyst cannot always derive these from an OR, so the builder
    states them explicitly.  This is the canonical 'disjunctive
    pushdown' shape: at 100 TB the factored envelope is the difference
    between broadcasting 3/25 of part and all of it."""
    p = (load(spark, sf_dir, "part")
         .filter(F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
         .select("p_partkey", "p_brand", "p_size"))
    li = (load(spark, sf_dir, "lineitem")
          .filter(F.col("l_quantity").between(1, 40))
          .select("l_partkey", "l_quantity", "l_extendedprice",
                  "l_discount"))
    clause = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) &
         F.col("l_quantity").between(1, 20)) |
        ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30) &
         F.col("l_quantity").between(10, 30)) |
        ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50) &
         F.col("l_quantity").between(20, 40)))
    disc_price = (F.col("l_extendedprice").cast("decimal(18,4)") *
                  (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)"))
    return (li.join(maybe_broadcast(p),
                    (li["l_partkey"] == p["p_partkey"]) & clause)
            .agg(F.round(F.sum(disc_price), 4).cast("double").alias("revenue"),
                 F.count(F.lit(1)).alias("n_items")))


@q("tpch_q20_heavy_shippers", ("J3", "A4", "P6"), oracle="""
SELECT s.s_name AS name, s.s_suppkey AS supplier
FROM supplier s
WHERE s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l
        WHERE l.l_partkey IN (SELECT p_partkey FROM part
                              WHERE p_name LIKE 'small%')
          AND l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY l.l_suppkey, l.l_partkey
        HAVING SUM(l.l_quantity) > 25)
  AND s.s_nationkey IN (SELECT n_nationkey FROM nation
                        WHERE n_regionkey = (SELECT r_regionkey FROM region
                                             WHERE r_name = 'ASIA'))
ORDER BY name
""")
def tpch_q20_heavy_shippers(spark: "SparkSession",
                            sf_dir: str) -> "DataFrame":
    """Q20 silhouette: regional suppliers who moved serious volume of a
    product family in one year — TPC-H's deepest subquery nest (IN →
    grouped HAVING → IN → scalar), decorrelated into a chain of
    broadcast semi joins.  (No partsupp: 'availqty excess' is modeled
    as shipped quantity per (supplier, part) over a threshold.)  The
    'small%' part list broadcasts into the year-pruned lineitem scan;
    the (suppkey, partkey) agg is the only shuffle; its surviving
    supplier keys collapse to ≤100 distinct values that broadcast-semi
    into supplier, as does the nation-in-region list.  Quantity sums
    are integral doubles — exact in both engines, so the >25 threshold
    can't straddle an ulp."""
    pp = (load(spark, sf_dir, "part")
          .filter(F.col("p_name").like("small%")).select("p_partkey"))
    li = (load(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate") >= "1996-01-01") &
                  (F.col("l_shipdate") < "1997-01-01"))
          .select("l_suppkey", "l_partkey", "l_quantity"))
    heavy = (li.join(maybe_broadcast(pp), li["l_partkey"] == pp["p_partkey"])
             .groupBy("l_suppkey", "l_partkey")
             .agg(F.sum("l_quantity").alias("_qty"))
             .filter(F.col("_qty") > 25)
             .select("l_suppkey").distinct())
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = (load(spark, sf_dir, "nation")
         .join(F.broadcast(r), F.col("n_regionkey") == r["r_regionkey"])
         .select("n_nationkey"))
    s = load(spark, sf_dir, "supplier")
    return (s.join(maybe_broadcast(heavy),
                   s["s_suppkey"] == heavy["l_suppkey"], "left_semi")
            .join(F.broadcast(n),
                  s["s_nationkey"] == n["n_nationkey"], "left_semi")
            .select(F.col("s_name").alias("name"),
                    F.col("s_suppkey").alias("supplier"))
            .orderBy("name"))


@q("tpch_q21_waiting_orders", ("J3", "A1", "W3"), oracle="""
SELECT s.s_name AS name, COUNT(*) AS numwait
FROM lineitem l1
JOIN orders o   ON o.o_orderkey = l1.l_orderkey
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
GROUP BY 1
ORDER BY numwait DESC, name LIMIT 25
""")
def tpch_q21_waiting_orders(spark: "SparkSession",
                            sf_dir: str) -> "DataFrame":
    """Q21 silhouette: suppliers who were the SOLE late shipper on
    finished multi-supplier orders — TPC-H's EXISTS + NOT-EXISTS pair
    over the same fact.  (Lateness adapted to shipdate > orderdate +
    60 days; no commit/receipt dates in the driver data.)  Instead of
    two correlated self-join passes, the builder computes per-order
    supplier stats ONCE — distinct suppliers and distinct LATE
    suppliers via conditional count-distinct in a single orderkey
    aggregation — and rejoins them to the late lines: EXISTS becomes
    n_supp > 1, NOT EXISTS becomes n_late_supp = 1 (the late line's
    own supplier is then necessarily the only one).  Three scans and
    two correlated probes collapse to one shuffle reused twice
    (AQE-local rejoin on the same orderkey partitioning).  The oracle
    keeps the correlated EXISTS form, so the gate certifies this
    rewrite."""
    o = (load(spark, sf_dir, "orders")
         .filter(F.col("o_orderstatus") == "F")
         .select("o_orderkey", "o_orderdate"))
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate")
    flagged = (li.join(o, li["l_orderkey"] == o["o_orderkey"])
               .withColumn("_late",
                           F.col("l_shipdate") > F.col("o_orderdate") +
                           F.expr("INTERVAL 60 DAYS")))
    stats = (flagged.groupBy("l_orderkey")
             .agg(F.countDistinct("l_suppkey").alias("_n_supp"),
                  F.countDistinct(F.when(F.col("_late"),
                                         F.col("l_suppkey")))
                  .alias("_n_late_supp")))
    late = flagged.filter(F.col("_late")).select(
        F.col("l_orderkey").alias("late_orderkey"), "l_suppkey")
    s = load(spark, sf_dir, "supplier")
    return (late.join(stats,
                      late["late_orderkey"] == stats["l_orderkey"])
            .filter((F.col("_n_supp") > 1) & (F.col("_n_late_supp") == 1))
            .join(maybe_broadcast(s), late["l_suppkey"] == s["s_suppkey"])
            .groupBy(F.col("s_name").alias("name"))
            .agg(F.count(F.lit(1)).alias("numwait"))
            .orderBy(F.col("numwait").desc(), "name").limit(25))
