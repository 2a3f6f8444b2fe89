"""Graph analytics over derived relational graphs: PageRank on the
nation-level trade network.

Complements ``operators/components.py`` (iterative connected
components) with the other canonical iterative-dataflow shape: a
fixed-point rank iteration expressed as repeated join+aggregate rounds
over a (nodes, edges) pair — the Pregel pattern in plain DataFrames.

Determinism: ranks live in integer micro-units and every division is
integer floor division, so each iteration is bit-reproducible across
engines, partitionings and retries — the float formulation would drift
in final ulps per iteration and compound.  The DuckDB oracle unrolls
the same three iterations as chained CTEs.

Scale stance: the EDGE DERIVATION is the 100 TB part (fact-scale joins
+ group-by, shuffling on the join keys with broadcast dims); the
iteration itself runs on the aggregated graph, which for entity-level
graphs is orders of magnitude smaller.  For graphs where nodes
themselves are huge (user-user), each iteration is one shuffle join on
src plus one aggregate on dst — the standard distributed PageRank; at
that scale checkpoint every few iterations to cut lineage, and
pre-partition edges by src so iterations reuse the exchange.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .operators.hints import maybe_broadcast
from .queries import load, q

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession

#: total rank mass in micro-units, damping 0.85, N=25 nations
_TOTAL = 1_000_000
_N = 25
_BASE = (15 * _TOTAL) // (100 * _N)          # (1-d)·total/N = 6000

_EDGES_SQL = """
  SELECT s.s_nationkey AS src, c.c_nationkey AS dst, COUNT(*) AS w
  FROM lineitem l
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY 1, 2
"""

_STEP_SQL = """
, {cur} AS (
  SELECT n.v,
         {base} + (85 * COALESCE(SUM((p.r * e.w) // o.W), 0)) // 100 AS r
  FROM nodes n
  LEFT JOIN edges e ON e.dst = n.v
  LEFT JOIN outw o  ON o.src = e.src
  LEFT JOIN {prev} p ON p.v = e.src
  GROUP BY n.v
)"""


def _pagerank_oracle(iters: int = 3) -> str:
    steps = "".join(
        _STEP_SQL.format(cur=f"i{k}", prev=f"i{k - 1}" if k > 1 else "r0",
                         base=_BASE)
        for k in range(1, iters + 1))
    return f"""
WITH edges AS ({_EDGES_SQL}),
outw AS (SELECT src, SUM(w) AS W FROM edges GROUP BY 1),
nodes AS (SELECT n_nationkey AS v FROM nation),
r0 AS (SELECT v, CAST({_TOTAL // _N} AS BIGINT) AS r FROM nodes)
{steps}
SELECT n.n_name AS nation, CAST(i{iters}.r AS BIGINT) AS pagerank_micro
FROM i{iters} JOIN nation n ON n.n_nationkey = i{iters}.v
"""


@q("pagerank_trade_graph", ("J1", "A1", "W1"), oracle=_pagerank_oracle())
def pagerank_trade_graph(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Three unrolled PageRank iterations (d=0.85) over the
    supplier-nation → customer-nation trade graph, edge-weighted by
    lineitem count.  Edge derivation is the fact-scale work (one
    shuffle; dims broadcast); each iteration is contribution-join →
    dst-aggregate → node left-join, all on the 25-node aggregated
    graph.  Integer micro-unit ranks with floor division make every
    iteration bit-reproducible (see module docstring)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")

    edges = (li.join(o, li["l_orderkey"] == o["o_orderkey"])
             .join(maybe_broadcast(c), o["o_custkey"] == c["c_custkey"])
             .join(maybe_broadcast(s), li["l_suppkey"] == s["s_suppkey"])
             .groupBy(s["s_nationkey"].alias("src"),
                      c["c_nationkey"].alias("dst"))
             .agg(F.count(F.lit(1)).alias("w")))
    outw = edges.groupBy("src").agg(F.sum("w").alias("wout"))
    nodes = n.select(F.col("n_nationkey").alias("v"))
    ranks = nodes.select("v", F.lit(_TOTAL // _N).cast("bigint").alias("r"))

    for _ in range(3):
        contrib = (edges.join(outw, "src")
                   .join(ranks.withColumnRenamed("v", "src"), "src")
                   .select(F.col("dst").alias("v"),
                           F.expr("(r * w) div wout").alias("c")))
        summed = contrib.groupBy("v").agg(F.sum("c").alias("S"))
        ranks = (nodes.join(summed, "v", "left")
                 .select("v",
                         (F.lit(_BASE) +
                          F.expr("(85 * coalesce(S, 0)) div 100"))
                         .cast("bigint").alias("r")))

    return (ranks.join(F.broadcast(n),
                       ranks["v"] == n["n_nationkey"])
            .select(F.col("n_name").alias("nation"),
                    F.col("r").alias("pagerank_micro")))


# =========================================================================
# Triangle counting — the second canonical multi-join graph shape
# =========================================================================

_UEDGES_SQL = f"""
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
  FROM ({_EDGES_SQL})
  WHERE src <> dst
"""


@q("triangle_count", ("J1", "A1", "A2"), oracle=f"""
WITH ue AS ({_UEDGES_SQL}),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM ue e1
  JOIN ue e2 ON e2.u = e1.v
  JOIN ue e3 ON e3.u = e1.u AND e3.v = e2.v
), pernode AS (
  SELECT x AS vtx, COUNT(*) AS n_tri FROM (
    SELECT a AS x FROM tri
    UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri
  ) GROUP BY 1
)
SELECT n.n_name AS nation,
       CAST(COALESCE(p.n_tri, 0) AS BIGINT) AS n_triangles
FROM nation n LEFT JOIN pernode p ON p.vtx = n.n_nationkey
""")
def triangle_count(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Per-nation triangle counts in the undirected trade graph.

    Node-iterator formulation: orient every edge low→high id
    (``u < v``), so each triangle ``a<b<c`` is enumerated exactly once
    by the two-hop join e1(a,b)⋈e2(b,c)⋈e3(a,c) — no 6× duplicate
    blow-up, no post-hoc dedup.  Edge derivation is the fact-scale
    stage (same shuffle profile as pagerank_trade_graph); the triangle
    joins run on the aggregated edge list.  At web scale the standard
    refinement is degree ordering (orient from low- to high-degree
    node) so the join fan-out per vertex is bounded by its oriented
    out-degree — same plan shape, better skew profile.
    """
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")

    edges = (li.join(o, li["l_orderkey"] == o["o_orderkey"])
             .join(maybe_broadcast(c), o["o_custkey"] == c["c_custkey"])
             .join(maybe_broadcast(s), li["l_suppkey"] == s["s_suppkey"])
             .select(F.least(s["s_nationkey"], c["c_nationkey"]).alias("u"),
                     F.greatest(s["s_nationkey"],
                                c["c_nationkey"]).alias("v"))
             .filter(F.col("u") != F.col("v"))
             .distinct())

    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tri = (e1.join(e2, F.col("e2.u") == F.col("e1.v"))
           .join(e3, (F.col("e3.u") == F.col("e1.u")) &
                     (F.col("e3.v") == F.col("e2.v")))
           .select(F.col("e1.u").alias("a"), F.col("e1.v").alias("b"),
                   F.col("e2.v").alias("c")))
    pernode = (tri.select(F.col("a").alias("vtx"))
               .unionAll(tri.select(F.col("b").alias("vtx")))
               .unionAll(tri.select(F.col("c").alias("vtx")))
               .groupBy("vtx").agg(F.count(F.lit(1)).alias("n_tri")))
    return (n.join(pernode, n["n_nationkey"] == pernode["vtx"], "left")
            .select(F.col("n_name").alias("nation"),
                    F.coalesce("n_tri", F.lit(0)).cast("bigint")
                    .alias("n_triangles")))


# =========================================================================
# BFS reachability — frontier expansion with visited-set anti-join
# =========================================================================

_BFS_SRC = 0     # start nation
_BFS_HOPS = 3
_BFS_TOPK = 3    # keep each nation's top-3 trade partners (sparsifier)

_TOP_EDGES_SQL = f"""
  SELECT src, dst FROM (
    SELECT src, dst,
           ROW_NUMBER() OVER (PARTITION BY src
                              ORDER BY w DESC, dst) AS rn
    FROM ({_EDGES_SQL})
    WHERE src <> dst
  ) WHERE rn <= {_BFS_TOPK}
"""


def _bfs_oracle() -> str:
    levels = ["v0 AS (SELECT CAST(0 AS BIGINT) AS v, 0 AS hop)"]
    prev_all = "v0"
    for h in range(1, _BFS_HOPS + 1):
        levels.append(f"""
n{h} AS (
  SELECT DISTINCT e.dst AS v, {h} AS hop
  FROM (SELECT v FROM {prev_all} WHERE hop = {h - 1}) f
  JOIN e ON e.src = f.v
  WHERE e.dst NOT IN (SELECT v FROM {prev_all})
), a{h} AS (SELECT * FROM {prev_all} UNION ALL SELECT * FROM n{h})""")
        prev_all = f"a{h}"
    body = ",".join(levels)
    return f"""
WITH e AS ({_TOP_EDGES_SQL}),
{body}
SELECT n.n_name AS nation, r.hop
FROM {prev_all} r JOIN nation n ON n.n_nationkey = r.v
"""


@q("bfs_reachability", ("J1", "J3", "W3"), oracle=_bfs_oracle())
def bfs_reachability(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Shortest-hop reachability (≤3 hops) from nation 0 over each
    nation's top-3 trade-partner edges — the canonical distributed BFS:
    per round, frontier ⋈ edges expands, an ANTI-JOIN against the
    visited set keeps only newly-reached nodes, and the new frontier is
    exactly the hop-h level set (which makes min-hop correctness free —
    a node can only be reached first at its BFS depth).

    The top-k sparsifier doubles as the W3 shape (WindowGroupLimit) and
    keeps the oracle scale-invariant.  Scale: frontier and visited are
    node-sized; each round is one shuffle join on src plus one
    broadcastable anti-join — at billion-edge scale pre-partition edges
    by src once so every round reuses the exchange, and checkpoint the
    visited set every few rounds to cut lineage (same discipline as
    pagerank_trade_graph)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")

    wedges = (li.join(o, li["l_orderkey"] == o["o_orderkey"])
         .join(maybe_broadcast(c), o["o_custkey"] == c["c_custkey"])
         .join(maybe_broadcast(s), li["l_suppkey"] == s["s_suppkey"])
         .groupBy(s["s_nationkey"].alias("src"),
                  c["c_nationkey"].alias("dst"))
         .agg(F.count(F.lit(1)).alias("w"))
         .filter(F.col("src") != F.col("dst")))
    rn = F.row_number().over(
        W.partitionBy("src").orderBy(F.col("w").desc(), "dst"))
    edges = (wedges.withColumn("rn", rn).filter(F.col("rn") <= _BFS_TOPK)
             .select("src", "dst"))

    visited = spark.createDataFrame([(_BFS_SRC, 0)], "v bigint, hop int")
    frontier = visited.select("v")
    for h in range(1, _BFS_HOPS + 1):
        reached = (frontier.join(edges, frontier["v"] == edges["src"])
                   .select(F.col("dst").alias("v")).distinct())
        new = (reached.join(visited.select("v"), "v", "left_anti")
               .withColumn("hop", F.lit(h)))
        visited = visited.unionByName(new)
        frontier = new.select("v")

    return (visited.join(F.broadcast(n),
                         visited["v"] == n["n_nationkey"])
            .select(F.col("n_name").alias("nation"), "hop"))


# =========================================================================
# Random-walk corpus ([EXT] — DeepWalk/node2vec dataset generation)
# =========================================================================

_WALK = dict(steps=4, per_node=2)


def _walk_oracle() -> str:
    steps = []
    prev = "w0"
    for h in range(1, _WALK["steps"] + 1):
        steps.append(f"""
w{h} AS (
  SELECT p.walk_id,
         COALESCE(nb.dst, p.cur) AS cur,
         CASE WHEN nb.dst IS NOT NULL
              THEN p.path || '>' || CAST(nb.dst AS VARCHAR)
              ELSE p.path END AS path
  FROM {prev} p
  LEFT JOIN deg d ON d.src = p.cur
  LEFT JOIN nbr nb ON nb.src = p.cur AND nb.pick =
      (('0x' || substr(md5('rw:' || CAST(p.walk_id AS VARCHAR)
                           || ':' || {h}), 1, 15))::BIGINT % d.deg)
)""")
        prev = f"w{h}"
    body = ",".join(steps)
    return f"""
WITH e AS ({_TOP_EDGES_SQL}),
nbr AS (
  SELECT src, dst,
         ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) - 1 AS pick
  FROM e
),
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM nbr GROUP BY src),
w0 AS (
  SELECT n_nationkey * 10 + i AS walk_id, n_nationkey AS cur,
         CAST(n_nationkey AS VARCHAR) AS path
  FROM nation CROSS JOIN (SELECT UNNEST(range({_WALK['per_node']})) AS i)
),
{body}
SELECT walk_id, path FROM {prev}
"""


@q("random_walk_corpus", ("J1", "W1", "F9"), oracle=_walk_oracle())
def random_walk_corpus(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """DeepWalk-style training corpus: {per_node} deterministic random
    walks of {steps} steps from every node of the sparsified trade
    graph, each emitted as a '>'-joined node sequence — the dataset
    that feeds skip-gram graph-embedding training (walks are to graphs
    what sentences are to word2vec).

    Scale design: a walk step is ONE equi-join — current position ⋈
    indexed neighbor table on (node, picked-rank) — so a round costs
    walks-size × join, never edge-size; the neighbor index (per-node
    0..deg-1 ranks + degree) is built once and reused every round,
    the same reuse discipline as the PageRank/BFS loops.  The "coin"
    is md5(walk, step) — not rand() — so the corpus is reproducible
    across engines/retries (the hash_sample doctrine extended to
    sequential decisions), and the oracle unrolls the walk as chained
    CTEs replaying the identical coins.  Dead-end nodes absorb the
    walk (path stops growing) on both engines.
    """
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")

    wedges = (li.join(o, li["l_orderkey"] == o["o_orderkey"])
              .join(maybe_broadcast(c), o["o_custkey"] == c["c_custkey"])
              .join(maybe_broadcast(s), li["l_suppkey"] == s["s_suppkey"])
              .groupBy(s["s_nationkey"].alias("src"),
                       c["c_nationkey"].alias("dst"))
              .agg(F.count(F.lit(1)).alias("w"))
              .filter(F.col("src") != F.col("dst")))
    rn = F.row_number().over(
        W.partitionBy("src").orderBy(F.col("w").desc(), "dst"))
    edges = (wedges.withColumn("rn", rn).filter(F.col("rn") <= _BFS_TOPK)
             .select("src", "dst"))
    nbr = edges.select(
        F.col("src").alias("nsrc"), F.col("dst").alias("ndst"),
        (F.row_number().over(W.partitionBy("src").orderBy("dst")) - 1)
        .alias("npick")).cache()
    deg = nbr.groupBy(F.col("nsrc").alias("dsrc")).agg(
        F.count("*").cast("long").alias("deg"))

    starts = (n.select("n_nationkey")
              .crossJoin(F.broadcast(
                  spark.range(_WALK["per_node"]).select(
                      F.col("id").alias("i"))))
              .select((F.col("n_nationkey") * 10 + F.col("i"))
                      .alias("walk_id"),
                      F.col("n_nationkey").alias("cur"),
                      F.col("n_nationkey").cast("string").alias("path")))
    state = starts
    for h in range(1, _WALK["steps"] + 1):
        coin = F.conv(F.substring(F.md5(F.concat(
            F.lit("rw:"), F.col("walk_id").cast("string"),
            F.lit(f":{h}"))), 1, 15), 16, 10).cast("long")
        state = (state.join(F.broadcast(deg),
                            state["cur"] == deg["dsrc"], "left")
                 .withColumn("pick_h", coin % F.col("deg"))
                 .drop("dsrc"))
        state = (state.join(F.broadcast(nbr),
                            (F.col("cur") == F.col("nsrc")) &
                            (F.col("pick_h") == F.col("npick")), "left")
                 .select("walk_id",
                         F.coalesce(F.col("ndst"), F.col("cur"))
                         .alias("cur"),
                         F.when(F.col("ndst").isNotNull(),
                                F.concat(F.col("path"), F.lit(">"),
                                         F.col("ndst").cast("string")))
                         .otherwise(F.col("path")).alias("path")))
    return state.select("walk_id", "path")


# =========================================================================
# Skip-gram pairs from walks ([EXT] — the word2vec co-occurrence stat)
# =========================================================================

_SG = dict(window=2)


@q("skipgram_pairs", ("W1", "A1", "F9"), oracle=f"""
WITH walks AS ({_walk_oracle()}),
toks AS (
  SELECT walk_id, string_split(path, '>') AS l FROM walks
), pos AS (
  SELECT walk_id, UNNEST(range(len(l))) AS i, l FROM toks
), nodes AS (
  SELECT walk_id, i, CAST(l[i + 1] AS BIGINT) AS node FROM pos
)
SELECT a.node AS center, b.node AS context,
       COUNT(*) AS n_cooccur
FROM nodes a JOIN nodes b
  ON a.walk_id = b.walk_id AND a.i <> b.i
 AND ABS(a.i - b.i) <= {_SG['window']}
GROUP BY 1, 2
""")
def skipgram_pairs(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Skip-gram (center, context) co-occurrence counts with window
    ±{window} over the random-walk corpus — the sufficient statistic
    word2vec/DeepWalk training consumes (and exactly the relation a
    shifted-PPMI factorization embeds; pmi_cooccurrence is its text
    twin).

    Scale design: composes random_walk_corpus's generation with a
    position self-join keyed on walk_id — walks are CONSTANT length,
    so pairs per walk are ≤ 2·w·len, linear in walk count; the pair
    count map-side combines to ≤|nodes|² cells.  The full graph →
    walks → pairs → (PMI/factorize) chain is thereby gate-certified
    end-to-end, each stage reusing the previous one's oracle as a CTE.
    """
    walks = random_walk_corpus(spark, sf_dir)
    nodes = (walks.select("walk_id",
                          F.posexplode(F.split("path", ">"))
                          .alias("i", "node"))
             .select("walk_id", "i", F.col("node").cast("long")
                     .alias("node")))
    a, b = nodes.alias("a"), nodes.alias("b")
    return (a.join(b, (F.col("a.walk_id") == F.col("b.walk_id")) &
                   (F.col("a.i") != F.col("b.i")) &
                   (F.abs(F.col("a.i") - F.col("b.i")) <= _SG["window"]))
            .groupBy(F.col("a.node").alias("center"),
                     F.col("b.node").alias("context"))
            .agg(F.count("*").alias("n_cooccur")))


# Interpolate the parameter placeholders into the real
# __doc__ attributes (a '"""...""".format(...)' first statement
# is a discarded expression, not a docstring — help()/inspect
# saw None for these functions until this pass).
random_walk_corpus.__doc__ = random_walk_corpus.__doc__.format(**_WALK)
skipgram_pairs.__doc__ = skipgram_pairs.__doc__.format(**_SG)
