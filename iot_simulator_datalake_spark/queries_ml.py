"""Iterative ML dataflows over embedding columns: exact Lloyd k-means
in integer micro-units.

Why it belongs in the surface: the IVF index in
``operators/similarity.py`` needs a coarse quantizer; hash-derived
centroids (what ``similarity_topk_ivf`` uses) are the zero-training
stand-in.  This module implements the real thing — Lloyd iterations as
repeated join+aggregate rounds, the standard distributed k-means — so
the engine covers "train the coarse quantizer" too, not just "probe
it".

Determinism (same discipline as ``queries_graph``): embeddings are
quantized once to integer milli-units with a +10k shift (all values
strictly positive, so Spark's truncating ``div`` and DuckDB's ``//``
agree), distances are exact integer sums of squares, centroid updates
are integer floor-division means (the shift commutes with flooring:
``floor(Σ(q+K)/n) = K + floor(Σq/n)``), and argmin ties break to the
lowest centroid id on both engines.  Every iteration is therefore
bit-reproducible across engines, partitionings and retries.

Scale design: the points table shuffles ONCE per iteration (the
per-point argmin aggregate); centroids are k×d rows and always
broadcast, so no iteration shuffles the big side for the join.  At
100 TB you run this on a deterministic hash-sample (hash_sample_*
pattern), mini-batch style, and cut lineage with a checkpoint every
few rounds — plan shape unchanged.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .queries import load, q

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession

_K = 8          # clusters; seeds = vec_id 0..7 (deterministic init)
_AUTOK_TARGET = 50  # target vectors per cell for the auto-K rule
#                     (SemDeDup's own K-selection: K ∝ corpus size)
_DIMS = 64      # embedding width in the driver's table
_ITERS = 2      # Lloyd rounds (unrolled in the oracle as chained CTEs)
_SHIFT = 10_000  # positivity shift so div/// agree (module docstring)

_PTS_SQL = f"""
  SELECT e.vec_id, ds.d,
         CAST(ROUND(CAST(e.embedding[ds.d] AS DOUBLE) * 1000) AS BIGINT)
           + {_SHIFT} AS qv
  FROM embeddings e
  CROSS JOIN (SELECT UNNEST(generate_series(1, {_DIMS})) AS d) ds
"""

_STEP_SQL = """
, {p}d{k} AS (
  SELECT p.vec_id, c.cid, SUM((p.qv - c.cv) * (p.qv - c.cv)) AS dist2
  FROM pts p JOIN {prev} c USING (d) GROUP BY 1, 2
), {p}m{k} AS (
  SELECT vec_id, MIN(dist2) AS md FROM {p}d{k} GROUP BY 1
), {p}a{k} AS (
  SELECT dd.vec_id, MIN(dd.cid) AS cid
  FROM {p}d{k} dd JOIN {p}m{k} mm
    ON dd.vec_id = mm.vec_id AND dd.dist2 = mm.md
  GROUP BY 1
), {p}s{k} AS (
  SELECT a.cid, p.d, CAST(SUM(p.qv) // COUNT(*) AS BIGINT) AS cv
  FROM pts p JOIN {p}a{k} a USING (vec_id) GROUP BY 1, 2
), {p}c{k} AS (
  SELECT c.cid, c.d, CAST(COALESCE(s.cv, c.cv) AS BIGINT) AS cv
  FROM {prev} c LEFT JOIN {p}s{k} s ON s.cid = c.cid AND s.d = c.d
)"""


def auto_k_of(n: int) -> int:
    """The auto-K rule: K = max(_K, ⌈n / _AUTOK_TARGET⌉) — exact
    integer arithmetic, mirrored verbatim in the oracle's ``kk`` CTE,
    so both engines derive the same K from the same corpus."""
    return max(_K, -(-n // _AUTOK_TARGET))


def _kmeans_assign_ctes(auto_k: bool = False, prefix: str = "",
                        ksql: str | None = None,
                        emit_common: bool = True) -> str:
    """WITH-body through the final assignment (`{prefix}afin`: vec_id →
    cid) — shared by the k-means oracle below and by downstream
    consumers of the clustering (``semdedup_kmeans_prune`` and the IVF
    coarse level in queries_curation).  With ``auto_k`` the seed count
    K is derived from the corpus size (``kk`` CTE = the SQL twin of
    :func:`auto_k_of`) instead of the pinned ``_K``; ``ksql`` overrides
    the seed-count expression outright (the IVF coarse level trains at
    kc = ⌈√K⌉).  ``prefix`` renames every emitted CTE except the shared
    ``kk``/``pts`` so one oracle can unroll TWO Lloyd chains; with
    ``emit_common`` False the caller has already defined those two."""
    if ksql is None:
        ksql = "(SELECT k FROM kk)" if auto_k else str(_K)
    kk = (f"kk AS (SELECT GREATEST({_K}, (COUNT(*) + {_AUTOK_TARGET - 1})"
          f" // {_AUTOK_TARGET}) AS k FROM embeddings),\n"
          if auto_k and emit_common else "")
    common = f"{kk}pts AS ({_PTS_SQL}),\n" if emit_common else ""
    p = prefix
    steps = "".join(
        _STEP_SQL.format(k=k, p=p, prev=f"{p}c{k - 1}" if k > 1 else f"{p}c0")
        for k in range(1, _ITERS + 1))
    last = f"{p}c{_ITERS}"
    return f"""{common}{p}c0 AS (SELECT vec_id AS cid, d, qv AS cv FROM pts WHERE vec_id < {ksql})
{steps}
, {p}dfin AS (
  SELECT p.vec_id, c.cid, SUM((p.qv - c.cv) * (p.qv - c.cv)) AS dist2
  FROM pts p JOIN {last} c USING (d) GROUP BY 1, 2
), {p}mfin AS (
  SELECT vec_id, MIN(dist2) AS md FROM {p}dfin GROUP BY 1
), {p}afin AS (
  SELECT dd.vec_id, MIN(dd.cid) AS cid
  FROM {p}dfin dd JOIN {p}mfin mm
    ON dd.vec_id = mm.vec_id AND dd.dist2 = mm.md
  GROUP BY 1
)"""


def _kmeans_oracle() -> str:
    last = f"c{_ITERS}"
    return f"""
WITH {_kmeans_assign_ctes()}
, stats AS (
  SELECT a.cid, COUNT(*) AS n_points, CAST(SUM(m.md) AS BIGINT) AS inertia
  FROM afin a JOIN mfin m USING (vec_id) GROUP BY 1
), cs AS (
  SELECT cid, CAST(SUM(cv) AS BIGINT) AS centroid_sum FROM {last} GROUP BY 1
)
SELECT cs.cid, CAST(COALESCE(st.n_points, 0) AS BIGINT) AS n_points,
       CAST(COALESCE(st.inertia, 0) AS BIGINT) AS inertia,
       cs.centroid_sum
FROM cs LEFT JOIN stats st USING (cid)
"""


def quantized_pts(emb: "DataFrame") -> "DataFrame":
    """(vec_id, d, qv): the shared quantized long format — dimension
    index ``d`` 1-based, coordinate ``qv = round(x·1000) + _SHIFT``
    (exact integers, positive, so Spark and DuckDB distance arithmetic
    is bit-identical; the SQL twin is ``_PTS_SQL``).  Shared by the
    Lloyd rounds here and the IVF coarse/fine assignment in
    queries_curation."""
    return (emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>"))
         .alias("pos", "x"))
        .select("vec_id", (F.col("pos") + 1).alias("d"),
                (F.round(F.col("x") * 1000, 0).cast("bigint")
                 + F.lit(_SHIFT)).alias("qv")))


def lloyd_final(spark: "SparkSession", sf_dir: str, k: int | None = None,
                pts: "DataFrame | None" = None
                ) -> tuple["DataFrame", "DataFrame", "DataFrame"]:
    """Run the deterministic Lloyd rounds and return
    ``(cent, afin, mfin)`` — final centroids (cid, d, cv), final
    assignment (vec_id, cid) and final min-distance (vec_id, md).
    Shared by ``kmeans_lloyd`` and the SemDeDup k-means pruners
    (queries_curation.semdedup_kmeans_prune and the auto-K twin,
    which passes ``k`` = :func:`auto_k_of` of the corpus count).
    ``pts`` lets a caller that already holds the cached quantized long
    format (the IVF trainer) share it instead of building and caching
    a second identical dataset."""
    if k is None:
        k = _K
    if pts is None:
        emb = load(spark, sf_dir, "embeddings")
        pts = quantized_pts(emb).cache()  # reused every round

    cent = (pts.filter(F.col("vec_id") < k)
            .select(F.col("vec_id").alias("cid"), "d",
                    F.col("qv").alias("cv")))

    def assign(cent: "DataFrame") -> tuple["DataFrame", "DataFrame"]:
        diff = F.col("qv") - F.col("cv")
        dist = (pts.join(F.broadcast(cent), "d")
                .groupBy("vec_id", "cid")
                .agg(F.sum(diff * diff).alias("dist2")))
        md = dist.groupBy("vec_id").agg(F.min("dist2").alias("md"))
        a = (dist.join(md, "vec_id")
             .where(F.col("dist2") == F.col("md"))
             .groupBy("vec_id").agg(F.min("cid").alias("cid")))
        return a, md

    for _ in range(_ITERS):
        a, _md = assign(cent)
        sums = (pts.join(a, "vec_id")
                .groupBy("cid", "d")
                .agg(F.expr("sum(qv) div count(1)").alias("cv_new")))
        cent = (cent.join(sums, ["cid", "d"], "left")
                .select("cid", "d",
                        F.coalesce("cv_new", "cv").cast("bigint")
                        .alias("cv")))
        # Centroids are k×d rows — pin them on the driver between
        # rounds (what MLlib's k-means does too).  This truncates the
        # growing iterative lineage so round N's job doesn't replay
        # rounds 1..N-1, and the next broadcast ships a literal table.
        cent = spark.createDataFrame(cent.collect(), cent.schema)

    afin, mfin = assign(cent)
    return cent, afin, mfin


@q("kmeans_lloyd", ("F10", "A1", "J1", "W3"), oracle=_kmeans_oracle())
def kmeans_lloyd(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Two exact Lloyd k-means rounds (k=8) over quantized embeddings;
    returns per-cluster size, inertia and a centroid checksum.  Each
    round: broadcast-join points to centroids on dim, integer-exact
    distance aggregate, per-point argmin (ties → lowest cid),
    floor-division centroid update, empty clusters keep their previous
    centroid.  See module docstring for determinism + scale."""
    cent, afin, mfin = lloyd_final(spark, sf_dir)
    stats = (afin.join(mfin, "vec_id")
             .groupBy("cid")
             .agg(F.count(F.lit(1)).alias("n_points"),
                  F.sum("md").cast("bigint").alias("inertia")))
    csum = (cent.groupBy("cid")
            .agg(F.sum("cv").cast("bigint").alias("centroid_sum")))
    return (csum.join(stats, "cid", "left")
            .select("cid",
                    F.coalesce("n_points", F.lit(0)).cast("bigint")
                    .alias("n_points"),
                    F.coalesce("inertia", F.lit(0)).cast("bigint")
                    .alias("inertia"),
                    "centroid_sum"))


@q("embedding_dim_stats", ("F10", "A8", "F7"), oracle=f"""
WITH pts AS ({_PTS_SQL})
SELECT d, COUNT(*) AS n,
       CAST(SUM(qv) // COUNT(*) - {_SHIFT} AS BIGINT) AS mean_milli,
       CAST((CAST(COUNT(*) AS HUGEINT) * SUM(qv * qv)
             - CAST(SUM(qv) AS HUGEINT) * SUM(qv))
            // (CAST(COUNT(*) AS HUGEINT) * COUNT(*)) AS BIGINT)
         AS var_milli2
FROM pts GROUP BY d
""")
def embedding_dim_stats(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Per-dimension mean/variance of the embedding column — the
    fit-stage of feature standardization (the transform is then a
    map-only ``zip_with``).  Same milli-unit quantization + positivity
    shift as kmeans_lloyd: the shift commutes with the floored mean
    and cancels in the variance, so both engines produce identical
    integers.  One posexplode + one hash aggregate on d (64 groups):
    map-side combine reduces the shuffle to n_partitions × 64 rows
    regardless of corpus size."""
    emb = load(spark, sf_dir, "embeddings")
    pts = (emb.select(
        F.posexplode(F.col("embedding").cast("array<double>"))
         .alias("pos", "x"))
        .select((F.col("pos") + 1).cast("bigint").alias("d"),
                (F.round(F.col("x") * 1000, 0).cast("bigint")
                 + F.lit(_SHIFT)).alias("qv")))
    # variance cross-terms in 128-bit (DECIMAL(38,0) ≡ HUGEINT): with
    # qv ≤ ~3e4, n·Σqv² crosses int64 at only ~2e5 vectors per dim —
    # the ×100 replica ALREADY sits past that line; the var_milli2
    # QUOTIENT (≤ qv² ≈ 9e8) is long-safe at any n
    return (pts.groupBy("d")
            .agg(F.count(F.lit(1)).alias("n"),
                 (F.expr("sum(qv) div count(1)") - F.lit(_SHIFT))
                 .cast("bigint").alias("mean_milli"),
                 F.expr("(CAST(count(1) AS DECIMAL(38,0)) * sum(qv * qv)"
                        " - CAST(sum(qv) AS DECIMAL(38,0)) * sum(qv)) "
                        "div (CAST(count(1) AS DECIMAL(38,0)) * count(1))")
                 .cast("bigint").alias("var_milli2")))


# =========================================================================
# Product quantization — per-subspace codebooks + encoding (IVF-PQ's PQ)
# =========================================================================

_PQ_BLOCKS = 4
_PQ_K = 4
_PQ_BDIMS = _DIMS // _PQ_BLOCKS   # 16 dims per sub-vector


def _pq_ctes() -> str:
    """The shared PQ WITH-chain (points → per-block seeds → one Lloyd
    update → final centroids c1 → assignment a2 + per-block min
    distances m2) — ONE SQL source for the codebook, so the encode
    gate and the ADC serving gate can never train different models."""
    return (f"""pts AS ({_PTS_SQL}),
bp AS (SELECT vec_id, d, qv, (d - 1) // {_PQ_BDIMS} AS blk FROM pts),
""" + _pq_train_ctes())


def _pq_train_ctes(prefix: str = "", src: str = "bp",
                   mat: bool = False) -> str:
    """The trainer half of :func:`_pq_ctes`: per-block seeds → one
    Lloyd update → c1/a2/m2, reading whatever relation is named ``src``
    (vec_id, d, qv, blk) — so the RESIDUAL variant can train the same
    chain over residual block-points.  ``prefix`` renames every
    emitted CTE (``{prefix}c1`` …) so TWO trainings — e.g. the
    structured eval's plain-vs-residual pair — can coexist in one
    WITH chain without name collisions.  ``mat=True`` marks the
    multi-referenced CTEs (d1/c1/d2) MATERIALIZED: with two trainings
    in one statement DuckDB's inlining re-executes each distance
    join once per reference and the transitive fan-out spilled >55 GB
    of temp at ×100 (measured r10) — the same disk-exhaustion class
    the r9 residual oracles hit."""
    p_ = prefix
    m_ = "MATERIALIZED " if mat else ""
    return f"""{p_}c0 AS (SELECT blk, vec_id AS cid, d, qv AS cv
       FROM {src} WHERE vec_id < {_PQ_K}),
{p_}d1 AS {m_}(
  SELECT p.vec_id, c.blk, c.cid,
         SUM((p.qv - c.cv) * (p.qv - c.cv)) AS dist2
  FROM {src} p JOIN {p_}c0 c ON p.d = c.d GROUP BY 1, 2, 3
), {p_}m1 AS (
  SELECT vec_id, blk, MIN(dist2) AS md FROM {p_}d1 GROUP BY 1, 2
), {p_}a1 AS (
  SELECT dd.vec_id, dd.blk, MIN(dd.cid) AS cid
  FROM {p_}d1 dd JOIN {p_}m1 mm ON dd.vec_id = mm.vec_id
                       AND dd.blk = mm.blk
                       AND dd.dist2 = mm.md
  GROUP BY 1, 2
), {p_}s1 AS (
  SELECT a.blk, a.cid, p.d, CAST(SUM(p.qv) // COUNT(*) AS BIGINT) AS cv
  FROM {src} p JOIN {p_}a1 a ON p.vec_id = a.vec_id AND p.blk = a.blk
  GROUP BY 1, 2, 3
), {p_}c1 AS {m_}(
  SELECT c.blk, c.cid, c.d, CAST(COALESCE(s.cv, c.cv) AS BIGINT) AS cv
  FROM {p_}c0 c LEFT JOIN {p_}s1 s ON s.blk = c.blk AND s.cid = c.cid
                          AND s.d = c.d
), {p_}d2 AS {m_}(
  SELECT p.vec_id, c.blk, c.cid,
         SUM((p.qv - c.cv) * (p.qv - c.cv)) AS dist2
  FROM {src} p JOIN {p_}c1 c ON p.d = c.d GROUP BY 1, 2, 3
), {p_}m2 AS (
  SELECT vec_id, blk, MIN(dist2) AS md FROM {p_}d2 GROUP BY 1, 2
), {p_}a2 AS (
  SELECT dd.vec_id, dd.blk, MIN(dd.cid) AS cid
  FROM {p_}d2 dd JOIN {p_}m2 mm ON dd.vec_id = mm.vec_id
                       AND dd.blk = mm.blk
                       AND dd.dist2 = mm.md
  GROUP BY 1, 2
)"""


def _pq_oracle() -> str:
    codes = ", ".join(
        f"MAX(CASE WHEN a.blk = {b} THEN a.cid END) AS code_{b}"
        for b in range(_PQ_BLOCKS))
    return f"""
WITH {_pq_ctes()}
SELECT a.vec_id, {codes},
       CAST(SUM(m.md) AS BIGINT) AS err_milli2
FROM a2 a JOIN m2 m ON m.vec_id = a.vec_id AND m.blk = a.blk
GROUP BY 1
"""


#: ADC serving: distance table of the probe (vec 0) against the final
#: codebook, then per-vector Σ over blocks of table[blk, code]
_PQ_ADC_SQL = f"""pdt AS (
  SELECT c.blk, c.cid, SUM((p.qv - c.cv) * (p.qv - c.cv)) AS dt2
  FROM (SELECT d, qv FROM pts WHERE vec_id = 0) p
  JOIN c1 c ON p.d = c.d
  GROUP BY 1, 2
), adc AS (
  SELECT a.vec_id, CAST(SUM(t.dt2) AS BIGINT) AS adc2
  FROM a2 a JOIN pdt t ON a.blk = t.blk AND a.cid = t.cid
  WHERE a.vec_id <> 0
  GROUP BY 1
)"""


def _pq_model(spark: "SparkSession", sf_dir: str
              ) -> tuple["DataFrame", "DataFrame", "DataFrame",
                         "DataFrame"]:
    """Train the shared PQ model (the Spark twin of :func:`_pq_ctes`):
    returns (bp quantized block-points, final centroids, a2 per-block
    assignment, m2 per-block min distances).  One Spark source for the
    codebook, mirroring the one SQL source — the encode gate and the
    ADC serving gate consume the SAME trained model."""
    emb = load(spark, sf_dir, "embeddings")
    bp = (emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>"))
         .alias("pos", "x"))
        .select("vec_id", (F.col("pos") + 1).alias("d"),
                (F.round(F.col("x") * 1000, 0).cast("bigint")
                 + F.lit(_SHIFT)).alias("qv"))
        .withColumn("blk", F.expr(f"(d - 1) div {_PQ_BDIMS}"))
        .cache())

    c, a2, m2 = _pq_train(spark, bp)
    return bp, c, a2, m2


def _pq_train(spark: "SparkSession", bp: "DataFrame"
              ) -> tuple["DataFrame", "DataFrame", "DataFrame"]:
    """Per-block codebook trainer (the Spark twin of
    :func:`_pq_train_ctes`): seeds from the first ``_PQ_K`` vec_ids,
    one exact Lloyd update, final assignment — over ANY block-point
    relation (vec_id, d, qv, blk), so the raw and RESIDUAL models
    train through one implementation."""
    cent = (bp.filter(F.col("vec_id") < _PQ_K)
            .select("blk", F.col("vec_id").alias("cid"), "d",
                    F.col("qv").alias("cv")))

    def assign(cent: "DataFrame") -> tuple["DataFrame", "DataFrame"]:
        diff = F.col("qv") - F.col("cv")
        dist = (bp.join(F.broadcast(cent.withColumnRenamed("blk", "cblk")),
                        "d")
                .groupBy("vec_id", "cblk", "cid")
                .agg(F.sum(diff * diff).alias("dist2"))
                .withColumnRenamed("cblk", "blk"))
        md = (dist.groupBy("vec_id", "blk")
              .agg(F.min("dist2").alias("md")))
        a = (dist.join(md, ["vec_id", "blk"])
             .where(F.col("dist2") == F.col("md"))
             .groupBy("vec_id", "blk").agg(F.min("cid").alias("cid")))
        return a, md

    a1, _ = assign(cent)
    sums = (bp.join(a1, ["vec_id", "blk"])
            .groupBy("blk", "cid", "d")
            .agg(F.expr("sum(qv) div count(1)").alias("cv_new")))
    cent = (cent.join(sums, ["blk", "cid", "d"], "left")
            .select("blk", "cid", "d",
                    F.coalesce("cv_new", "cv").cast("bigint").alias("cv")))
    cent = spark.createDataFrame(cent.collect(), cent.schema)

    a2, m2 = assign(cent)
    return cent, a2, m2


@q("pq_codebook_encode", ("F10", "A1", "W3"), oracle=_pq_oracle())
def pq_codebook_encode(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Product quantization: train 4 independent 16-dim sub-space
    codebooks (k=4, one exact Lloyd round from deterministic seeds)
    and encode every vector as 4 codes + its exact reconstruction
    error — the PQ half of IVF-PQ, completing the similarity family
    (brute force → sign-LSH → IVF → PQ compression).

    64 dims × 4 bytes shrink to 4 code bytes (16× at these settings;
    production PQ with 8-bit codebooks gets 32-64×) while distance
    queries become per-block table lookups.  Plan shape: identical to
    kmeans_lloyd with (block, cid) composite centroid keys — centroids
    stay k×d broadcast rows, points shuffle once per assignment pass,
    every quantity is an exact shifted-milli-unit integer so both
    engines agree bit-for-bit.  Empty codes inherit their seed
    centroid (COALESCE), same as kmeans."""
    _, _, a2, m2 = _pq_model(spark, sf_dir)
    codes = [F.max(F.when(F.col("blk") == b, F.col("cid")))
             .alias(f"code_{b}") for b in range(_PQ_BLOCKS)]
    return (a2.join(m2, ["vec_id", "blk"])
            .groupBy("vec_id")
            .agg(*codes, F.sum("md").cast("bigint").alias("err_milli2")))


_PQ_TOPK = 10


@q("similarity_topk_pq_adc", ("F10", "W3", "J5"), oracle=f"""
WITH {_pq_ctes()}, {_PQ_ADC_SQL}
SELECT vec_id, adc2 FROM adc ORDER BY adc2, vec_id LIMIT {_PQ_TOPK}
""")
def similarity_topk_pq_adc(spark: "SparkSession",
                           sf_dir: str) -> "DataFrame":
    """PQ SERVING — asymmetric distance computation (ADC), the other
    half of IVF-PQ: the probe (vector 0) computes one distance TABLE
    against the trained codebook (blocks × k = {blocks}×{k} integer
    entries, broadcast), and every corpus vector's approximate L2² is
    a Σ over blocks of table[blk, code] — the vector's 64 floats are
    never touched at query time, only its {blocks} code bytes.

    This is how a 100 TB vector store actually serves: the codes table
    is 16-64× smaller than raw vectors (memory-residency is the whole
    point of PQ), the distance table is probe-side-only work, and the
    scan is a code-table lookup join + map-side integer sum with a
    TakeOrderedAndProject top-k.  All quantities are shifted
    milli-unit integers, so Spark and the unrolled DuckDB twin agree
    bit-for-bit on distances AND tie-breaks.  The recall cost of
    serving from codes instead of floats is gated by
    ``pq_adc_recall_eval``, not assumed."""
    bp, cent, a2, _ = _pq_model(spark, sf_dir)
    probe = (bp.filter(F.col("vec_id") == 0)
             .select("d", F.col("qv").alias("pv")))
    diff = F.col("pv") - F.col("cv")
    dt = (cent.join(F.broadcast(probe), "d")
          .groupBy("blk", "cid")
          .agg(F.sum(diff * diff).alias("dt2")))
    return (a2.filter(F.col("vec_id") != 0)
            .join(F.broadcast(dt), ["blk", "cid"])
            .groupBy("vec_id")
            .agg(F.sum("dt2").cast("bigint").alias("adc2"))
            .orderBy("adc2", "vec_id")
            .limit(_PQ_TOPK))


@q("pq_adc_recall_eval", ("F10", "W3", "A1"), oracle=f"""
WITH {_pq_ctes()}, {_PQ_ADC_SQL},
ex AS (
  SELECT a.vec_id, SUM((a.qv - p.qv) * (a.qv - p.qv)) AS d2
  FROM pts a JOIN (SELECT d, qv FROM pts WHERE vec_id = 0) p USING (d)
  WHERE a.vec_id <> 0 GROUP BY 1
), exk AS (SELECT vec_id FROM ex ORDER BY d2, vec_id LIMIT {_PQ_TOPK}),
adck AS (SELECT vec_id FROM adc ORDER BY adc2, vec_id LIMIT {_PQ_TOPK})
SELECT COUNT(*)::INT AS k, COUNT(a.vec_id)::INT AS hits,
       CAST(COUNT(a.vec_id) * 1000000 // COUNT(*) AS BIGINT)
         AS recall_ppm
FROM exk e LEFT JOIN adck a USING (vec_id)
""")
def pq_adc_recall_eval(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Trust gate for ADC serving: recall@{topk} of the code-based
    top-k (``similarity_topk_pq_adc``) against the EXACT L2 top-k over
    the same quantized vectors — apples-to-apples (both sides use the
    shifted milli-unit integers), so the measured loss is exactly the
    quantization error of serving from {blocks} code bytes, nothing
    else.  Same harness contract as ``ann_recall_eval`` /
    ``semdedup_ivf_recall_eval``: the approximation's quality is an
    oracle-gated NUMBER — run it per corpus before letting the
    16-64×-smaller codes replace raw floats.  On the driver's
    iid-random synthetic vectors it reads 0.30 at sf0.01 — the honest
    maxsim-routing story again: structureless embeddings have no
    low-rank block structure for {blocks} coarse codebooks to exploit
    (real embedding corpora cluster; production PQ uses 8-bit
    codebooks per block, k=256 not {k_}); raise k / blocks and re-run
    the eval to price YOUR corpus.  ``pq_structured_recall_eval`` is
    the companion gate on a clustered fixture — the regime where the
    codebooks have structure to exploit."""
    bp, cent, a2, _ = _pq_model(spark, sf_dir)
    probe = (bp.filter(F.col("vec_id") == 0)
             .select("d", F.col("qv").alias("pv")))
    diff = F.col("pv") - F.col("cv")
    dt = (cent.join(F.broadcast(probe), "d")
          .groupBy("blk", "cid")
          .agg(F.sum(diff * diff).alias("dt2")))
    adck = (a2.filter(F.col("vec_id") != 0)
            .join(F.broadcast(dt), ["blk", "cid"])
            .groupBy("vec_id")
            .agg(F.sum("dt2").alias("adc2"))
            .orderBy("adc2", "vec_id").limit(_PQ_TOPK)
            .select("vec_id", F.lit(1).alias("_hit")))
    pdiff = F.col("qv") - F.col("pv")
    exk = (bp.filter(F.col("vec_id") != 0)
           .join(F.broadcast(probe), "d")
           .groupBy("vec_id")
           .agg(F.sum(pdiff * pdiff).alias("d2"))
           .orderBy("d2", "vec_id").limit(_PQ_TOPK)
           .select("vec_id"))
    return (exk.join(adck, "vec_id", "left")
            .agg(F.count(F.lit(1)).cast("int").alias("k"),
                 F.count("_hit").cast("int").alias("hits"))
            .selectExpr("k", "hits",
                        "CAST((hits * 1000000) div k AS BIGINT)"
                        " AS recall_ppm"))


def _ivf_assign8(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """(vec_id, cluster): the coarse inverted-file assignment shared by
    the fused and residual IVF-PQ gates — cosine argmax against the
    first-8-vector centroid table (the ``similarity_topk_ivf``
    quantizer), tie-broken on cent_id like the SQL twin."""
    from .functions.vector import cosine_micro
    e = load(spark, sf_dir, "embeddings")
    cents = (e.orderBy("vec_id").limit(8)
             .select(F.col("vec_id").alias("cent_id"),
                     F.col("embedding").alias("cent_vec")))
    wr = W.partitionBy("vec_id").orderBy(
        (-cosine_micro(F.col("embedding"), F.col("cent_vec"))),
        "cent_id")
    return (e.crossJoin(F.broadcast(cents))
            .withColumn("rn", F.row_number().over(wr))
            .filter(F.col("rn") == 1)
            .select("vec_id", F.col("cent_id").alias("cluster")))


#: shared SQL fragment: emb/cents/assign — the coarse quantizer twin
def _o_ivf_assign8() -> str:
    from .queries_ext import _O_COS_EC, _O_EMB
    return f"""emb AS ({_O_EMB}),
cents AS (
  SELECT vec_id AS cent_id, vec AS cent_vec FROM emb
  ORDER BY vec_id LIMIT 8
),
assign AS MATERIALIZED (
  SELECT vec_id, cluster FROM (
    SELECT e.vec_id, c.cent_id AS cluster,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
               ORDER BY -{_O_COS_EC}, c.cent_id) AS rn
    FROM emb e CROSS JOIN cents c
  ) WHERE rn = 1
)"""


def _ivfpq_oracle() -> str:
    return f"""
WITH {_pq_ctes()},
{_o_ivf_assign8()},
probes AS (
  SELECT vec_id AS probe_id, cluster FROM assign WHERE vec_id < 10
),
pdt AS (
  SELECT p.vec_id AS probe_id, c.blk, c.cid,
         SUM((p.qv - c.cv) * (p.qv - c.cv)) AS dt2
  FROM pts p JOIN c1 c ON p.d = c.d
  WHERE p.vec_id < 10
  GROUP BY 1, 2, 3
),
adc AS (
  SELECT b.probe_id, a.vec_id, CAST(SUM(t.dt2) AS BIGINT) AS adc2
  FROM a2 a
  JOIN assign s ON s.vec_id = a.vec_id
  JOIN probes b ON s.cluster = b.cluster AND a.vec_id <> b.probe_id
  JOIN pdt t ON t.probe_id = b.probe_id AND t.blk = a.blk
            AND t.cid = a.cid
  GROUP BY 1, 2
)
SELECT probe_id, vec_id, adc2, rank::INT AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY probe_id ORDER BY adc2, vec_id) AS rank
  FROM adc) WHERE rank <= 5
"""


@q("similarity_topk_ivfpq", ("F10", "W3", "J5"), oracle=_ivfpq_oracle())
def similarity_topk_ivfpq(spark: "SparkSession",
                          sf_dir: str) -> "DataFrame":
    """IVF-PQ, fused: the coarse inverted file routes each probe to
    its cell (the exact routing ``similarity_topk_ivf`` gates), and
    candidates INSIDE the cell are scored by PQ asymmetric distance
    from their code bytes (the serving ``similarity_topk_pq_adc``
    gates) — the standard faiss IVFPQ layout, end-to-end in one
    oracle-gated relation.

    Why this is THE 100 TB vector-search shape: the inverted file
    cuts candidates to n_probe/n_centroids of the corpus, and PQ cuts
    per-candidate cost to a table lookup over {blocks} code bytes —
    at a billion vectors neither half is optional (raw floats don't
    fit memory; full-corpus ADC still scans a billion codes).  Probe
    work = one blocks×k distance table each (broadcast); candidate
    work = code-lookup join + integer sum, map-side; top-k per probe
    over cell-sized relations.  The classic residual refinement
    (codebooks trained on vector − cell centroid) is
    ``similarity_topk_ivfpq_residual``, same plan shape and shared
    trainer.  Recall pricing composes the gated evals
    (`ann_recall_eval`'s harness contract)."""
    bp, cent, a2, _ = _pq_model(spark, sf_dir)
    assign = _ivf_assign8(spark, sf_dir)
    probes = (assign.filter(F.col("vec_id") < 10)
              .select(F.col("vec_id").alias("probe_id"), "cluster"))
    pv = (bp.filter(F.col("vec_id") < 10)
          .select(F.col("vec_id").alias("probe_id"), "d",
                  F.col("qv").alias("pv")))
    diff = F.col("pv") - F.col("cv")
    pdt = (cent.join(F.broadcast(pv), "d")
           .groupBy("probe_id", "blk", "cid")
           .agg(F.sum(diff * diff).alias("dt2")))
    adc = (a2.join(assign, "vec_id")
           .join(F.broadcast(probes), "cluster")
           .filter(F.col("vec_id") != F.col("probe_id"))
           .join(F.broadcast(pdt), ["probe_id", "blk", "cid"])
           .groupBy("probe_id", "vec_id")
           .agg(F.sum("dt2").cast("bigint").alias("adc2")))
    wk = W.partitionBy("probe_id").orderBy("adc2", "vec_id")
    return (adc.withColumn("rank", F.row_number().over(wk))
            .filter(F.col("rank") <= 5)
            .select("probe_id", "vec_id", "adc2",
                    F.col("rank").cast("int").alias("rank")))


def _residual_model(spark: "SparkSession", sf_dir: str):
    """Residual IVF-PQ model: coarse-assign every vector, subtract its
    cell centroid's quantized dims (re-shifted positive so the shared
    floor-div trainer stays valid), and train the SAME per-block
    codebook chain over the residual block-points.  Returns
    (residual bp, final residual centroids, residual a2, assign)."""
    emb = load(spark, sf_dir, "embeddings")
    raw = (emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>"))
         .alias("pos", "x"))
        .select("vec_id", (F.col("pos") + 1).alias("d"),
                (F.round(F.col("x") * 1000, 0).cast("bigint")
                 + F.lit(_SHIFT)).alias("qv")))
    assign = _ivf_assign8(spark, sf_dir)
    cq = (raw.filter(F.col("vec_id") < 8)
          .select(F.col("vec_id").alias("cluster"), "d",
                  F.col("qv").alias("cqv")))
    rbp = (raw.join(assign, "vec_id")
           .join(F.broadcast(cq), ["cluster", "d"])
           .select("vec_id", "d",
                   (F.col("qv") - F.col("cqv") + F.lit(_SHIFT))
                   .alias("qv"),
                   F.expr(f"(d - 1) div {_PQ_BDIMS}").alias("blk"))
           .cache())
    cent, a2, _ = _pq_train(spark, rbp)
    return rbp, cent, a2, assign


#: MATERIALIZED on purpose (the _o_ivf_probes precedent): bp feeds
#: d1/s1/d2/pdt and assign feeds bp/probes/adc — DuckDB would
#: otherwise re-execute the join (and the cross-join window under
#: assign) once per reference; measured at ×100 as a
#: disk-exhausting spill, materialized it fits comfortably.
_O_RES_BP = f"""bp AS MATERIALIZED (
  SELECT p.vec_id, p.d, p.qv - cp.qv + {_SHIFT} AS qv,
         (p.d - 1) // {_PQ_BDIMS} AS blk
  FROM pts p JOIN assign m ON p.vec_id = m.vec_id
             JOIN pts cp ON cp.vec_id = m.cluster AND cp.d = p.d
)"""

_O_RES_ADC = """pdt AS (
  SELECT b.vec_id AS probe_id, c.blk, c.cid,
         SUM((b.qv - c.cv) * (b.qv - c.cv)) AS dt2
  FROM bp b JOIN c1 c ON b.d = c.d
  WHERE b.vec_id < 10
  GROUP BY 1, 2, 3
),
probes AS (
  SELECT vec_id AS probe_id, cluster FROM assign WHERE vec_id < 10
),
adc AS (
  SELECT pr.probe_id, a.vec_id, CAST(SUM(t.dt2) AS BIGINT) AS adc2
  FROM a2 a
  JOIN assign s ON s.vec_id = a.vec_id
  JOIN probes pr ON s.cluster = pr.cluster AND a.vec_id <> pr.probe_id
  JOIN pdt t ON t.probe_id = pr.probe_id AND t.blk = a.blk
            AND t.cid = a.cid
  GROUP BY 1, 2
)"""


@q("similarity_topk_ivfpq_residual", ("F10", "W3", "J5"), oracle=f"""
WITH pts AS ({_PTS_SQL}),
{_o_ivf_assign8()},
{_O_RES_BP},
{_pq_train_ctes()},
{_O_RES_ADC}
SELECT probe_id, vec_id, adc2, rank::INT AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY probe_id ORDER BY adc2, vec_id) AS rank
  FROM adc) WHERE rank <= 5
""")
def similarity_topk_ivfpq_residual(spark: "SparkSession",
                                   sf_dir: str) -> "DataFrame":
    """Residual IVF-PQ — the faiss-faithful form the fused gate's
    docstring deferred: codebooks train on RESIDUALS (vector − its
    coarse cell centroid), not raw vectors.  Within a shared cell the
    centroid cancels — (a−c)−(b−c) = a−b — so residual ADC
    approximates the TRUE inter-vector distance while the codebooks
    only have to cover the residual's much smaller dynamic range;
    that is why production IVFPQ always encodes residuals.

    Same serving shape as ``similarity_topk_ivfpq`` (per-probe
    blocks×k table broadcast, code-lookup sum inside the probe's
    cell, TakeOrderedAndProject), same shared trainer
    (``_pq_train`` / ``_pq_train_ctes``) — only the block-point
    relation differs.  ``ivfpq_residual_recall_eval`` prices the
    quantization against the exact within-cell L2."""
    rbp, cent, a2, assign = _residual_model(spark, sf_dir)
    probes = (assign.filter(F.col("vec_id") < 10)
              .select(F.col("vec_id").alias("probe_id"), "cluster"))
    pv = (rbp.filter(F.col("vec_id") < 10)
          .select(F.col("vec_id").alias("probe_id"), "d",
                  F.col("qv").alias("pv")))
    diff = F.col("pv") - F.col("cv")
    pdt = (cent.join(F.broadcast(pv), "d")
           .groupBy("probe_id", "blk", "cid")
           .agg(F.sum(diff * diff).alias("dt2")))
    adc = (a2.join(assign, "vec_id")
           .join(F.broadcast(probes), "cluster")
           .filter(F.col("vec_id") != F.col("probe_id"))
           .join(F.broadcast(pdt), ["probe_id", "blk", "cid"])
           .groupBy("probe_id", "vec_id")
           .agg(F.sum("dt2").cast("bigint").alias("adc2")))
    wk = W.partitionBy("probe_id").orderBy("adc2", "vec_id")
    return (adc.withColumn("rank", F.row_number().over(wk))
            .filter(F.col("rank") <= 5)
            .select("probe_id", "vec_id", "adc2",
                    F.col("rank").cast("int").alias("rank")))


@q("ivfpq_residual_recall_eval", ("F10", "W3", "A1"), oracle=f"""
WITH pts AS ({_PTS_SQL}),
{_o_ivf_assign8()},
{_O_RES_BP},
{_pq_train_ctes()},
{_O_RES_ADC},
rawc AS MATERIALIZED (
  SELECT p.vec_id, m.cluster, p.d, p.qv
  FROM pts p JOIN assign m ON p.vec_id = m.vec_id
),
ex AS (
  SELECT pp.vec_id AS probe_id, ca.vec_id,
         SUM((ca.qv - pp.qv) * (ca.qv - pp.qv)) AS d2
  FROM rawc ca JOIN rawc pp ON ca.cluster = pp.cluster AND ca.d = pp.d
  WHERE pp.vec_id < 10 AND ca.vec_id <> pp.vec_id
  GROUP BY 1, 2
),
exk AS (
  SELECT probe_id, vec_id FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY probe_id ORDER BY d2, vec_id) AS r FROM ex)
  WHERE r <= 5
),
adck AS (
  SELECT probe_id, vec_id FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY probe_id ORDER BY adc2, vec_id) AS r FROM adc)
  WHERE r <= 5
)
SELECT COUNT(*)::INT AS k, COUNT(a.vec_id)::INT AS hits,
       CAST(COUNT(a.vec_id) * 1000000 // COUNT(*) AS BIGINT)
         AS recall_ppm
FROM exk e LEFT JOIN adck a USING (probe_id, vec_id)
""")
def ivfpq_residual_recall_eval(spark: "SparkSession",
                               sf_dir: str) -> "DataFrame":
    """Trust gate for residual ADC: recall@5 of the residual-coded
    top-k against the EXACT quantized within-cell L2 top-k, per probe,
    aggregated over the 10-probe panel — routing held fixed on both
    sides so the measured loss is the residual quantization alone.
    Same contract as ``pq_adc_recall_eval``; because residuals cancel
    the shared centroid, this form's recall is the one that benefits
    from cell structure (on iid-random vectors both read low —
    structureless residuals — which is the honest reading to check
    against YOUR corpus).  ``pq_structured_recall_eval`` is the
    companion gate on a clustered fixture, where the residual form's
    designed advantage actually shows (r10: 0.28 vs plain 0.06 at
    sf0.01, 0.66 vs 0.00 at ×100)."""
    rbp, cent, a2, assign = _residual_model(spark, sf_dir)
    probes = (assign.filter(F.col("vec_id") < 10)
              .select(F.col("vec_id").alias("probe_id"), "cluster"))
    pv = (rbp.filter(F.col("vec_id") < 10)
          .select(F.col("vec_id").alias("probe_id"), "d",
                  F.col("qv").alias("pv")))
    diff = F.col("pv") - F.col("cv")
    pdt = (cent.join(F.broadcast(pv), "d")
           .groupBy("probe_id", "blk", "cid")
           .agg(F.sum(diff * diff).alias("dt2")))
    wk = W.partitionBy("probe_id").orderBy("adc2", "vec_id")
    adck = (a2.join(assign, "vec_id")
            .join(F.broadcast(probes), "cluster")
            .filter(F.col("vec_id") != F.col("probe_id"))
            .join(F.broadcast(pdt), ["probe_id", "blk", "cid"])
            .groupBy("probe_id", "vec_id")
            .agg(F.sum("dt2").alias("adc2"))
            .withColumn("r", F.row_number().over(wk))
            .filter(F.col("r") <= 5)
            .select("probe_id", "vec_id", F.lit(1).alias("_hit")))
    emb = load(spark, sf_dir, "embeddings")
    raw = (emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>"))
         .alias("pos", "x"))
        .select("vec_id", (F.col("pos") + 1).alias("d"),
                (F.round(F.col("x") * 1000, 0).cast("bigint")
                 + F.lit(_SHIFT)).alias("qv"))
        .join(assign, "vec_id"))
    probe_dims = (raw.filter(F.col("vec_id") < 10)
                  .select(F.col("vec_id").alias("probe_id"),
                          F.col("cluster").alias("pcluster"),
                          F.col("d").alias("pd"),
                          F.col("qv").alias("pqv")))
    d2 = F.col("qv") - F.col("pqv")
    wke = W.partitionBy("probe_id").orderBy("d2", "vec_id")
    exk = (raw.join(F.broadcast(probe_dims),
                    (F.col("cluster") == F.col("pcluster")) &
                    (F.col("d") == F.col("pd")))
           .filter(F.col("vec_id") != F.col("probe_id"))
           .groupBy("probe_id", "vec_id")
           .agg(F.sum(d2 * d2).alias("d2"))
           .withColumn("r", F.row_number().over(wke))
           .filter(F.col("r") <= 5)
           .select("probe_id", "vec_id"))
    return (exk.join(adck, ["probe_id", "vec_id"], "left")
            .agg(F.count(F.lit(1)).cast("int").alias("k"),
                 F.count("_hit").cast("int").alias("hits"))
            .selectExpr("k", "hits",
                        "CAST((hits * 1000000) div k AS BIGINT)"
                        " AS recall_ppm"))


similarity_topk_pq_adc.__doc__ = similarity_topk_pq_adc.__doc__.format(
    blocks=_PQ_BLOCKS, k=_PQ_K)
#: structured-fixture knobs: _SC mixture components (seeded from the
#: first _SC corpus vectors), _SA center-separation amplifier, _SN
#: noise divisor — all exact integer arithmetic, so both engines
#: build bit-identical fixtures from the same parquet
_SC, _SA, _SN = 8, 6, 8


def _structured_oracle() -> str:
    return f"""
WITH pts AS ({_PTS_SQL}),
ctr AS MATERIALIZED (
  SELECT vec_id AS cluster, d, (qv - {_SHIFT}) * {_SA} AS cterm
  FROM pts WHERE vec_id < {_SC}
),
cl AS MATERIALIZED (
  SELECT p.vec_id, p.d, c.cterm + p.qv // {_SN} + {_SHIFT} AS qv,
         (p.d - 1) // {_PQ_BDIMS} AS blk
  FROM pts p JOIN ctr c ON c.cluster = p.vec_id % {_SC} AND c.d = p.d
),
{_pq_train_ctes(prefix="p", src="cl", mat=True)},
rbp AS MATERIALIZED (
  SELECT vec_id, d, qv // {_SN} + {_SHIFT} AS qv,
         (d - 1) // {_PQ_BDIMS} AS blk
  FROM pts
),
{_pq_train_ctes(prefix="r", src="rbp", mat=True)},
ppd AS (SELECT vec_id AS probe_id, d, qv FROM cl
        WHERE vec_id < 10),
pdt AS (
  SELECT p.probe_id, c.blk, c.cid,
         SUM((p.qv - c.cv) * (p.qv - c.cv)) AS dt2
  FROM ppd p JOIN pc1 c ON p.d = c.d GROUP BY 1, 2, 3
),
padck AS (
  SELECT probe_id, vec_id FROM (
    SELECT probe_id, vec_id, ROW_NUMBER() OVER (
        PARTITION BY probe_id ORDER BY adc2, vec_id) AS r
    FROM (
      SELECT t.probe_id, a.vec_id,
             CAST(SUM(t.dt2) AS BIGINT) AS adc2
      FROM pa2 a JOIN pdt t ON t.blk = a.blk AND t.cid = a.cid
      WHERE a.vec_id <> t.probe_id
      GROUP BY 1, 2))
  WHERE r <= 5
),
rdt AS (
  SELECT p.probe_id, x.cluster, c.blk, c.cid,
         SUM((p.qv - x.cterm - c.cv) * (p.qv - x.cterm - c.cv)) AS dt2
  FROM ppd p JOIN ctr x ON x.d = p.d
             JOIN rc1 c ON c.d = p.d
  GROUP BY 1, 2, 3, 4
),
radck AS (
  SELECT probe_id, vec_id FROM (
    SELECT probe_id, vec_id, ROW_NUMBER() OVER (
        PARTITION BY probe_id ORDER BY adc2, vec_id) AS r
    FROM (
      SELECT t.probe_id, a.vec_id,
             CAST(SUM(t.dt2) AS BIGINT) AS adc2
      FROM ra2 a JOIN rdt t ON t.cluster = a.vec_id % {_SC}
                 AND t.blk = a.blk AND t.cid = a.cid
      WHERE a.vec_id <> t.probe_id
      GROUP BY 1, 2))
  WHERE r <= 5
),
exk AS (
  SELECT probe_id, vec_id FROM (
    SELECT probe_id, vec_id, ROW_NUMBER() OVER (
        PARTITION BY probe_id ORDER BY d2, vec_id) AS r
    FROM (
      SELECT p.probe_id, v.vec_id,
             SUM((v.qv - p.qv) * (v.qv - p.qv)) AS d2
      FROM cl v JOIN ppd p ON v.d = p.d
      WHERE v.vec_id <> p.probe_id
      GROUP BY 1, 2))
  WHERE r <= 5
)
SELECT COUNT(*)::INT AS k,
       COUNT(pl.vec_id)::INT AS hits_plain,
       COUNT(rs.vec_id)::INT AS hits_residual,
       CAST(COUNT(pl.vec_id) * 1000000 // COUNT(*) AS BIGINT)
         AS plain_recall_ppm,
       CAST(COUNT(rs.vec_id) * 1000000 // COUNT(*) AS BIGINT)
         AS residual_recall_ppm,
       CAST(COUNT(rs.vec_id) * 1000000 // COUNT(*) AS BIGINT)
         - CAST(COUNT(pl.vec_id) * 1000000 // COUNT(*) AS BIGINT)
         AS gap_ppm
FROM exk e LEFT JOIN padck pl USING (probe_id, vec_id)
           LEFT JOIN radck rs USING (probe_id, vec_id)
"""


@q("pq_structured_recall_eval", ("F10", "W3", "A1"),
   oracle=_structured_oracle())
def pq_structured_recall_eval(spark: "SparkSession",
                              sf_dir: str) -> "DataFrame":
    """Structured-regime recall gate (VERDICT r9 #3): on the driver's
    iid-random vectors the residual eval reads 0.24 and cannot show
    the faiss-faithful benefit — structureless residuals have nothing
    for the codebooks to exploit.  This eval builds a DETERMINISTIC
    mixture-of-{sc} fixture from the existing quantized-embedding
    pipeline (centers = the first {sc} corpus vectors with their
    milli-units amplified ×{sa}; each vector's own quantized dims,
    scaled down ÷{sn}, act as its noise term — pure integer
    arithmetic, so Spark and DuckDB construct bit-identical fixtures
    from the same parquet, no RNG anywhere) and measures recall@5 of
    plain-coded ADC vs residual-coded ADC over the SAME full-corpus
    scan with routing held perfect (cell = vec_id % {sc}; the first
    {sc} fixture vectors land one per cell, so the coarse layer is
    exact by construction and the measured gap is CODING quality
    alone).

    This is the regime where residual coding wins: plain PQ's {k_}
    codewords per block must cover {sc} well-separated amplified
    centers PLUS noise, while the residual trainer sees only the
    small-variance noise (vector − cell centroid cancels the center
    term exactly).  The iid-floor twins (``pq_adc_recall_eval``,
    ``ivfpq_residual_recall_eval``) stay as the honest lower bound;
    SCALE.md records both regimes.  Output: one row with both recalls
    and the structured-regime gap in ppm."""
    emb = load(spark, sf_dir, "embeddings")
    pts = (emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>"))
         .alias("pos", "x"))
        .select("vec_id", (F.col("pos") + 1).alias("d"),
                (F.round(F.col("x") * 1000, 0).cast("bigint")
                 + F.lit(_SHIFT)).alias("qv")))
    ctr = (pts.filter(F.col("vec_id") < _SC)
           .select(F.col("vec_id").alias("cluster"), "d",
                   ((F.col("qv") - _SHIFT) * _SA).alias("cterm")))
    cl = (pts.withColumn("cluster", F.col("vec_id") % _SC)
          .join(F.broadcast(ctr), ["cluster", "d"])
          .select("vec_id", "d",
                  (F.col("cterm") + F.expr(f"qv div {_SN}")
                   + F.lit(_SHIFT)).alias("qv"),
                  F.expr(f"(d - 1) div {_PQ_BDIMS}").alias("blk"))
          .cache())
    rbp = (pts.select("vec_id", "d",
                      (F.expr(f"qv div {_SN}") + F.lit(_SHIFT))
                      .alias("qv"),
                      F.expr(f"(d - 1) div {_PQ_BDIMS}").alias("blk"))
           .cache())
    pcent, pa2, _ = _pq_train(spark, cl)
    rcent, ra2, _ = _pq_train(spark, rbp)

    ppd = (cl.filter(F.col("vec_id") < 10)
           .select(F.col("vec_id").alias("probe_id"), "d",
                   F.col("qv").alias("pv")))
    pdiff = F.col("pv") - F.col("cv")
    pdt = (pcent.join(F.broadcast(ppd), "d")
           .groupBy("probe_id", "blk", "cid")
           .agg(F.sum(pdiff * pdiff).alias("dt2")))
    wk = W.partitionBy("probe_id").orderBy("adc2", "vec_id")
    padck = (pa2.join(F.broadcast(pdt), ["blk", "cid"])
             .filter(F.col("vec_id") != F.col("probe_id"))
             .groupBy("probe_id", "vec_id")
             .agg(F.sum("dt2").cast("bigint").alias("adc2"))
             .withColumn("r", F.row_number().over(wk))
             .filter(F.col("r") <= 5)
             .select("probe_id", "vec_id", F.lit(1).alias("_pl")))
    rdiff = F.col("pv") - F.col("cterm") - F.col("cv")
    rdt = (ppd.join(F.broadcast(ctr), "d")
           .join(F.broadcast(rcent), "d")
           .groupBy("probe_id", "cluster", "blk", "cid")
           .agg(F.sum(rdiff * rdiff).alias("dt2")))
    radck = (ra2.withColumn("cluster", F.col("vec_id") % _SC)
             .join(F.broadcast(rdt), ["cluster", "blk", "cid"])
             .filter(F.col("vec_id") != F.col("probe_id"))
             .groupBy("probe_id", "vec_id")
             .agg(F.sum("dt2").cast("bigint").alias("adc2"))
             .withColumn("r", F.row_number().over(wk))
             .filter(F.col("r") <= 5)
             .select("probe_id", "vec_id", F.lit(1).alias("_rs")))
    ed = F.col("qv") - F.col("pv")
    wke = W.partitionBy("probe_id").orderBy("d2", "vec_id")
    exk = (cl.join(F.broadcast(ppd), "d")
           .filter(F.col("vec_id") != F.col("probe_id"))
           .groupBy("probe_id", "vec_id")
           .agg(F.sum(ed * ed).alias("d2"))
           .withColumn("r", F.row_number().over(wke))
           .filter(F.col("r") <= 5)
           .select("probe_id", "vec_id"))
    return (exk.join(padck, ["probe_id", "vec_id"], "left")
            .join(radck, ["probe_id", "vec_id"], "left")
            .agg(F.count(F.lit(1)).cast("int").alias("k"),
                 F.count("_pl").cast("int").alias("hits_plain"),
                 F.count("_rs").cast("int").alias("hits_residual"))
            .selectExpr(
                "k", "hits_plain", "hits_residual",
                "CAST((hits_plain * 1000000) div k AS BIGINT)"
                " AS plain_recall_ppm",
                "CAST((hits_residual * 1000000) div k AS BIGINT)"
                " AS residual_recall_ppm",
                "CAST((hits_residual * 1000000) div k AS BIGINT)"
                " - CAST((hits_plain * 1000000) div k AS BIGINT)"
                " AS gap_ppm"))


pq_structured_recall_eval.__doc__ = \
    pq_structured_recall_eval.__doc__.format(
        sc=_SC, sa=_SA, sn=_SN, k_=_PQ_K)


pq_adc_recall_eval.__doc__ = pq_adc_recall_eval.__doc__.format(
    blocks=_PQ_BLOCKS, topk=_PQ_TOPK, k_=_PQ_K)
similarity_topk_ivfpq.__doc__ = similarity_topk_ivfpq.__doc__.format(
    blocks=_PQ_BLOCKS)


# =========================================================================
# Hard-negative mining ([EXT] — contrastive-training data op)
# =========================================================================

from .queries_ext import _O_COS, _O_EMB  # noqa: E402
from .operators.similarity import brute_force_topk  # noqa: E402


@q("hard_negative_mining", ("F10", "W3", "J5"), oracle=f"""
WITH emb AS (SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS vec,
                    e.label
             FROM embeddings e),
probes AS (SELECT * FROM emb WHERE vec_id < 10),
scored AS (
  SELECT b.vec_id AS probe_id, b.label AS probe_label,
         a.vec_id AS vec_id, a.label AS neg_label, {_O_COS} AS score_u
  FROM emb a, probes b
  WHERE a.vec_id <> b.vec_id AND a.label <> b.label
)
SELECT probe_id, probe_label, vec_id, neg_label, score_u,
       rank::INT AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY probe_id ORDER BY score_u DESC, vec_id) AS rank
  FROM scored
) WHERE rank <= 5
""")
def hard_negative_mining(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Hard negatives for contrastive training: for each probe, the
    top-5 most-similar vectors with a DIFFERENT label — the pairs
    that actually move a contrastive loss (random negatives are
    trivially separable; hard ones define the margin).

    Scale design: identical to the similarity-search family — probes
    broadcast, corpus never shuffles, per-partition partial top-k —
    with the label-mismatch predicate fused INTO the scoring pass, so
    no candidate materializes just to be discarded.  The production
    escalation replaces the exact scan with the IVF/LSH candidate
    route (same operators), mining negatives per cell; labels ride
    the index as a payload column either way.
    """
    e = load(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") < 10).select(
        "vec_id", "embedding", F.col("label").alias("probe_label"))
    corpus = e.select("vec_id", "embedding",
                      F.col("label").alias("neg_label"))
    return brute_force_topk(
        corpus, probes, k=5,
        corpus_payload=("neg_label",), probe_payload=("probe_label",),
        pair_filter=F.col("neg_label") != F.col("probe_label")) \
        .select("probe_id", "probe_label", "vec_id", "neg_label",
                "score_u", "rank")


@q("label_balance_resample", ("A1", "W1", "W3"), oracle="""
WITH m AS (
  SELECT MIN(cnt) AS target FROM (
    SELECT COUNT(*) AS cnt FROM embeddings GROUP BY label)
)
SELECT vec_id, label FROM (
  SELECT vec_id, label,
         ROW_NUMBER() OVER (
             PARTITION BY label
             ORDER BY md5('bal:' || CAST(vec_id AS VARCHAR)), vec_id)
             AS rn
  FROM embeddings
) r CROSS JOIN m
WHERE r.rn <= m.target
""")
def label_balance_resample(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Class-balanced training subset: every label downsampled to the
    MINORITY class size by deterministic hash rank — the standard
    rebalancing step before training a classifier on skewed labels
    (its upsampling twin is epoch_upsample's fractional replication).

    Scale design: per-label rank over an md5 order is one shuffle on
    label (the WindowGroupLimit pushdown caps per-partition work at
    `target` rows once the limit is known); the target itself is a
    label-cardinality-sized aggregate broadcast back.  The md5 order —
    not rand() — makes the kept subset identical across engines,
    retries and backfills, so the training set is an auditable
    function of the data, the same doctrine as every sampler here.
    """
    e = load(spark, sf_dir, "embeddings")
    m = (e.groupBy("label").agg(F.count("*").alias("cnt"))
         .groupBy().agg(F.min("cnt").alias("target")))
    rn = F.row_number().over(
        W.partitionBy("label").orderBy(
            F.md5(F.concat(F.lit("bal:"), F.col("vec_id").cast("string"))),
            "vec_id"))
    return (e.select("vec_id", "label").withColumn("rn", rn)
            .join(F.broadcast(m))
            .filter(F.col("rn") <= F.col("target"))
            .select("vec_id", "label"))
