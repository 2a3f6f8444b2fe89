"""Similarity search over embedding columns ([EXT] J5/W3; north star
"similarity search" — BASELINE.json).

Two paths, mirroring the standard ANN architecture:

- :func:`brute_force_topk` — exact cosine top-k: broadcast the probe
  set, score every (probe, candidate) pair with the JVM-side fold from
  functions.vector, rank per probe.  Cost = |probes| × |corpus| scored
  rows but zero corpus shuffle (probes broadcast) and a partial top-K
  per partition (WindowGroupLimit) before the rank shuffle — the right
  baseline and the verifier for approximate paths.

- :func:`lsh_bucket_topk` — sign-LSH bucketed ANN: both sides get a
  compact bucket id from the signs of ``n_planes`` leading dimensions
  (axis-aligned hyperplanes — deterministic, engine-portable), the join
  becomes bucket-equi + probe broadcast, and only same-bucket pairs are
  scored: ~corpus/2^n_planes candidates per probe.  Recall < 1 by
  design; raise recall with multi-probe (flip one sign bit) or more
  planes for narrower buckets.  An IVF variant would k-means the
  corpus; sign-LSH needs no trained state, which keeps the operator a
  pure column expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.vector import cosine_micro_named


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    w = W.partitionBy("probe_id").orderBy(
        F.col("score_u").desc(), F.col("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def brute_force_topk(corpus: DataFrame, probes: DataFrame, k: int = 5, *,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     probe_id_col: str | None = None,
                     probe_vec_col: str | None = None,
                     corpus_payload: tuple[str, ...] = (),
                     probe_payload: tuple[str, ...] = (),
                     pair_filter=None,
                     exclude_self: bool = True) -> DataFrame:
    """Exact top-k cosine neighbours for each probe row.

    Output: (probe_id, [probe_payload...], vec_id, [corpus_payload...],
    score, rank), rank 1..k, ties broken by vec_id so results are
    deterministic.  ``corpus_payload``/``probe_payload`` name extra
    columns carried through scoring; ``pair_filter`` (a Column
    predicate over the scored relation) restricts candidate pairs
    BEFORE ranking — e.g. label mismatch for hard-negative mining —
    fused into the scan, so rejected pairs never rank.

    ``exclude_self`` (default True) drops pairs with probe_id ==
    vec_id — correct when probes are drawn FROM the corpus (every
    in-repo caller).  Pass False when probes and corpus are DISTINCT
    tables that merely share an id space, or an unrelated corpus row
    whose id collides with a probe id would silently vanish from its
    top-k.
    """
    # Norms are precomputed per side (N + P folds) so the pair loop
    # runs ONE interpreted array fold (the dot product) instead of
    # three — the dot fold itself stays a sequential sum, bit-identical
    # to the naive form, so the floor-micro score matches the oracle
    # (scores are integer micro-units, floor(cos*1e6) — see
    # functions.vector.cosine_micro; fractional ROUND was the
    # HALF_UP cross-engine hazard class).
    from ..functions.vector import (l2_norm_named,
                                scored_units_named)
    # Zero-norm guard: floor(NaN) is 0 on Spark (ranks mid-list) but a
    # CAST error on DuckDB — drop degenerate vectors before scoring so
    # both engines see only finite cosines (the oracles' _O_EMB
    # carries the matching WHERE, so the twins stay symmetric).
    p = probes.select(
        F.col(probe_id_col or id_col).alias("probe_id"),
        F.col(probe_vec_col or vec_col).alias("probe_vec"),
        l2_norm_named(probe_vec_col or vec_col).alias("probe_norm"),
        *[F.col(c) for c in probe_payload]).filter(F.col("probe_norm") > 0)
    # Deliberately NOT spread via hints.spread_if_under_split
    # (optimization r12, measured and rejected): the under-split corpus
    # scan does run the dot folds on one core at bench scale (~0.25 s
    # serial), but the repartition exchange + extra scheduling cost
    # exactly what the parallelism saves — interleaved A/B at sf0.1
    # AND ×10 read a wash (clean-steal passes 0.72–0.89 both variants,
    # both scales).  At real scale the scan is multi-split anyway.
    c = corpus.select(F.col(id_col).alias("vec_id"),
                      F.col(vec_col).alias("vec"),
                      l2_norm_named(vec_col).alias("norm"),
                      *[F.col(c) for c in corpus_payload]
                      ).filter(F.col("norm") > 0)
    scored = c.crossJoin(F.broadcast(p))
    if exclude_self:
        scored = scored.filter(F.col("probe_id") != F.col("vec_id"))
    scored = (scored
              .select("probe_id", *probe_payload, "vec_id",
                      *corpus_payload,
                      scored_units_named("probe_vec", "vec",
                                         "probe_norm", "norm")
                      .alias("score_u")))
    if pair_filter is not None:
        scored = scored.filter(pair_filter)
    return _rank_topk(scored, k)


def sign_bucket(vec: Column, n_planes: int = 4) -> Column:
    """LSH bucket id ∈ [0, 2^n_planes): sign bits of the first
    ``n_planes`` dimensions (axis-aligned random-hyperplane surrogate —
    deterministic and exactly reproducible in SQL)."""
    bucket = F.lit(0)
    for i in range(n_planes):
        bucket = bucket + F.when(vec[i] >= 0, F.lit(1 << i)).otherwise(0)
    return bucket


def ivf_assign(df: DataFrame, centroids: DataFrame, *,
               vec_col: str = "vec", cent_id_col: str = "cent_id",
               cent_vec_col: str = "cent_vec") -> DataFrame:
    """Assign every vector to its nearest centroid (IVF coarse
    quantizer).  Centroids are broadcast (there are k ≪ corpus of
    them); the argmin is a rank-1 window per vector id — at scale,
    swap the window for a ``groupBy(id).agg(min_by(...))`` which is a
    map-side-combining aggregate (used here)."""
    scored = (df.crossJoin(F.broadcast(centroids))
              .withColumn("_dist",
                          -cosine_micro_named(vec_col, cent_vec_col)))
    keep = [c for c in df.columns]
    # struct ordering = (distance, centroid id): deterministic argmin
    # even when two centroids tie in micro-unit distance
    return (scored.groupBy(*keep)
            .agg(F.min_by(F.col(cent_id_col),
                          F.struct(F.col("_dist"), F.col(cent_id_col)))
                 .alias("cluster")))


def ivf_topk(corpus: DataFrame, probes: DataFrame, k: int = 5, *,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_centroids: int = 8, n_probe: int = 1,
             exclude_self: bool = True) -> DataFrame:
    """IVF (inverted-file) ANN: corpus partitioned into centroid cells,
    each probe scored only against its ``n_probe`` nearest cells.

    The coarse quantizer here picks the first ``n_centroids`` corpus
    vectors as centroids — deterministic and engine-portable (a k-means
    refinement drops in without changing the operator shape; IVF recall
    depends far more on n_probe than on centroid quality).

    Scale: cells ≈ corpus/n_centroids; a probe batch touches
    n_probe/n_centroids of the corpus.  The cell assignment is
    reusable — at 100 TB you materialize it once (partitioned by
    ``cluster``) and every probe batch joins against it.
    """
    from ..functions.vector import (l2_norm_named,
                                scored_units_named)
    # zero-norm guard BEFORE seeding centroids too, so a degenerate
    # vector can neither seed a cell nor be scored (see exact_topk)
    corpus = corpus.filter(l2_norm_named(vec_col) > 0)
    cents = (corpus.orderBy(id_col).limit(n_centroids)
             .select(F.col(id_col).alias("cent_id"),
                     F.col(vec_col).alias("cent_vec")))
    c = ivf_assign(
        corpus.select(F.col(id_col).alias("vec_id"),
                      F.col(vec_col).alias("vec"),
                      l2_norm_named(vec_col).alias("norm")),
        cents, vec_col="vec")
    # multi-probe: each probe searches its n_probe nearest cells —
    # recall rises with n_probe at a linear cost in scored candidates
    # (n_probe/n_centroids of the corpus per probe)
    p = probes.select(F.col(id_col).alias("probe_id"),
                      F.col(vec_col).alias("probe_vec"),
                      l2_norm_named(vec_col).alias("probe_norm")
                      ).filter(F.col("probe_norm") > 0)
    p_scored = (p.crossJoin(F.broadcast(cents))
                .withColumn("_dist",
                            -cosine_micro_named("probe_vec", "cent_vec")))
    w = W.partitionBy("probe_id").orderBy("_dist", "cent_id")
    p_cells = (p_scored
               .withColumn("_r", F.row_number().over(w))
               .filter(F.col("_r") <= n_probe)
               .select("probe_id", "probe_vec", "probe_norm",
                       F.col("cent_id").alias("cluster")))
    # no dedup needed: every corpus vector lives in exactly one cell and
    # a probe's n_probe cells are distinct, so (probe_id, vec_id) pairs
    # are unique by construction
    scored = c.join(F.broadcast(p_cells), "cluster")
    if exclude_self:
        scored = scored.filter(F.col("probe_id") != F.col("vec_id"))
    scored = (scored
              .select("probe_id", "vec_id",
                      scored_units_named("probe_vec", "vec",
                                         "probe_norm", "norm")
                      .alias("score_u")))
    return _rank_topk(scored, k)


def embedding_neardup_pairs(df: DataFrame, *, id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            threshold_micro: int = 900_000,
                            n_planes: int = 4,
                            max_bucket: int | None = None) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the vector member of the
    dedup family): self-join within sign-LSH buckets, keep pairs with
    cosine ≥ threshold (id_a < id_b).  Cosines are integer micro-units
    (floor(cos·1e6), BIGINT) and the threshold is given in the same
    units — the repo-wide cross-engine determinism recipe.

    Bucketing keeps the pair space at Σ bucket² ≈ corpus²/2^n_planes —
    and for near-dup mining specifically, truly near-identical vectors
    agree on sign bits with high probability, so recall concentrates
    exactly where the operator is aimed.  Multi-probe (flipping one
    plane) trades compute for the residual recall if needed.

    ``max_bucket`` is the hot-bucket guard (the vector twin of
    minhash's ``max_band_bucket``, SCALE.md): a bucket with B members
    costs B² scored pairs, and a mass-duplicated corpus (the ×100
    replica: 100 byte-identical copies per vector) concentrates the
    duplicate mass into a few buckets whose pair explosion is
    unbounded.  Buckets past the cap are dropped here and their
    duplicate mass routed through exact dedup on md5(vector bytes) —
    identical vectors don't need cosine to be found.  More planes
    shrink buckets sub-quadratically; the cap is the hard bound.
    """
    from ..functions.vector import (l2_norm_named,
                                scored_units_named)
    v = (df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
         .withColumn("bucket", sign_bucket(F.col("vec"), n_planes))
         .withColumn("norm", l2_norm_named("vec"))
         .filter(F.col("norm") > 0))  # zero-norm guard (see exact_topk)
    if max_bucket is not None:
        counts = v.groupBy("bucket").agg(F.count(F.lit(1)).alias("_bn"))
        v = (v.join(counts, "bucket")
             .filter(F.col("_bn") <= max_bucket).drop("_bn"))
    a, b = v.alias("a"), v.alias("b")
    return (a.join(b, (F.col("a.bucket") == F.col("b.bucket")) &
                   (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id_a"),
                    F.col("b.id").alias("id_b"),
                    scored_units_named("a.vec", "b.vec",
                                       "a.norm", "b.norm")
                    .alias("cosine_u"))
            .filter(F.col("cosine_u") >= threshold_micro))


def lsh_bucket_topk(corpus: DataFrame, probes: DataFrame, k: int = 5, *,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    n_planes: int = 4,
                    exclude_self: bool = True) -> DataFrame:
    """Approximate top-k: score only same-sign-bucket pairs.

    At 100 TB the corpus partitions by bucket once (reusable across
    probe batches); each probe touches ~1/2^n_planes of the corpus.
    """
    from ..functions.vector import (l2_norm_named,
                                scored_units_named)
    c = (corpus.select(F.col(id_col).alias("vec_id"),
                       F.col(vec_col).alias("vec"))
         .withColumn("bucket", sign_bucket(F.col("vec"), n_planes))
         .withColumn("norm", l2_norm_named("vec"))
         .filter(F.col("norm") > 0))  # zero-norm guard (see exact_topk)
    p = (probes.select(F.col(id_col).alias("probe_id"),
                       F.col(vec_col).alias("probe_vec"))
         .withColumn("bucket", sign_bucket(F.col("probe_vec"), n_planes))
         .withColumn("probe_norm", l2_norm_named("probe_vec"))
         .filter(F.col("probe_norm") > 0))
    scored = c.join(F.broadcast(p), "bucket")
    if exclude_self:
        scored = scored.filter(F.col("probe_id") != F.col("vec_id"))
    scored = (scored
              .select("probe_id", "vec_id",
                      scored_units_named("probe_vec", "vec",
                                         "probe_norm", "norm")
                      .alias("score_u")))
    return _rank_topk(scored, k)
