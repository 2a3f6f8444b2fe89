"""Mergeable quantile sketch: deterministic bottom-k-by-hash sampling.

Fills the quantile slot in the sketch family next to HLL (distinct),
Count-Min (frequency), and KMV (set overlap): a per-group sketch that
estimates arbitrary quantiles AND merges upward through a rollup
hierarchy (hour→day→week) without re-reading raw data — the role
t-digest / KLL play in production stores ([EXT] beyond SURVEY §2 A8;
the reference's dbt rollups have no quantile path at all).

Why bottom-k-by-hash instead of t-digest/KLL: centroid/compactor
sketches are order-dependent — merging A∪B vs B∪A yields different
centroids, which can never hash-match a SQL oracle.  The bottom-k
sketch (keep the k rows whose md5(id) is smallest) is a uniform
random sample that forms a SEMILATTICE:

    bottom_k(bottom_k(A) ∪ bottom_k(B)) == bottom_k(A ∪ B)

— merge is associative, commutative, idempotent, and bit-identical
regardless of merge tree, so a DuckDB oracle replays it exactly
(tests/test_qsketch.py asserts the invariant on real data).  Quantile
estimates are order statistics of the sample: rank error is
O(sqrt(q(1-q)/k)) with high probability (Hoeffding on the empirical
CDF), e.g. k=64 → ~6 ranks-in-100 at the median; the gated
`quantile_sketch_error_eval` measures exactly that bound instead of
asserting it.

Scale design (100 TB): stage 1 shuffles once on the finest group key
and cuts each group to k rows via a partitioned window — the only
pass over raw data.  Every level above unions sketch rows (k × group
count, KB-sized) and re-cuts, so a full hour→day→week→month hierarchy
costs one fact shuffle plus trivially small merges, where exact
percentiles would re-shuffle the raw fact per level.  All JVM
builtins; the hash is 32 hex chars per row, never the payload.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Sequence

from pyspark.sql import Window as W
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import Column, DataFrame

#: hash-domain prefix — namespaces the sample from the repo's other
#: md5-keyed randomness (shuffles, salts) so sketch membership never
#: correlates with an unrelated sampled subset of the same ids
PREFIX = "qsk:"


def sketch_hash(id_col: "Column") -> "Column":
    """md5('qsk:' || id) — the deterministic sampling key.  Unique ids
    give distinct hashes, so bottom-k membership and every downstream
    order statistic are total-order stable (no tie-break drift between
    engines).  DuckDB twin: ``md5('qsk:' || CAST(id AS VARCHAR))``."""
    return F.md5(F.concat(F.lit(PREFIX), id_col.cast("string")))


def bottom_k(df: "DataFrame", keys: Sequence[str], k: int,
             hash_col: str = "h") -> "DataFrame":
    """Cut ``df`` to the ``k`` smallest-hash rows per ``keys`` group —
    both the sketch constructor (df = hashed raw rows) and the sketch
    merger (df = union of finer-level sketches; the semilattice law
    makes the two calls the same operation).  One shuffle on ``keys``;
    the rank window is per-group, never global."""
    if k <= 0:
        raise ValueError(f"bottom_k needs k >= 1, got {k}")
    w = W.partitionBy(*keys).orderBy(hash_col)
    return (df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k).drop("_rn"))


def sample_quantiles(sk: "DataFrame", keys: Sequence[str],
                     value_col: str, id_col: str,
                     pcts: Sequence[int]) -> "DataFrame":
    """Per-group type-1 (lower order-statistic) quantile estimates from
    sketch rows: position ``floor((m-1)·p/100) + 1`` of the sample
    sorted by (value, id).  Emits ``m`` (sample size) and one
    ``p{p}_est`` column per requested integer percentile.

    The position arithmetic stays in integers (``(a - a%b)/b`` floor
    division — operands are non-negative, where Spark ``%`` and DuckDB
    ``//`` agree) and the estimate is a PICKED raw value, not a
    computed one, so results hash-match the SQL oracle bit-for-bit.
    Runs over sketch rows only: group-count × k input, never raw data.
    """
    wv = W.partitionBy(*keys).orderBy(value_col, id_col)
    pos = (sk.withColumn("_vr", F.row_number().over(wv))
           .withColumn("_m", F.count(F.lit(1)).over(
               W.partitionBy(*keys))))
    aggs = [F.max("_m").alias("m")]
    for p in pcts:
        t = F.col("_m") - 1
        idx = ((t * p - (t * p) % 100) / 100).cast("long") + 1
        aggs.append(F.max(F.when(F.col("_vr") == idx,
                                 F.col(value_col))).alias(f"p{p}_est"))
    return pos.groupBy(*keys).agg(*aggs)
