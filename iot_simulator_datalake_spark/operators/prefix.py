"""Two-level (bucketed) global prefix aggregation — the scalable form
of ``SUM(x) OVER (ORDER BY ...)`` / ``ROW_NUMBER() OVER (ORDER BY ...)``.

An unpartitioned window funnels the whole relation through ONE task —
fine for calendar grids and quantized histograms, a scale killer for
anything dimension- or fact-proportional (parts, customers, vocabulary,
raw events).  Several analytics queries here need a global total order
(Pareto cumshare, Gini ranks, NTILE quantiles, Zipf ranks); their
docstrings have always promised "switches to the two-level prefix sum
at catalog sizes" — this operator IS that switch, and the queries now
use it unconditionally.

The classic two-pass construction (Blelloch scan, distributed):

1. ``repartitionByRange(buckets, *order)`` splits the relation into
   ``buckets`` contiguous ranges of the total order (Spark's range
   partitioner guarantees every row of bucket *p* precedes every row
   of bucket *p+1* under ``order``).
2. A bucket-partitioned window computes LOCAL ranks / running sums —
   each bucket is its own window partition (~N/buckets rows), so no
   single task ever sees the whole relation.
3. Per-bucket totals (≤ ``buckets`` rows — bounded by a config knob,
   not by data) come back to the driver, which folds them into
   per-bucket OFFSET literals (a ``CASE _pid WHEN...`` expression).
   global = local + offset-of-all-earlier-buckets.

The relation is ``localCheckpoint``-pinned between the two passes:
range-partitioner boundaries come from sampling whose seed varies per
RDD instantiation, so the totals job and the window job MUST read the
same materialized partitioning or bucket ids would disagree between
passes.  The checkpoint is the one materialization; its cost is the
slim (pre-projected) relation, paid once.

Determinism: the returned global rank / cumulative values are
partitioning-INVARIANT — rank(row) = |{rows ≤ row in the total
order}| no matter where bucket boundaries fall — so results hash-match
the naive single-partition window (and the DuckDB oracles) exactly,
provided ``order`` is a total order (callers pass a unique tiebreak
column, the same requirement the naive window already had).

Reference parity: the reference delegates windowed SQL to its
warehouse; this operator is part of the [EXT] scale surface (SURVEY
§2 W1/W3 escalation path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def _offset_expr(offsets: dict[int, int]) -> Column:
    """O(1) per-row offset lookup: ``element_at(array<literal>, _pid+1)``
    — an array literal indexed by bucket id, NOT a chained CASE (which
    would cost O(buckets) comparisons per row per column and risk the
    codegen 64KB-method fallback at the thousands-of-buckets sizing the
    operator documents for real clusters).  Bucket ids are dense
    [0, max_pid]; ids with no rows get offset 0 (nothing looks them up).
    """
    if not offsets:
        return F.lit(0).cast("long")
    arr = [offsets.get(p, 0) for p in range(max(offsets) + 1)]
    return F.element_at(F.array(*[F.lit(int(v)).cast("long") for v in arr]),
                        F.col("_pid") + 1)


def _auto_buckets(df: DataFrame) -> int:
    """Default bucket count = ``spark.sql.shuffle.partitions`` (floored
    at 32) — the same knob that sizes every other reducer stage, so the
    operator scales with the CLUSTER configuration, not with a size
    guess.  Catalyst size estimates are explicitly NOT used: a
    localCheckpoint input (chained ranged_prefix calls, e.g. RFM's
    three quintiles) reports the defaultSizeInBytes sentinel, and a
    groupBy output without CBO reports ~its child scan size — both
    wildly wrong in opposite directions.  Results are bucket-count-
    invariant; the count only tunes task sizing, and a caller with a
    known shape can always pass ``buckets=`` explicitly."""
    try:
        conf = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except Exception:
        conf = 32
    return max(32, conf)


def ranged_prefix(df: DataFrame, order: list, *,
                  sums: dict[str, str] | None = None,
                  rank_col: str | None = None,
                  buckets: int | None = None) -> tuple[DataFrame, dict]:
    """Global prefix aggregates over ``order`` without a
    single-partition window.

    ``order``: columns/Columns forming a TOTAL order (unique tiebreak).
    ``sums``: {out_col: src_col} running sums (``SUM(src) OVER (ORDER
    BY order ROWS UNBOUNDED PRECEDING)`` equivalents).  Source columns
    must be EXACT types (integral/decimal): the two-level sum adds in
    a different order than the naive window, which only bit-matches
    when addition is associative.
    ``rank_col``: name for the global ROW_NUMBER equivalent (long).
    ``buckets``: range-partition count — size so N/buckets rows fit a
    task.  Default (None) uses ``spark.sql.shuffle.partitions``
    (floored at 32), so the same call scales from the test SFs to a
    cluster tuned for its data volume without retuning here; results
    are bucket-count-INVARIANT either way.

    Returns ``(out_df, totals)`` where ``totals`` carries the grand
    totals {"n": N, out_col: Σsrc} so callers can inject global
    scalars (``COUNT(*) OVER ()``, ``SUM(x) OVER ()``) as literals
    instead of adding another global window.
    """
    if buckets is None:
        buckets = _auto_buckets(df)
    sums = dict(sums or {})
    d = (df.repartitionByRange(buckets, *order)
         .withColumn("_pid", F.spark_partition_id())
         .localCheckpoint(eager=True))
    skeys = list(dict.fromkeys(sums.values()))
    rows = sorted(
        d.groupBy("_pid").agg(
            F.count(F.lit(1)).alias("_n"),
            *[F.sum(src).alias(f"_t_{src}") for src in skeys],
            *[F.count(src).alias(f"_c_{src}") for src in skeys]).collect(),
        key=lambda r: r["_pid"])
    rank_off: dict[int, int] = {}
    sum_off: dict[str, dict[int, int]] = {s: {} for s in skeys}
    cnt_off: dict[str, dict[int, int]] = {s: {} for s in skeys}
    run_n = 0
    run_s = {s: 0 for s in skeys}
    run_c = {s: 0 for s in skeys}
    for r in rows:
        rank_off[r["_pid"]] = run_n
        run_n += r["_n"]
        for s in skeys:
            sum_off[s][r["_pid"]] = run_s[s]
            run_s[s] += (r[f"_t_{s}"] or 0)
            cnt_off[s][r["_pid"]] = run_c[s]
            run_c[s] += r[f"_c_{s}"]
    w = W.partitionBy("_pid").orderBy(*order)
    wcum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    out = d
    if rank_col is not None:
        out = out.withColumn(
            rank_col,
            (F.row_number().over(w).cast("long") +
             _offset_expr(rank_off)).cast("long"))
    for name, src in sums.items():
        # exact naive-window parity including NULLs: SUM(x) OVER (...)
        # is NULL iff the prefix holds NO non-null x, else the sum of
        # the non-nulls.  An un-guarded `NULL + offset` would instead
        # poison every row of a bucket whose local frame is all-NULL,
        # losing the prior buckets' running total (the docstring
        # promises hash-match with the naive window).
        seen = F.count(src).over(wcum) + _offset_expr(cnt_off[src])
        out = out.withColumn(
            name, F.when(seen == 0, F.lit(None))
                   .otherwise(F.coalesce(F.sum(src).over(wcum), F.lit(0)) +
                              _offset_expr(sum_off[src])))
    totals = {"n": run_n,
              **{name: run_s[src] for name, src in sums.items()}}
    return out.drop("_pid"), totals


def global_ntile(df: DataFrame, order: list, n_tiles: int,
                 out_col: str, *, buckets: int | None = None) -> DataFrame:
    """``NTILE(n) OVER (ORDER BY order)`` via :func:`ranged_prefix` —
    ANSI semantics reproduced from the global rank: with N rows and
    q, r = divmod(N, n_tiles), the first r tiles hold q+1 rows.  The
    tile boundary arithmetic runs on driver-side literals (N is known
    from the bucket totals), everything per-row stays JVM-side."""
    ranked, totals = ranged_prefix(df, order, rank_col="_grnk",
                                   buckets=buckets)
    n = totals["n"]
    q, r = divmod(n, n_tiles) if n else (0, 0)
    if q == 0:            # fewer rows than tiles: tile = rank
        tile = F.col("_grnk")
    else:
        head = r * (q + 1)   # rows covered by the q+1-sized tiles
        tile = F.when(
            F.col("_grnk") <= F.lit(head),
            F.expr(f"(_grnk - 1) div {q + 1}") + 1
        ).otherwise(
            F.expr(f"(_grnk - 1 - {head}) div {q}") + F.lit(r + 1))
    return ranked.withColumn(out_col, tile.cast("long")).drop("_grnk")
