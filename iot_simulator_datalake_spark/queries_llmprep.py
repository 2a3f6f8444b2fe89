"""Declared queries for LLM pre-training corpus preparation, layered on
the training-data surface of ``queries_training.py``: deterministic
corpus shuffle/sharding, GPT-style sequence packing (concatenate the
corpus, cut fixed-size token blocks), benchmark-contamination
detection (eval-set n-gram overlap), token-length quantile gating, and
int8 embedding quantization.

Everything here follows the repo's two standing policies:

* **Determinism** — nothing depends on row order, partitioning, or
  ``rand()``; order-sensitive steps (shuffle position, packing offset)
  are derived from md5 hashes or explicit sort keys, so the result is
  identical across engines, retries, and cluster layouts.  Floats only
  appear where float→double promotion keeps both engines bit-identical.
* **Oracle parity** — every query has a DuckDB twin built from the same
  constants, with identical output column names (the driver hashes by
  sorted column name).

Reference parity note: the reference (dbt/Databricks IoT lake) has no
LLM-prep surface; these are [EXT] operators mandated by the north star
(BASELINE.json: dedup / similarity / multimodal / text analysis for
training-data pipelines at 100 TB).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .functions.text import ngrams, tokens
from .queries import load, q
from .queries_ext import O_TOKENS

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession


# single source of the engine-portable hash recipe (the repo-wide
# rand() substitute) — a second copy here drifted-by-one-edit away
# from the oracles built from _o_hash_bucket below
from .operators.packing import hash_bucket as _hash_bucket  # noqa: E402


def _o_hash_bucket(col: str, seed: str, mod: int) -> str:
    return (f"(('0x' || substr(md5('{seed}:' || CAST({col} AS VARCHAR)),"
            f" 1, 15))::BIGINT % {mod})")


# =========================================================================
# Deterministic corpus shuffle + sharding ([EXT])
# =========================================================================

_SHUF = dict(seed="shuf42", shards=8)


@q("corpus_shard_shuffle", ("W2", "F9"), oracle=f"""
WITH h AS (
  SELECT doc_id,
         md5('{_SHUF["seed"]}:' || CAST(doc_id AS VARCHAR)) AS hk
  FROM documents
)
SELECT doc_id,
       CAST(('0x' || substr(hk, 1, 15))::BIGINT % {_SHUF["shards"]}
            AS INT) AS shard,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY ('0x' || substr(hk, 1, 15))::BIGINT % {_SHUF["shards"]}
         ORDER BY hk) AS INT) AS pos
FROM h
""")
def corpus_shard_shuffle(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """(doc_id, shard, pos): deterministic global shuffle of the corpus
    into {shards} shards with a stable within-shard order.

    Training pipelines must randomize document order (adjacent crawl
    pages are correlated) but reproducibly — so the "random" key is
    ``md5(seed:doc_id)``, not ``rand()``: re-runs, retries, and engine
    swaps give byte-identical shard files.

    Scale: the hash is map-side; the only shuffle is the per-shard
    ``row_number`` sort, which at 100 TB becomes
    ``repartitionByRange(shard, hk)`` + ``sortWithinPartitions`` —
    one range shuffle of slim (doc_id, hk) pairs, never the text.
    """
    d = load(spark, sf_dir, "documents")
    hk = F.md5(F.concat(F.lit(f"{_SHUF['seed']}:"),
                        F.col("doc_id").cast("string")))
    sh = (F.conv(F.substring(hk, 1, 15), 16, 10).cast("long")
          % _SHUF["shards"]).cast("int")
    return (d.select("doc_id", hk.alias("hk"), sh.alias("shard"))
            .withColumn("pos", F.row_number().over(
                W.partitionBy("shard").orderBy("hk")).cast("int"))
            .drop("hk"))


# =========================================================================
# Sequence packing: concatenate-and-chunk ([EXT])
# =========================================================================

_PACK = dict(block=64, shards=4, seed="pack7")


@q("seq_packing", ("F9", "W1"), oracle=f"""
WITH tok AS (
  SELECT doc_id, {O_TOKENS.format(c='text')} AS toks FROM documents
), sized AS (
  SELECT doc_id, toks, len(toks) AS n FROM tok WHERE len(toks) > 0
), sh AS (
  SELECT *, CAST({_o_hash_bucket('doc_id', _PACK["seed"], _PACK["shards"])}
                 AS INT) AS shard
  FROM sized
), pos AS (
  SELECT *, CAST(SUM(n) OVER (PARTITION BY shard ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS e
  FROM sh
), spans AS (
  SELECT doc_id, shard, toks, e - n AS s, e,
         unnest(generate_series((e - n) // {_PACK["block"]},
                                (e - 1) // {_PACK["block"]})) AS blk
  FROM pos
)
SELECT shard, blk AS seq_id, doc_id,
       CAST(GREATEST(blk * {_PACK["block"]}, s) - s AS INT) AS tok_off,
       array_to_string(
         toks[GREATEST(blk * {_PACK["block"]}, s) - s + 1 :
              LEAST((blk + 1) * {_PACK["block"]}, e) - s], ' ') AS piece
FROM spans
""")
def seq_packing(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """GPT-style sequence packing: concatenate every document's tokens
    (within a deterministic shard, in doc_id order) and cut the stream
    into fixed {block}-token training sequences; docs spanning a block
    boundary are split across sequences.

    Output: (shard, seq_id, doc_id, tok_off, piece) — each row is the
    contiguous piece of one document that lands in one training
    sequence; ``tok_off`` is the piece's offset inside the document.
    Every sequence except the last of each shard has exactly {block}
    tokens, and no token is dropped or duplicated (asserted in
    tests/test_llmprep.py).

    Scale design: a single global concatenation would serialize on one
    cumulative sum, so the corpus is first hash-sharded ({shards} here,
    thousands at 100 TB) and packed per shard — the window sum is
    per-shard and the shards are embarrassingly parallel.  The explode
    emits block *indices*, never replicated token arrays, so the row
    blow-up is ~n/block and the token text is sliced exactly once.
    """
    from .operators.packing import pack_sequences
    d = load(spark, sf_dir, "documents")
    return pack_sequences(
        d.select("doc_id", tokens(F.col("text")).alias("toks")),
        block=_PACK["block"], shards=_PACK["shards"], seed=_PACK["seed"])


# =========================================================================
# Benchmark-contamination detection ([EXT])
# =========================================================================

_CONTAM = dict(ngram=5, seed="", eval_lo=90, train_hi=80)
# buckets reuse dataset_split's md5(doc_id) % 100: test split = [90, 100)


@q("contamination_ngram", ("J5", "F9"), oracle=f"""
WITH b AS (
  SELECT doc_id, text,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
           % 100 AS bkt
  FROM documents
), tok AS (
  SELECT doc_id, bkt, {O_TOKENS.format(c='text')} AS toks FROM b
), sh AS (
  SELECT doc_id, bkt,
         unnest(list_distinct(CASE WHEN len(toks) <= {_CONTAM["ngram"]}
           THEN [array_to_string(toks, ' ')]
           ELSE [array_to_string(toks[i:i+{_CONTAM["ngram"] - 1}], ' ')
                 for i in generate_series(1,
                                          len(toks) - {_CONTAM["ngram"] - 1})]
         END)) AS g
  FROM tok
)
SELECT t.doc_id AS train_doc_id, e.doc_id AS eval_doc_id,
       COUNT(*) AS n_shared
FROM (SELECT doc_id, md5(g) AS gh FROM sh
      WHERE bkt < {_CONTAM["train_hi"]}) t
JOIN (SELECT doc_id, md5(g) AS gh FROM sh
      WHERE bkt >= {_CONTAM["eval_lo"]}) e
  ON t.gh = e.gh
GROUP BY 1, 2
""")
def contamination_ngram(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """(train_doc_id, eval_doc_id, n_shared): training documents that
    share {ngram}-gram shingles with held-out eval documents — the
    standard benchmark-contamination / test-set-leakage check run
    before training.  Splits reuse dataset_split's md5 buckets (train
    < 80, eval ≥ 90), so the check composes with the split it guards.

    Scale design: shingles are hashed to 16-byte md5 keys BEFORE the
    join, so the shuffle moves (doc_id, 16B) pairs, never text.  The
    eval side is a tiny fraction of the corpus (≤10% of docs, and in
    practice a fixed benchmark suite) → Spark broadcasts it and the
    100 TB train side never shuffles.  Per-doc ``list_distinct``
    bounds the pair count by distinct-shingle overlap, immune to
    within-doc repetition.
    """
    n = _CONTAM["ngram"]
    d = load(spark, sf_dir, "documents")
    bkt = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15),
                 16, 10).cast("long") % 100
    sh = (d.select("doc_id", bkt.alias("bkt"),
                   tokens(F.col("text")).alias("toks"))
          .select("doc_id", "bkt",
                  F.explode(ngrams(F.col("toks"), n)).alias("g"))
          .select("doc_id", "bkt", F.md5("g").alias("gh")))
    train = (sh.where(F.col("bkt") < _CONTAM["train_hi"])
             .select(F.col("doc_id").alias("train_doc_id"), "gh"))
    ev = (sh.where(F.col("bkt") >= _CONTAM["eval_lo"])
          .select(F.col("doc_id").alias("eval_doc_id"), "gh"))
    return (train.join(F.broadcast(ev), "gh")
            .groupBy("train_doc_id", "eval_doc_id")
            .agg(F.count("*").alias("n_shared")))


# =========================================================================
# Token-length quantile gate ([EXT])
# =========================================================================

_QGATE = dict(lo_pct=5, hi_pct=95)  # integer percents — exact rational


@q("length_quantile_filter", ("P6", "A8"), oracle=f"""
WITH n AS (
  SELECT doc_id, len({O_TOKENS.format(c='text')}) AS n_toks FROM documents
), c AS (
  SELECT COUNT(*) AS cnt FROM n
), vc AS (
  SELECT n_toks, COUNT(*) AS ct FROM n GROUP BY 1
), cum AS (
  SELECT n_toks,
         SUM(ct) OVER (ORDER BY n_toks) - ct AS lo_rk,
         SUM(ct) OVER (ORDER BY n_toks) - 1 AS hi_rk
  FROM vc
), pos AS (
  SELECT ((cnt - 1) * {_QGATE["lo_pct"]}) // 100 AS k_lo,
         ((cnt - 1) * {_QGATE["lo_pct"]}) % 100 AS r_lo,
         ((cnt - 1) * {_QGATE["hi_pct"]}) // 100 AS k_hi,
         ((cnt - 1) * {_QGATE["hi_pct"]}) % 100 AS r_hi
  FROM c
), comp AS (
  SELECT
    MAX(CASE WHEN lo_rk <= k_lo AND k_lo <= hi_rk
             THEN n_toks END) AS a_lo,
    MAX(CASE WHEN lo_rk <= k_lo + 1 AND k_lo + 1 <= hi_rk
             THEN n_toks END) AS b_lo,
    MAX(CASE WHEN lo_rk <= k_hi AND k_hi <= hi_rk
             THEN n_toks END) AS a_hi,
    MAX(CASE WHEN lo_rk <= k_hi + 1 AND k_hi + 1 <= hi_rk
             THEN n_toks END) AS b_hi,
    MAX(r_lo) AS r_lo, MAX(r_hi) AS r_hi
  FROM cum, pos
), b AS (
  SELECT 100 * a_lo + CASE WHEN r_lo = 0 THEN 0
                           ELSE r_lo * (b_lo - a_lo) END AS lo_s,
         100 * a_hi + CASE WHEN r_hi = 0 THEN 0
                           ELSE r_hi * (b_hi - a_hi) END AS hi_s
  FROM comp
)
SELECT doc_id, CAST(n_toks AS INT) AS n_toks
FROM n, b
WHERE 100 * n_toks >= b.lo_s AND 100 * n_toks <= b.hi_s
""")
def length_quantile_filter(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Docs whose token count lies within the corpus's [p05, p95] —
    the distribution-relative length gate (absolute thresholds from
    text_quality_score don't transfer across corpora; quantiles do).

    Determinism: the interpolated percentile of INTEGER token counts
    at an INTEGER percent p is an exact rational — with idx·100 =
    (N-1)·p = 100·k + r, quantile·100 = 100·a + r·(b-a) where a, b
    are the order statistics at 0-based ranks k, k+1 — so the gate
    compares 100·n_toks against integer bounds with no float anywhere
    (the old path ROUNDed the engines' float (1-g)·a + g·b
    interpolations to 6 dp — the repo's HALF_UP cross-engine hazard
    class).  Order statistics come from cumulative counts over the
    DISTINCT-value histogram (bounded by max document length), not a
    corpus-wide sort; when r>0, rank k+1 always exists (k < N-1).

    Shape: histogram aggregate → tiny unpartitioned cumsum window
    over distinct lengths → 1-row bounds cross-joined back as a
    broadcast, then a map-side filter.  At 100 TB the histogram is
    one map-side-combining shuffle on n_toks and the window stays
    tiny; the same plan degrades gracefully to ``approx_percentile``
    if lengths were unbounded.
    """
    d = load(spark, sf_dir, "documents")
    nt = d.select("doc_id", F.size(tokens(F.col("text"))).alias("n_toks"))
    cnt = nt.agg(F.count(F.lit(1)).alias("cnt"))
    vc = nt.groupBy("n_toks").agg(F.count(F.lit(1)).alias("ct"))
    wcum = W.orderBy("n_toks").rowsBetween(W.unboundedPreceding,
                                           W.currentRow)
    cum = vc.select("n_toks",
                    (F.sum("ct").over(wcum) - F.col("ct")).alias("lo_rk"),
                    (F.sum("ct").over(wcum) - 1).alias("hi_rk"))
    lo_p, hi_p = _QGATE["lo_pct"], _QGATE["hi_pct"]
    ranks = cum.crossJoin(F.broadcast(cnt)).select(
        "n_toks", "lo_rk", "hi_rk",
        F.expr(f"((cnt - 1) * {lo_p}) div 100").alias("k_lo"),
        F.expr(f"((cnt - 1) * {lo_p}) % 100").alias("r_lo"),
        F.expr(f"((cnt - 1) * {hi_p}) div 100").alias("k_hi"),
        F.expr(f"((cnt - 1) * {hi_p}) % 100").alias("r_hi"))

    def _at(rank_col: str, off: int = 0):
        rk = F.col(rank_col) + off
        return F.max(F.when((F.col("lo_rk") <= rk)
                            & (rk <= F.col("hi_rk")), F.col("n_toks")))

    comp = ranks.agg(_at("k_lo").alias("a_lo"), _at("k_lo", 1).alias("b_lo"),
                     _at("k_hi").alias("a_hi"), _at("k_hi", 1).alias("b_hi"),
                     F.max("r_lo").alias("r_lo"), F.max("r_hi").alias("r_hi"))
    bounds = comp.select(
        (100 * F.col("a_lo")
         + F.when(F.col("r_lo") == 0, F.lit(0))
            .otherwise(F.col("r_lo") * (F.col("b_lo") - F.col("a_lo"))))
        .alias("lo_s"),
        (100 * F.col("a_hi")
         + F.when(F.col("r_hi") == 0, F.lit(0))
            .otherwise(F.col("r_hi") * (F.col("b_hi") - F.col("a_hi"))))
        .alias("hi_s"))
    return (nt.crossJoin(F.broadcast(bounds))
            .where((100 * F.col("n_toks") >= F.col("lo_s"))
                   & (100 * F.col("n_toks") <= F.col("hi_s")))
            .select("doc_id", F.col("n_toks").cast("int").alias("n_toks")))


# =========================================================================
# int8 embedding quantization ([EXT] F10)
# =========================================================================

@q("embedding_quantize_int8", ("F10",), oracle="""
WITH v AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd
  FROM embeddings
), m AS (
  SELECT vec_id, vd,
         list_max(list_transform(vd, x -> abs(x))) AS mx
  FROM v
)
SELECT vec_id,
       mx / 127.0 AS scale,
       array_to_string(
         list_transform(vd, x -> CAST(CAST(FLOOR(
           x / (CASE WHEN mx = 0 THEN 1.0 ELSE mx / 127.0 END) + 0.5)
           AS INT) AS VARCHAR)), ',') AS qvec
FROM m
""")
def embedding_quantize_int8(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """(vec_id, scale, qvec): symmetric per-vector int8 quantization —
    scale = max|x|/127, q_i = round(x_i/scale) ∈ [-127, 127] — the
    standard 4× shrink applied to embedding stores before ANN serving.

    Determinism: floats promote to double exactly, max/divide are
    single IEEE ops (bit-identical across engines), and rounding is
    the explicit ``floor(x + 0.5)`` so no engine-specific half-even /
    half-away behavior leaks in.  Zero vectors quantize to zeros via a
    guarded scale (emitted scale stays 0).  qvec is emitted as a CSV
    string because the driver's value hash is defined over scalars.

    Map-only: no shuffle, pipelines into the scan at any corpus size.
    """
    e = load(spark, sf_dir, "embeddings")
    vd = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    mx = F.array_max(F.transform(vd, F.abs))
    safe = F.when(mx == 0, F.lit(1.0)).otherwise(mx / 127.0)
    qv = F.transform(vd, lambda x: F.floor(x / safe + 0.5).cast("int"))
    return e.select(
        "vec_id", (mx / 127.0).alias("scale"),
        F.array_join(F.transform(qv, lambda x: x.cast("string")),
                     ",").alias("qvec"))


# =========================================================================
# One-pass column profiling ([EXT] — data-quality reconnaissance)
# =========================================================================

_PROFILE_COLS = ("doc_id", "text", "lang", "source", "n_chars")


def _profile_oracle() -> str:
    parts = []
    for c in _PROFILE_COLS:
        parts.append(f"""
SELECT '{c}' AS col_name,
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_nulls,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       MIN(CAST({c} AS VARCHAR)) AS min_val,
       MAX(CAST({c} AS VARCHAR)) AS max_val
FROM documents""")
    return "\nUNION ALL\n".join(parts)


@q("dataset_profile", ("A5", "A8"), oracle=_profile_oracle())
def dataset_profile(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Per-column profile of the documents table — null count, distinct
    count, lexicographic min/max — the reconnaissance pass run before
    any pipeline touches a new corpus (⇔ ``DataFrame.summary`` /
    dbt-style source freshness+volume checks, but deterministic and
    oracle-checked).

    Shape: ONE scan computes every column's aggregates in a single
    multi-distinct hash aggregate (Catalyst plans the distincts via one
    Expand), then a ``stack`` unpivots the 1-row result to long form —
    driver-side work is O(columns).  At 100 TB swap the exact distincts
    for ``approx_count_distinct`` (HLL) and the profile becomes one
    map-side-combining pass with no Expand; min/max/null-count are
    already mergeable partials.
    """
    d = load(spark, sf_dir, "documents")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(F.col(c).cast("string")).alias(f"{c}__min"),
            F.max(F.col(c).cast("string")).alias(f"{c}__max"),
        ]
    one = d.agg(*aggs)
    stack = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max"
        for c in _PROFILE_COLS)
    return one.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack}) AS "
        f"(col_name, n_nulls, n_distinct, min_val, max_val)")


# =========================================================================
# Boilerplate chunk removal (C4/RefinedWeb-style corpus cleaning)
# =========================================================================

_BP = dict(chunk=8, max_df=2)   # 8-token chunks; df > 2 docs ⇒ boilerplate


@q("boilerplate_chunk_removal", ("F9", "W2", "A1"), oracle=f"""
WITH tok AS (
  SELECT doc_id, {O_TOKENS.format(c='text')} AS t FROM documents
), chunks AS (
  SELECT doc_id, i AS pos,
         array_to_string(t[(i-1)*{_BP['chunk']}+1:(i-1)*{_BP['chunk']}+{_BP['chunk']}], ' ') AS chunk
  FROM tok, LATERAL (SELECT unnest(generate_series(
       1, CAST(ceil(len(t)/{_BP['chunk']}.0) AS INT))) AS i) g
), df AS (
  SELECT chunk, COUNT(DISTINCT doc_id) AS df FROM chunks GROUP BY chunk
), kept AS (
  SELECT c.doc_id, c.pos, c.chunk,
         (df.df <= {_BP['max_df']}) AS keep
  FROM chunks c JOIN df ON c.chunk = df.chunk
)
SELECT doc_id,
       COUNT(*) AS n_chunks,
       CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_removed,
       md5(string_agg(CASE WHEN keep THEN chunk END, ' ' ORDER BY pos))
         AS clean_md5
FROM kept GROUP BY doc_id
""")
def boilerplate_chunk_removal(spark: "SparkSession",
                              sf_dir: str) -> "DataFrame":
    """C4/RefinedWeb-style boilerplate removal: cut each document into
    fixed {chunk}-token chunks, drop every chunk whose exact content
    appears in more than {max_df} distinct documents (navigation bars,
    cookie banners, licence footers — here, the planted near-dup
    blocks), and report per-doc what survived (clean_md5 = md5 of the
    kept chunks rejoined in original order, proving the reassembly is
    byte-identical across engines).

    Scale shape: chunks explode to (doc, pos, chunk) rows once; the
    document-frequency aggregate shuffles md5-sized chunk keys with
    map-side combine; the df table joins back on the same key (one
    shuffle reuse under AQE); reassembly is a per-doc sort-agg.
    Nothing is quadratic and no token array rides a shuffle wider than
    the chunk relation itself.  At 100 TB the df relation is
    vocab-of-chunks-sized — far smaller than the corpus — and the
    df > threshold subset (the only part that must be dense) is
    smaller still.
    """
    k = _BP["chunk"]
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", tokens(F.col("text")).alias("t"))
    n_chunks = F.ceil(F.size("t") / F.lit(float(k))).cast("int")
    # n_chunks > 0 guard: Spark's sequence(1, 0) is the DESCENDING
    # [1, 0] — a zero-token doc would emit two phantom empty chunks
    # (and poison the df table with '') where DuckDB's
    # generate_series(1, 0) emits none; empty docs are simply absent,
    # matching the oracle and every other chunker in the repo.
    chunks = (toks
              .filter(n_chunks > 0)
              .select("doc_id",
                      F.posexplode(F.transform(
                          F.sequence(F.lit(1), n_chunks),
                          lambda i: F.concat_ws(
                              " ", F.slice("t", (i - 1) * k + 1, k))))
                      .alias("pos0", "chunk"))
              .select("doc_id", (F.col("pos0") + 1).alias("pos"), "chunk"))
    df_ = chunks.groupBy("chunk").agg(
        F.count_distinct("doc_id").alias("df"))
    kept = (chunks.join(df_, "chunk")
            .select("doc_id", "pos", "chunk",
                    (F.col("df") <= _BP["max_df"]).alias("keep")))
    agged = (kept.groupBy("doc_id")
             .agg(F.count(F.lit(1)).alias("n_chunks"),
                  F.sum((~F.col("keep")).cast("long")).alias("n_removed"),
                  F.md5(F.concat_ws(" ", F.array_compact(F.transform(
                      F.array_sort(F.collect_list(F.struct("pos", "keep",
                                                           "chunk"))),
                      lambda s: F.when(s["keep"], s["chunk"])))))
                  .alias("_md5")))
    # all-chunks-removed docs get NULL, not md5('') — DuckDB's
    # string_agg over an all-NULL input is NULL (md5(NULL) = NULL),
    # and a fake empty-content hash would alias genuinely-empty docs
    return agged.select(
        "doc_id", "n_chunks", "n_removed",
        F.when(F.col("n_removed") < F.col("n_chunks"), F.col("_md5"))
         .alias("clean_md5"))


# =========================================================================
# DSIR-style importance weights (hashed-feature log-likelihood ratio)
# =========================================================================

#: target = docs from this source; features = md5 buckets of tokens
_DSIR = dict(target_source="src0", buckets=1024, scale=1000)


@q("dsir_importance_weights", ("F9", "A1", "J1"), oracle=f"""
WITH tok AS (
  SELECT doc_id, source, unnest({O_TOKENS.format(c='text')}) AS w
  FROM documents
), feat AS (
  SELECT doc_id, source,
         ('0x' || substr(md5('dsir:' || w), 1, 15))::BIGINT % {_DSIR['buckets']} AS f
  FROM tok
), tcnt AS (
  SELECT f, COUNT(*) AS ct FROM feat
  WHERE source = '{_DSIR['target_source']}' GROUP BY f
), rcnt AS (
  SELECT f, COUNT(*) AS cr FROM feat
  WHERE source <> '{_DSIR['target_source']}' GROUP BY f
), tot AS (
  SELECT (SELECT COUNT(*) FROM feat
          WHERE source = '{_DSIR['target_source']}') AS t_tot,
         (SELECT COUNT(*) FROM feat
          WHERE source <> '{_DSIR['target_source']}') AS r_tot
), term AS (
  SELECT f.doc_id,
         CAST(ROUND({_DSIR['scale']} * ln(
           (CAST(COALESCE(t.ct, 0) + 1 AS DOUBLE)
              * (tot.r_tot + {_DSIR['buckets']}))
           / ((CAST(COALESCE(r.cr, 0) + 1 AS DOUBLE))
              * (tot.t_tot + {_DSIR['buckets']})))) AS BIGINT) AS m
  FROM feat f
  LEFT JOIN tcnt t ON f.f = t.f
  LEFT JOIN rcnt r ON f.f = r.f
  CROSS JOIN tot
)
SELECT doc_id, CAST(SUM(m) AS BIGINT) AS weight_milli_nats,
       COUNT(*) AS n_tokens
FROM term GROUP BY doc_id
""")
def dsir_importance_weights(spark: "SparkSession",
                            sf_dir: str) -> "DataFrame":
    """DSIR-style data-selection importance weights (Xie et al. 2023,
    public method): score every document by the log-likelihood ratio of
    its hashed-unigram features under a target distribution (docs from
    {target_source}) vs the raw distribution (everything else), with
    Laplace smoothing over {buckets} md5 feature buckets.  High-weight
    docs "look like" the target domain — the standard importance-
    resampling signal for pre-training data selection.

    Determinism: each per-token term quantizes to integer milli-nats
    BEFORE the per-doc sum (the repo's standard irrational-math
    policy — ln inputs are identical exact rationals on both engines,
    so the rounded term matches and integer sums are order-free).

    Scale shape: feature hashing bounds the distribution tables at
    {buckets} rows no matter the corpus size — they broadcast; the
    only corpus-sized work is one token explode + one per-doc sum
    (map-side combining).  This is why DSIR hashes: the unhanshed
    vocab LLR table at 100 TB would itself be a shuffle problem.
    """
    B, S, tgt = _DSIR["buckets"], _DSIR["scale"], _DSIR["target_source"]
    d = load(spark, sf_dir, "documents")
    feat = (d.select("doc_id", "source",
                     F.explode(tokens(F.col("text"))).alias("w"))
            .select("doc_id", "source",
                    _hash_bucket(F.col("w"), "dsir", B).alias("f")))
    is_t = F.col("source") == tgt
    cnt = (feat.groupBy("f")
           .agg(F.sum(is_t.cast("long")).alias("ct"),
                F.sum((~is_t).cast("long")).alias("cr")))
    tot = cnt.agg(F.sum("ct").alias("t_tot"), F.sum("cr").alias("r_tot"))
    term = (feat.join(F.broadcast(cnt), "f", "left")
            .crossJoin(F.broadcast(tot))
            .select("doc_id",
                    F.round(S * F.log(
                        ((F.coalesce("ct", F.lit(0)) + 1).cast("double")
                         * (F.col("r_tot") + B))
                        / ((F.coalesce("cr", F.lit(0)) + 1).cast("double")
                           * (F.col("t_tot") + B))))
                    .cast("long").alias("m")))
    return (term.groupBy("doc_id")
            .agg(F.sum("m").alias("weight_milli_nats"),
                 F.count(F.lit(1)).alias("n_tokens")))


# Interpolate the parameter placeholders into the real
# __doc__ attributes (a '"""...""".format(...)' first statement
# is a discarded expression, not a docstring — help()/inspect
# saw None for these functions until this pass).
boilerplate_chunk_removal.__doc__ = boilerplate_chunk_removal.__doc__.format(**_BP)
dsir_importance_weights.__doc__ = dsir_importance_weights.__doc__.format(**_DSIR)


# Interpolate the remaining literal {placeholders} into real __doc__
# values (never .format()ed before; guarded by the registry lint now).
corpus_shard_shuffle.__doc__ = corpus_shard_shuffle.__doc__.format(
    shards=_SHUF["shards"])
seq_packing.__doc__ = seq_packing.__doc__.format(
    block=_PACK["block"], shards=_PACK["shards"])
contamination_ngram.__doc__ = contamination_ngram.__doc__.format(
    ngram=_CONTAM["ngram"])
