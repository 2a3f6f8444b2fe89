"""Declared queries for training-corpus composition: weighted domain
mixing, epoch upsampling, curriculum ordering, and BPE merge
statistics.

These extend ``queries_llmprep.py`` with the *composition* half of a
pre-training data pipeline: once documents are cleaned, deduped, and
gated, a real pipeline decides HOW MUCH of each source to take
(domain mixing — e.g. the weights table in GPT-3/The Pile), how many
times high-value sources repeat per training run (epoch upsampling),
what order examples are seen in (curriculum), and which token merges a
BPE tokenizer would learn from the corpus (pair statistics).

Standing policies (see queries_llmprep.py): determinism — acceptance
and ordering decisions come from md5 hashes and integer arithmetic,
never ``rand()`` or floats, so results are identical across engines,
retries, and partitionings; oracle parity — every query has a DuckDB
twin built from the same constants with identical column names.

Reference parity note: the reference (dbt/Databricks IoT lake,
/root/reference) has no corpus-composition surface; these are [EXT]
operators from the north star (BASELINE.json: training-data pipeline
operators at 100 TB scale).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .functions.text import tokens
from .queries import load, q
from .queries_ext import O_TOKENS
from .queries_llmprep import _hash_bucket, _o_hash_bucket

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession


# =========================================================================
# Weighted domain mixing ([EXT])
# =========================================================================

#: Target mixture: per-source acceptance rate in basis points (of 10k).
#: Sources not listed take DEFAULT_BP.  Basis points, not floats, so
#: the accept predicate is pure integer comparison on both engines.
MIX_BP: dict[str, int] = {"src0": 10_000, "src1": 2_500, "src2": 5_000,
                          "src3": 7_500, "src4": 1_000}
MIX_DEFAULT_BP = 6_000
MIX_SEED = "mix13"


def _mix_rate_spark():
    r = F.lit(MIX_DEFAULT_BP)
    for s, bp in sorted(MIX_BP.items()):
        r = F.when(F.col("source") == s, F.lit(bp)).otherwise(r)
    return r


def _mix_rate_sql() -> str:
    whens = " ".join(f"WHEN '{s}' THEN {bp}"
                     for s, bp in sorted(MIX_BP.items()))
    return f"CASE source {whens} ELSE {MIX_DEFAULT_BP} END"


@q("domain_mix_weighted", ("W2", "F9"), oracle=f"""
SELECT doc_id, source,
       CAST({_mix_rate_sql()} AS INT) AS rate_bp
FROM documents
WHERE {_o_hash_bucket('doc_id', MIX_SEED, 10_000)} < {_mix_rate_sql()}
""")
def domain_mix_weighted(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Weighted domain mixing: keep each document with its source's
    target rate, decided by ``md5(seed:doc_id) % 10k < rate_bp``.

    This is the deterministic form of the per-source sampling weights
    every large pre-training corpus applies (downweight crawl,
    upweight books/reference).  Unlike ``sample()``/``rand()`` the
    decision is a pure function of the row, so retried tasks, AQE
    re-plans, and engine swaps keep the exact same rows, and the same
    doc keeps/drops consistently across incremental runs.

    Scale: map-only — the rate lookup is a literal CASE expression
    (beyond ~10³ sources, a broadcast-joined rates dim), the accept
    test is one md5 per row; no shuffle, fully pipelined into the
    scan, and the filter prunes before any downstream exchange.
    """
    d = load(spark, sf_dir, "documents")
    rate = _mix_rate_spark()
    return (d.select("doc_id", "source", rate.cast("int").alias("rate_bp"))
            .where(_hash_bucket(F.col("doc_id"), MIX_SEED, 10_000) < rate))


# =========================================================================
# Epoch upsampling ([EXT])
# =========================================================================

#: Epochs per source in basis points: 25_000 = 2.5 epochs (2 full
#: passes + 50% chance of a third), 10_000 = exactly once.
EPOCH_BP: dict[str, int] = {"src0": 25_000, "src1": 10_000,
                            "src2": 17_500}
EPOCH_DEFAULT_BP = 12_500
EPOCH_SEED = "epoch29"


def _epoch_rate_sql() -> str:
    whens = " ".join(f"WHEN '{s}' THEN {bp}"
                     for s, bp in sorted(EPOCH_BP.items()))
    return f"CASE source {whens} ELSE {EPOCH_DEFAULT_BP} END"


@q("epoch_upsample", ("W2", "F9"), oracle=f"""
WITH w AS (
  SELECT doc_id, source,
         {_epoch_rate_sql()} AS bp,
         {_o_hash_bucket('doc_id', EPOCH_SEED, 10_000)} AS h
  FROM documents
), n AS (
  SELECT doc_id, source,
         (bp // 10000) + CASE WHEN h < (bp % 10000) THEN 1 ELSE 0 END
           AS n_epochs
  FROM w
)
SELECT doc_id, source, CAST(epoch AS INT) AS epoch
FROM n, LATERAL unnest(generate_series(0, n_epochs - 1)) AS t(epoch)
WHERE n_epochs > 0
""")
def epoch_upsample(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Epoch upsampling: replicate each document ``floor(w)`` times
    plus one more with probability ``frac(w)``, where w is the
    per-source epoch weight — (doc_id, source, epoch) rows.

    Fractional epochs are how mixture weights are actually realized
    (e.g. "Wikipedia ×2.5"): every doc gets the integer passes, and a
    deterministic hash coin decides membership in the partial pass —
    so the SAME docs join the partial epoch on every run, which keeps
    loss curves reproducible.

    Scale: map-side explode with blow-up factor = Σw (bounded, chosen
    by config); emits only (doc_id, source, epoch) — replication of
    the text itself happens at pack/write time downstream (never
    materialize N copies of 100 TB).  No shuffle.
    """
    d = load(spark, sf_dir, "documents")
    bp = F.lit(EPOCH_DEFAULT_BP)
    for s, v in sorted(EPOCH_BP.items()):
        bp = F.when(F.col("source") == s, F.lit(v)).otherwise(bp)
    h = _hash_bucket(F.col("doc_id"), EPOCH_SEED, 10_000)
    n_epochs = (bp.cast("long") / F.lit(10_000)).cast("long") + \
        F.when(h < bp % 10_000, F.lit(1)).otherwise(F.lit(0))
    return (d.select("doc_id", "source", n_epochs.alias("n_epochs"))
            .where(F.col("n_epochs") > 0)
            .select("doc_id", "source",
                    F.explode(F.sequence(
                        F.lit(0), (F.col("n_epochs") - 1).cast("int")))
                    .alias("epoch"))
            .withColumn("epoch", F.col("epoch").cast("int")))


# =========================================================================
# Curriculum ordering ([EXT])
# =========================================================================

CURR_SEED = "curr7"
#: ceil(q*n) rank targets for quartile thresholds, as integer exprs.
_RANKS = {"t1": "(n + 3) // 4", "t2": "(n + 1) // 2",
          "t3": "(3 * n + 3) // 4"}


@q("curriculum_order", ("W3", "A6"), oracle=f"""
WITH n AS (SELECT COUNT(*) AS n FROM documents),
hist AS (SELECT n_chars AS s, COUNT(*) AS c FROM documents GROUP BY 1),
cum AS (SELECT s, SUM(c) OVER (ORDER BY s) AS cc FROM hist),
thr AS (
  SELECT MIN(CASE WHEN cc >= {_RANKS['t1']} THEN s END) AS t1,
         MIN(CASE WHEN cc >= {_RANKS['t2']} THEN s END) AS t2,
         MIN(CASE WHEN cc >= {_RANKS['t3']} THEN s END) AS t3
  FROM cum, n
)
SELECT doc_id,
       CAST(1 + CASE WHEN n_chars > t1 THEN 1 ELSE 0 END
              + CASE WHEN n_chars > t2 THEN 1 ELSE 0 END
              + CASE WHEN n_chars > t3 THEN 1 ELSE 0 END AS INT)
         AS bucket,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY 1 + CASE WHEN n_chars > t1 THEN 1 ELSE 0 END
                        + CASE WHEN n_chars > t2 THEN 1 ELSE 0 END
                        + CASE WHEN n_chars > t3 THEN 1 ELSE 0 END
         ORDER BY md5('{CURR_SEED}:' || CAST(doc_id AS VARCHAR)))
         AS INT) AS pos
FROM documents, thr
""")
def curriculum_order(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Curriculum ordering: quartile difficulty buckets (by document
    length as the difficulty proxy) with a deterministic shuffle
    inside each bucket — (doc_id, bucket, pos).

    The quartile thresholds are EXACT nearest-rank quantiles computed
    scalably: a per-value histogram (one shuffle on the score value —
    cardinality = distinct lengths, not documents), a running-sum
    window over that tiny relation, then ``min(score where cumcount >=
    ceil(q*n))``.  All integer arithmetic — no interpolated-quantile
    float drift between engines, unlike percentile_cont.

    Scale: the histogram aggregate is the only data-sized shuffle; the
    cumsum window runs over |distinct scores| rows (thousands at
    100 TB, fine on one partition); thresholds broadcast back as a
    1-row dim.  Within-bucket pos is a 4-partition row_number here for
    oracle parity — at scale the order is realized instead by
    ``repartitionByRange(bucket, hk)`` + ``sortWithinPartitions`` at
    write time (same deterministic key, no single-reducer sort).
    """
    d = load(spark, sf_dir, "documents")
    hist = d.groupBy(F.col("n_chars").alias("s")).agg(
        F.count(F.lit(1)).alias("c"))
    cum = hist.withColumn("cc", F.sum("c").over(
        W.orderBy("s").rowsBetween(W.unboundedPreceding, W.currentRow)))
    n = d.agg(F.count(F.lit(1)).alias("n"))
    thr = (cum.crossJoin(F.broadcast(n))
           .agg(*[F.min(F.when(F.col("cc") >= F.expr(r.replace("//", " div ")),
                               F.col("s"))).alias(t)
                  for t, r in _RANKS.items()]))
    bucket = (F.lit(1)
              + (F.col("n_chars") > F.col("t1")).cast("int")
              + (F.col("n_chars") > F.col("t2")).cast("int")
              + (F.col("n_chars") > F.col("t3")).cast("int")).cast("int")
    hk = F.md5(F.concat(F.lit(f"{CURR_SEED}:"),
                        F.col("doc_id").cast("string")))
    return (d.crossJoin(F.broadcast(thr))
            .select("doc_id", bucket.alias("bucket"), hk.alias("hk"))
            .withColumn("pos", F.row_number().over(
                W.partitionBy("bucket").orderBy("hk")).cast("int"))
            .drop("hk"))


# =========================================================================
# BPE merge statistics ([EXT])
# =========================================================================

BPE_TOP = 50


@q("bpe_pair_stats", ("F9", "A1"), oracle=f"""
WITH tok AS (
  SELECT doc_id, {O_TOKENS.format(c='text')} AS toks FROM documents
), pairs AS (
  SELECT unnest([toks[i] || ' ' || toks[i + 1]
                 for i in generate_series(1, len(toks) - 1)]) AS pair
  FROM tok WHERE len(toks) >= 2
)
SELECT pair, COUNT(*) AS cnt
FROM pairs GROUP BY pair
ORDER BY cnt DESC, pair LIMIT {BPE_TOP}
""")
def bpe_pair_stats(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Top-{N} adjacent token pairs — the statistic one BPE merge
    round maximizes (tokenizer induction over the corpus).

    Pairs keep multiplicity (unlike the MinHash shingle path, which
    distincts): BPE merge choice is frequency-weighted.  The pair
    array is built by zipping the token array against itself shifted
    by one — no per-element lambda, no explode before the array is
    formed.

    Scale: explode → partial (map-side) count → final count is the
    canonical word-count shape; the shuffle carries (pair, partial
    count), already heavily combined.  Top-N is
    TakeOrderedAndProject — no global sort.  Iterated BPE training
    re-runs this with the previous round's merges applied; each round
    is the same plan.
    """
    d = load(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    pairs = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b))
    return (d.select(F.explode(pairs).alias("pair"))
            .groupBy("pair").agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.col("cnt").desc(), "pair").limit(BPE_TOP))


# =========================================================================
# BPE merge training — the iterated form of bpe_pair_stats
# =========================================================================

_BPE_ROUNDS = 2
_BPE_VOCAB_TOP = 20

_BPE_STEP_SQL = """
, pc{x} AS (
  SELECT tok, nxt, COUNT(*) AS cnt FROM (
    SELECT tok, LEAD(tok) OVER (PARTITION BY doc_id ORDER BY p) AS nxt
    FROM {prev}
  ) WHERE nxt IS NOT NULL GROUP BY 1, 2
), top{x} AS (
  SELECT tok AS a, nxt AS b FROM pc{x} ORDER BY cnt DESC, tok, nxt LIMIT 1
), m{x} AS (
  SELECT s.doc_id, s.p, s.tok,
         LEAD(s.tok) OVER (PARTITION BY s.doc_id ORDER BY s.p) AS nxt,
         COALESCE(s.tok = t.a AND
                  LEAD(s.tok) OVER (PARTITION BY s.doc_id ORDER BY s.p)
                    = t.b, FALSE) AS match
  FROM {prev} s CROSS JOIN top{x} t
), r{x} AS (
  SELECT doc_id, p, tok, nxt, match,
         CASE WHEN match AND NOT COALESCE(
                LAG(match) OVER (PARTITION BY doc_id ORDER BY p), FALSE)
              THEN 1 ELSE 0 END AS run_start
  FROM m{x}
), g{x} AS (
  SELECT doc_id, p, tok, nxt, match,
         SUM(run_start) OVER (PARTITION BY doc_id ORDER BY p
                              ROWS UNBOUNDED PRECEDING) AS run_id
  FROM r{x}
), h{x} AS (
  SELECT doc_id, p, tok, nxt, match,
         MIN(p) OVER (PARTITION BY doc_id, run_id) AS run_first
  FROM g{x}
), u{x} AS (
  SELECT doc_id, p, tok, nxt,
         (match AND (p - run_first) % 2 = 0) AS mstart
  FROM h{x}
), v{x} AS (
  SELECT doc_id, p, tok, nxt, mstart,
         COALESCE(LAG(mstart) OVER (PARTITION BY doc_id ORDER BY p),
                  FALSE) AS absorbed
  FROM u{x}
), seq{x} AS (
  SELECT doc_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY p)
              AS BIGINT) AS p,
         CASE WHEN mstart THEN tok || ' ' || nxt ELSE tok END AS tok
  FROM v{x} WHERE NOT absorbed
)"""


def _bpe_merge_oracle() -> str:
    steps = "".join(
        _BPE_STEP_SQL.format(x=x, prev=f"seq{x - 1}")
        for x in range(1, _BPE_ROUNDS + 1))
    return f"""
WITH tok AS (
  SELECT doc_id, {O_TOKENS.format(c='text')} AS toks FROM documents
), pos AS (
  SELECT doc_id, toks,
         UNNEST(generate_series(1, len(toks))) AS p
  FROM tok
), seq0 AS (
  SELECT doc_id, CAST(p AS BIGINT) AS p, toks[p] AS tok FROM pos
)
{steps}
SELECT tok, COUNT(*) AS cnt
FROM seq{_BPE_ROUNDS} GROUP BY tok
ORDER BY cnt DESC, tok LIMIT {_BPE_VOCAB_TOP}
"""


@q("bpe_apply_merges", ("F9", "W1", "A1"), oracle=_bpe_merge_oracle())
def bpe_apply_merges(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Two full BPE training rounds: pick the most frequent adjacent
    token pair (ties → lexicographic), apply the merge greedily
    left-to-right corpus-wide, recount, repeat; returns the post-merge
    top-{V} vocabulary.  The iterated loop bpe_pair_stats' docstring
    promises.

    Greedy-apply is the subtle part: overlapping matches (runs of a
    repeated token, e.g. ``a a a`` merging ``(a,a)``) must merge at
    even offsets within each run only.  Runs are found with the same
    gaps-and-islands windows as interval_merge — match flag → run
    start → run id → offset parity — all partition-local after the one
    shuffle on doc_id.  Each round is: pair-count aggregate (map-side
    combined), a 1-row top-pair reduction pinned to the driver (the
    merge TABLE is driver state in real BPE trainers too — it IS the
    tokenizer being built), and a map-side rewrite + renumber.  Plan
    shape is round-invariant; at 100 TB each round is one shuffle on
    doc_id plus one word-count shuffle.

    The DuckDB oracle replays both rounds as chained CTEs, computing
    the top pair relationally (CROSS JOIN of a LIMIT-1 subquery).
    """
    wdoc = W.partitionBy("doc_id").orderBy("p")
    running = wdoc.rowsBetween(W.unboundedPreceding, W.currentRow)
    d = load(spark, sf_dir, "documents")
    seq = (d.select("doc_id",
                    F.posexplode(tokens(F.col("text"))).alias("pos", "tok"))
           .select("doc_id", (F.col("pos") + 1).cast("bigint").alias("p"),
                   "tok"))

    for _ in range(_BPE_ROUNDS):
        pc = (seq.withColumn("nxt", F.lead("tok").over(wdoc))
              .where(F.col("nxt").isNotNull())
              .groupBy("tok", "nxt").agg(F.count(F.lit(1)).alias("cnt")))
        top = pc.orderBy(F.col("cnt").desc(), "tok", "nxt").limit(1).collect()
        if not top:       # no adjacent pairs left (or corpus of 1-token
            break         # docs) — oracle's empty top CTE merges nothing
        a, b = top[0]["tok"], top[0]["nxt"]

        df = seq.withColumn("nxt", F.lead("tok").over(wdoc))
        df = df.withColumn(
            "match", F.coalesce((F.col("tok") == F.lit(a)) &
                                (F.col("nxt") == F.lit(b)), F.lit(False)))
        df = df.withColumn(
            "run_start",
            F.when(F.col("match") &
                   ~F.coalesce(F.lag("match").over(wdoc), F.lit(False)),
                   1).otherwise(0))
        df = df.withColumn("run_id", F.sum("run_start").over(running))
        df = df.withColumn(
            "run_first", F.min("p").over(W.partitionBy("doc_id", "run_id")))
        df = df.withColumn(
            "mstart", F.col("match") &
            ((F.col("p") - F.col("run_first")) % 2 == 0))
        df = df.withColumn(
            "absorbed",
            F.coalesce(F.lag("mstart").over(wdoc), F.lit(False)))
        seq = (df.where(~F.col("absorbed"))
               .select("doc_id",
                       F.row_number().over(wdoc).cast("bigint").alias("p"),
                       F.when(F.col("mstart"),
                              F.concat("tok", F.lit(" "), "nxt"))
                       .otherwise(F.col("tok")).alias("tok")))

    return (seq.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.col("cnt").desc(), "tok").limit(_BPE_VOCAB_TOP))


# =========================================================================
# PMI co-occurrence — vocabulary-pruned pairwise association mining
# =========================================================================

_PMI_VOCAB = 50
_PMI_MIN_CO = 5
_PMI_TOP = 30


@q("pmi_cooccurrence", ("F9", "J5", "W3"), oracle=f"""
WITH tok AS (
  SELECT doc_id, UNNEST(list_distinct({O_TOKENS.format(c='text')})) AS tok
  FROM documents
), dfreq AS (
  SELECT tok, COUNT(*) AS df FROM tok GROUP BY 1
), vocab AS (
  SELECT tok, df FROM dfreq ORDER BY df DESC, tok LIMIT {_PMI_VOCAB}
), vt AS (
  SELECT t.doc_id, t.tok FROM tok t JOIN vocab v ON t.tok = v.tok
), pairs AS (
  SELECT a.tok AS tok_a, b.tok AS tok_b, COUNT(*) AS co
  FROM vt a JOIN vt b ON a.doc_id = b.doc_id AND a.tok < b.tok
  GROUP BY 1, 2
), n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT p.tok_a, p.tok_b, p.co,
       CAST(ROUND(1000 * log2(
            CAST(n.n_docs AS DOUBLE) * p.co /
            (CAST(va.df AS DOUBLE) * vb.df))) AS BIGINT) AS pmi_milli
FROM pairs p
JOIN vocab va ON va.tok = p.tok_a
JOIN vocab vb ON vb.tok = p.tok_b
CROSS JOIN n
WHERE p.co >= {_PMI_MIN_CO}
ORDER BY pmi_milli DESC, tok_a, tok_b LIMIT {_PMI_TOP}
""")
def pmi_cooccurrence(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Top pointwise-mutual-information token pairs — the association
    statistic behind collocation mining and phrase induction.

    The scale move is the VOCABULARY PRUNE: co-occurrence over an
    unbounded vocabulary is quadratic per document, so the pair space
    is restricted to the top-50 document-frequency tokens FIRST
    (tiny, broadcast into a semi-join filter) and only then self-
    joined per doc — pairs/doc is bounded by vocab²/2 whatever the corpus
    looks like.  PMI quantizes to integer milli-bits exactly like
    text_char_entropy (the 1e-3 quantum dwarfs libm log2 ulp drift),
    co-support ≥ 5 kills the noise tail, and the final top-30
    is TakeOrderedAndProject with full tie-break."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id",
                   F.explode(F.array_distinct(tokens(F.col("text"))))
                   .alias("tok"))
    dfreq = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    vocab = dfreq.orderBy(F.col("df").desc(), "tok").limit(_PMI_VOCAB)
    vt = tok.join(F.broadcast(vocab.select("tok")), "tok")
    a, b = vt.alias("a"), vt.alias("b")
    pairs = (a.join(b, (F.col("a.doc_id") == F.col("b.doc_id")) &
                       (F.col("a.tok") < F.col("b.tok")))
             .groupBy(F.col("a.tok").alias("tok_a"),
                      F.col("b.tok").alias("tok_b"))
             .agg(F.count(F.lit(1)).alias("co"))
             .filter(F.col("co") >= _PMI_MIN_CO))
    # corpus size as a broadcast 1-row aggregate, not a driver-side
    # d.count() stitched into plan construction (tfidf_topk's shape) —
    # no second eager scan of documents
    nd = d.agg(F.count(F.lit(1)).cast("double").alias("_ndocs"))
    va = vocab.select(F.col("tok").alias("tok_a"), F.col("df").alias("dfa"))
    vb = vocab.select(F.col("tok").alias("tok_b"), F.col("df").alias("dfb"))
    return (pairs.join(F.broadcast(va), "tok_a")
            .join(F.broadcast(vb), "tok_b")
            .crossJoin(F.broadcast(nd))
            .select("tok_a", "tok_b", "co",
                    F.round(1000 * F.log2(
                        F.col("_ndocs") * F.col("co") /
                        (F.col("dfa").cast("double") * F.col("dfb"))))
                    .cast("bigint").alias("pmi_milli"))
            .orderBy(F.col("pmi_milli").desc(), "tok_a", "tok_b")
            .limit(_PMI_TOP))


# =========================================================================
# Temperature-sampled mixture rates ([EXT] — the τ-sampling recipe)
# =========================================================================

_TEMP = dict(tau="0.7::DOUBLE")


@q("temperature_mix_rates", ("A1", "F7"), oracle=f"""
WITH s AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
           FROM documents GROUP BY source),
t AS (SELECT source, n_docs,
             CAST(FLOOR(POW(CAST(n_docs AS DOUBLE), {_TEMP['tau']})
                        * 1000000) AS BIGINT) AS wq FROM s),
z AS (SELECT CAST(SUM(wq) AS BIGINT) AS z,
             CAST(SUM(n_docs) AS BIGINT) AS tot FROM t
      CROSS JOIN (SELECT 1) one),
s2 AS (SELECT t.source, t.n_docs, t.wq, z.z, z.tot FROM t CROSS JOIN z)
SELECT source, n_docs,
       CAST((CAST(wq AS HUGEINT) * 1000000) // z AS BIGINT) AS mix_ppm,
       CAST(FLOOR((CAST(wq AS DOUBLE) / z) /
             (CAST(n_docs AS DOUBLE) / tot) * 1000) AS BIGINT)
           AS upweight_milli
FROM s2
""")
def temperature_mix_rates(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Temperature-based mixture weights per source:
    p_s ∝ n_s^τ (τ=0.7) — the multinomial τ-sampling recipe from the
    GPT-3/PaLM data pipelines that upweights small high-quality
    sources relative to raw proportion.  Emits each source's sampling
    rate (ppm) and its upweight factor vs natural frequency (milli) —
    the table domain_mix_weighted / epoch_upsample consume as their
    configured rates.

    Scale design: one map-side-combined source count (the whole input
    reduces to |sources| rows), then per-row double math with a
    broadcast normalizer — identical expression tree on both engines,
    floored to integer units so the rate TABLE itself is
    bit-reproducible, which matters because these rates become a
    frozen training-config artifact.
    """
    d = load(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(F.count("*").cast("long").alias("n_docs"))
    # per-source weight quantized to integer micro-units BEFORE the
    # normalizer sum, so z is an exact bigint (a double Σ would be
    # reduction-order-dependent)
    t = s.select("source", "n_docs",
                 F.floor(F.pow(F.col("n_docs").cast("double"), 0.7)
                         * 1000000).cast("long").alias("wq"))
    z = t.groupBy().agg(F.sum("wq").cast("long").alias("z"),
                        F.sum("n_docs").cast("long").alias("tot"))
    return (t.join(F.broadcast(z))
            .selectExpr("source", "n_docs",
                        # 128-bit: wq·10⁶ exits int64 once a source
                        # holds ~1e10 docs (wq = ⌊n^0.7·10⁶⌋); the
                        # mix_ppm quotient is ≤ 10⁶ at any scale
                        "CAST((CAST(wq AS DECIMAL(38,0)) * 1000000)"
                        " div z AS BIGINT) AS mix_ppm",
                        "CAST(FLOOR((CAST(wq AS DOUBLE) / z) /"
                        " (CAST(n_docs AS DOUBLE) / tot) * 1000)"
                        " AS BIGINT) AS upweight_milli"))


# Interpolate the remaining literal {placeholders} into real __doc__
# values (never .format()ed before; guarded by the registry lint now).
bpe_pair_stats.__doc__ = bpe_pair_stats.__doc__.format(N=BPE_TOP)
bpe_apply_merges.__doc__ = bpe_apply_merges.__doc__.format(
    V=_BPE_VOCAB_TOP)
