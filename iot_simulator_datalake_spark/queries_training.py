"""Declared queries for the training-data-pipeline surface that layers
ON TOP of the pairwise dedup/similarity operators: near-dup cluster
assignment (connected components), deterministic dataset splits,
document chunking, vocabulary / TF-IDF, and PII redaction.

Oracle strategy follows queries_ext.py: every Spark composition has a
DuckDB twin generated from the same constants.  The one new trick is
``neardup_clusters``: Spark runs an ITERATIVE label-propagation
fixpoint (operators/components.py) while the oracle expresses the same
transitive closure as a DuckDB ``WITH RECURSIVE`` CTE — the driver's
hash compare then certifies an algorithm Spark cannot state in one SQL
query.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .functions.text import tokens
from .operators.components import connected_components
from .operators.dedup import minhash_lsh_cross_pairs, minhash_lsh_pairs
from .operators.packing import SPLIT_THRESHOLDS as _SPLIT, plain_bucket
from .queries import load, q
from .queries_ext import (O_TOKENS, _MINHASH, _MINHASH_CAP, _mh_bandkeys_sql,
                          _mh_shingles_sql, _mh_sigs_sql, _minhash_oracle)

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession


# =========================================================================
# Near-dup clusters: MinHash pairs → connected components ([EXT] W2/J5)
# =========================================================================

#: The min-label transitive closure as a DuckDB CTE chain — assumes a
#: ``pairs(key_a, key_b)`` CTE is in scope and leaves ``comp(node,
#: comp)``.  ONE definition shared by every clustering oracle
#: (neardup_clusters, fuzzy_dedup_report, and the tiered twins) so the
#: closure semantics cannot silently diverge between them — they all
#: mirror operators/components.py.
_CLOSURE_SQL = """edges AS (
  SELECT key_a AS a, key_b AS b FROM pairs
  UNION ALL
  SELECT key_b AS a, key_a AS b FROM pairs
), reach(node, lbl) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.b, r.lbl FROM reach r JOIN edges e ON e.a = r.node
), comp AS (
  SELECT node, MIN(lbl) AS comp FROM reach GROUP BY node
)"""


def _clusters_oracle() -> str:
    return f"""
WITH RECURSIVE pairs AS (
  SELECT key_a, key_b FROM ({_minhash_oracle()})
), {_CLOSURE_SQL}
SELECT d.doc_id, COALESCE(c.comp, d.doc_id) AS cluster_id
FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
"""


@q("neardup_clusters", ("W2", "J5"), oracle=_clusters_oracle())
def neardup_clusters(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """(doc_id, cluster_id): near-dup cluster per document — MinHash-LSH
    pairs fed through iterative min-label propagation; singletons keep
    their own id.  cluster_id is the min doc_id in the component, so
    "keep one per cluster" is ``WHERE doc_id = cluster_id``.

    The oracle states the identical transitive closure as a DuckDB
    recursive CTE, putting a genuinely iterative Spark algorithm inside
    the hash-compare gate.
    """
    d = load(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(d, "text", "doc_id", **_MINHASH) \
        .select("key_a", "key_b")
    comp = connected_components(pairs, "key_a", "key_b")
    return (d.select("doc_id")
            .join(comp, d["doc_id"] == comp["node"], "left")
            .select("doc_id",
                    F.coalesce("comp", "doc_id").alias("cluster_id")))


# =========================================================================
# Deterministic train/validation/test split ([EXT])
# =========================================================================

# _SPLIT is operators.packing.SPLIT_THRESHOLDS (one definition for
# every split surface)


@q("dataset_split", ("F2",), oracle=f"""
SELECT doc_id,
       CASE WHEN b < {_SPLIT['train']} THEN 'train'
            WHEN b < {_SPLIT['validation']} THEN 'validation'
            ELSE 'test' END AS split
FROM (
  SELECT doc_id,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
           % 100 AS b
  FROM documents
)
""")
def dataset_split(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """(doc_id, split): deterministic 80/10/10 split by hash bucket.

    md5(key) % 100 — not ``rand()`` — so the split is stable across
    runs, engines, partitionings, and retries (a training-data split
    must never depend on row order or cluster layout).  Map-only: no
    shuffle, fully pipelined into the scan at any scale.
    """
    d = load(spark, sf_dir, "documents")
    b = plain_bucket(F.col("doc_id"))
    split = (F.when(b < _SPLIT["train"], "train")
             .when(b < _SPLIT["validation"], "validation")
             .otherwise("test"))
    return d.select("doc_id", split.alias("split"))


# =========================================================================
# Document chunking with overlap ([EXT])
# =========================================================================

_CHUNK = 32   # tokens per chunk
_STRIDE = 24  # chunk start distance (overlap = _CHUNK - _STRIDE)


@q("doc_chunking", ("F9",), oracle=f"""
WITH tok AS (
  SELECT doc_id, {O_TOKENS.format(c='text')} AS toks FROM documents
), sized AS (
  SELECT doc_id, toks, len(toks) AS n FROM tok WHERE len(toks) > 0
), idx AS (
  SELECT doc_id, toks,
         unnest(generate_series(0,
           CASE WHEN n <= {_CHUNK} THEN 0
                ELSE (n - {_CHUNK} + {_STRIDE - 1}) // {_STRIDE} END)) AS i
  FROM sized
)
SELECT doc_id,
       CAST(i AS INT) AS chunk_id,
       array_to_string(
         toks[i * {_STRIDE} + 1 : i * {_STRIDE} + {_CHUNK}], ' ') AS chunk
FROM idx
""")
def doc_chunking(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """(doc_id, chunk_id, chunk): overlapping {_CHUNK}-token windows
    every {_STRIDE} tokens — the standard context-window chunking step
    before embedding/training.

    Shape: tokenize once, explode a chunk-INDEX sequence (never the
    token array itself), slice per index.  Row blow-up is the chunk
    count (~n/stride), there is no shuffle, and the whole thing
    pipelines into the scan — embarrassingly parallel at 100 TB.
    """
    d = load(spark, sf_dir, "documents")
    base = (d.select("doc_id", tokens(F.col("text")).alias("toks"))
            .withColumn("n", F.size("toks"))
            .where(F.col("n") > 0))
    last = F.when(F.col("n") <= _CHUNK, F.lit(0)).otherwise(
        F.expr(f"(n - {_CHUNK} + {_STRIDE - 1}) div {_STRIDE}"))
    return (base
            .withColumn("_i", F.explode(F.sequence(F.lit(0), last)))
            .select("doc_id", F.col("_i").cast("int").alias("chunk_id"),
                    F.array_join(
                        F.slice("toks", F.col("_i") * _STRIDE + 1,
                                _CHUNK), " ").alias("chunk")))


# =========================================================================
# Vocabulary + TF-IDF ([EXT] F9)
# =========================================================================

_VOCAB_N = 200


@q("vocab_topk", ("F9", "W3"), oracle=f"""
WITH tok AS (
  SELECT unnest({O_TOKENS.format(c='text')}) AS token FROM documents
), c AS (
  SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token
)
SELECT token, cnt,
       CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS INT) AS rank
FROM c ORDER BY rank LIMIT {_VOCAB_N}
""")
def vocab_topk(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """(token, cnt, rank): global top-{_VOCAB_N} vocabulary by corpus
    frequency, ties broken lexically.

    The global order is a ``TakeOrderedAndProject`` (orderBy+limit):
    each partition keeps its local top-N and only N rows per partition
    reach the driver-side merge — never a single-partition global sort.
    row_number runs AFTER the limit, over {_VOCAB_N} rows.
    """
    d = load(spark, sf_dir, "documents")
    counts = (d.select(F.explode(tokens(F.col("text"))).alias("token"))
              .groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
              .orderBy(F.col("cnt").desc(), "token").limit(_VOCAB_N))
    w = W.orderBy(F.col("cnt").desc(), "token")
    return counts.withColumn("rank", F.row_number().over(w))


@q("tfidf_topk", ("F9", "W3"), oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest({O_TOKENS.format(c='text')}) AS token
  FROM documents
), tf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2
), dfreq AS (
  SELECT token, COUNT(*) AS df FROM tf GROUP BY 1
), nd AS (
  SELECT COUNT(*) AS nd FROM documents
), scored AS (
  SELECT tf.doc_id, tf.token, tf.tf,
         ROUND(tf.tf * ROUND(ln((nd.nd + 1) / (dfreq.df + 1)), 8), 6)
           AS tfidf
  FROM tf JOIN dfreq ON tf.token = dfreq.token CROSS JOIN nd
)
SELECT doc_id, token, tf, tfidf FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY tfidf DESC, token) AS rn
  FROM scored
) WHERE rn <= 3
""")
def tfidf_topk(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """(doc_id, token, tf, tfidf): top-3 TF-IDF terms per document.

    Float determinism: idf = round(ln((N+1)/(df+1)), 8) — the ln sees
    a bit-identical double both sides (exact-int division) and the
    8-dp round absorbs any last-ulp libm difference; the final score
    rounds to 6 dp.  Plan: tf agg shuffles on (doc, token) with
    map-side partials, df derives from tf (no second pass over the
    corpus), N arrives via a broadcast single-row cross join — no
    driver-side ``.count()`` stitched into the plan.
    """
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    nd = d.agg(F.count(F.lit(1)).alias("nd"))
    idf = F.round(F.log((F.col("nd") + 1) / (F.col("df") + 1)), 8)
    scored = (tf.join(dfreq, "token").crossJoin(F.broadcast(nd))
              .withColumn("tfidf", F.round(F.col("tf") * idf, 6)))
    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "token")
    return (scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3)
            .select("doc_id", "token", "tf", "tfidf"))


# =========================================================================
# PII redaction ([EXT] F9)
# =========================================================================

#: deliberately RE2-compatible (no lookaround/backrefs) so the Spark
#: (java.util.regex) and DuckDB (RE2) engines match identically
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+?[0-9][0-9()\- ]{6,}[0-9]"


@q("text_redact_pii", ("F9",), oracle=f"""
WITH injected AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or +1 (555) 01' || CAST(doc_id AS VARCHAR)
              AS raw
  FROM documents
)
SELECT doc_id,
       regexp_replace(
         regexp_replace(raw, '{_EMAIL_RE}', '<EMAIL>', 'g'),
         '{_PHONE_RE}', '<PHONE>', 'g') AS redacted,
       len(regexp_extract_all(raw, '{_EMAIL_RE}')) AS n_emails
FROM injected
""")
def text_redact_pii(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """(doc_id, redacted, n_emails): PII scrubbing — emails then phone
    numbers replaced with typed placeholders.

    The corpus is synthetic, so a deterministic email+phone suffix is
    injected per doc first; the oracle injects the identical suffix and
    runs the identical regexes, so the gate checks true cross-engine
    regex parity (patterns stay in the RE2 ∩ java.util.regex dialect).
    Map-only; no shuffle at any scale.
    """
    d = load(spark, sf_dir, "documents")
    raw = F.concat(F.col("text"),
                   F.lit(" contact user"), F.col("doc_id").cast("string"),
                   F.lit("@example.com or +1 (555) 01"),
                   F.col("doc_id").cast("string"))
    red = F.regexp_replace(
        F.regexp_replace(raw, _EMAIL_RE, "<EMAIL>"),
        _PHONE_RE, "<PHONE>")
    n_emails = F.size(F.regexp_extract_all(raw, F.lit(_EMAIL_RE), F.lit(0)))
    return d.select("doc_id", red.alias("redacted"),
                    n_emails.cast("long").alias("n_emails"))


@q("per_source_cap", ("W3", "P5"), oracle="""
SELECT doc_id, source, pri
FROM (
    SELECT doc_id, source,
           md5(CAST(doc_id AS VARCHAR)) AS pri,
           ROW_NUMBER() OVER (PARTITION BY source
                              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
           ) AS rn
    FROM documents
) WHERE rn <= 10
""")
def per_source_cap(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Per-source document cap — the domain-balancing policy step of a
    training-data pipeline (cap N docs per domain so no single source
    dominates the mixture).  Selection priority is md5(doc_id): a
    deterministic uniform shuffle WITHIN each source, so the kept
    subset is an unbiased sample yet identical across engines and
    runs.  Plan: one shuffle on source + WindowGroupLimit partial
    top-K per partition — the cap never sees more than K rows per
    source per map task."""
    d = load(spark, sf_dir, "documents")
    pri = F.md5(F.col("doc_id").cast("string"))
    w = W.partitionBy("source").orderBy(pri, "doc_id")
    return (d.select("doc_id", "source", pri.alias("pri"),
                     F.row_number().over(w).alias("rn"))
            .filter(F.col("rn") <= 10)
            .select("doc_id", "source", "pri"))


# =========================================================================
# Fuzzy-dedup retention report ([EXT] — the end-to-end dedup pipeline)
# =========================================================================

@q("fuzzy_dedup_report", ("W2", "J5", "A1"), oracle=f"""
WITH RECURSIVE pairs AS (
  SELECT key_a, key_b FROM ({_minhash_oracle()})
), {_CLOSURE_SQL}, cl AS (
  SELECT d.doc_id, d.source, COALESCE(c.comp, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN doc_id = cluster_id THEN 1 ELSE 0 END)
           AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN doc_id <> cluster_id THEN 1 ELSE 0 END)
           AS BIGINT) AS n_removed
FROM cl GROUP BY source
""")
def fuzzy_dedup_report(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """The END-TO-END fuzzy-dedup pipeline as one relation: MinHash-LSH
    candidate pairs → connected-components clustering → canonical-doc
    selection (min doc_id) → per-source retention report — i.e. the
    numbers a corpus curator actually reviews before signing off a
    training mix ("how much of src3 was near-duplicate?").

    ROLE (VERDICT r8 #1): this UNCAPPED composition is the recall
    reference — its banding carries every verbatim copy, which the
    ×100 sweep measured as a shuffle-spill disk-exhaustion kill on a
    fully-duplicated corpus.  The production/headline form is
    ``fuzzy_dedup_report_capped`` (exact tier first, capped banding).

    Scale design: nothing new executes — this composes the three
    production stages (operators/dedup.py banding, whose candidate
    work is signature-bounded; operators/components.py label
    propagation, whose per-round cost is edge-sized; a canonical
    filter that is a map-side comparison) and reduces to a
    source-cardinality-sized report.  The oracle replays the WHOLE
    pipeline — banding, transitive closure (recursive CTE), canonical
    choice, report — so the gate certifies the pipeline end-to-end,
    not just each stage.
    """
    d = load(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(d, "text", "doc_id", **_MINHASH) \
        .select("key_a", "key_b")
    comp = connected_components(pairs, "key_a", "key_b")
    cl = (d.select("doc_id", "source")
          .join(comp, d["doc_id"] == comp["node"], "left")
          .select("doc_id", "source",
                  F.coalesce("comp", "doc_id").alias("cluster_id")))
    keep = (F.col("doc_id") == F.col("cluster_id")).cast("long")
    return (cl.groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum(keep).alias("n_kept"),
                 F.sum(1 - keep).alias("n_removed")))


# =========================================================================
# Tiered (exact-first + hot-band-capped) fuzzy dedup — the 100 TB form
# =========================================================================

def _tiered_oracle(select_body: str) -> str:
    """Shared WITH-chain for the tiered dedup twins: exact canonical →
    capped MinHash pairs over survivors → transitive closure → per-doc
    final cluster; ``select_body`` projects the final relation.

    The survivor rule (min doc_id per md5(text)) is stated ONCE — the
    ``surv`` CTE derives from ``ex``, and the nested minhash subquery
    reads ``surv`` from the enclosing WITH scope (DuckDB resolves
    outer CTEs inside FROM subqueries) — so the pair-mining corpus and
    the doc→ecan mapping cannot drift apart."""
    return f"""
WITH RECURSIVE ex AS (
  SELECT doc_id, source, text,
         MIN(doc_id) OVER (PARTITION BY md5(text)) AS ecan
  FROM documents
), surv AS (
  SELECT doc_id, text FROM ex WHERE doc_id = ecan
), pairs AS (
  SELECT key_a, key_b
  FROM ({_minhash_oracle(cap=_MINHASH_CAP, src="surv")})
), {_CLOSURE_SQL}, final AS (
  SELECT ex.doc_id, ex.source, COALESCE(c.comp, ex.ecan) AS cluster_id
  FROM ex LEFT JOIN comp c ON c.node = ex.ecan
)
{select_body}
"""


def _tiered_final(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Per-doc (doc_id, source, cluster_id) from the TIERED pipeline:
    exact tier first (min doc_id per md5(text) — a 32-byte-key shuffle,
    the dedup_exact shape), then hot-band-capped MinHash banding over
    the exact-canonical SURVIVORS only, then min-label components.

    This is the production composition the hot-band cap assumes: a
    band bucket overflowing the cap is, overwhelmingly, one template
    repeated verbatim — exactly what the exact tier already collapsed
    — so capping after the exact tier loses only what the cheap tier
    owns.  Scale shape: the text-carrying shuffle happens ONCE (the
    md5 window); banding then runs on the collapsed survivor set, so a
    corpus that is P% verbatim-duplicated costs the uncapped pipeline
    ~(1/(1-P))² more candidate pairs but costs this one nothing extra
    (measured: the uncapped e2e report dies of shuffle-spill disk
    exhaustion on the ×100 replica — a 100%-duplicated corpus — while
    this form completes; SCALE.md round-8)."""
    d = load(spark, sf_dir, "documents")
    # cache() pins the scan + md5-window result: the lineage forks here
    # (the surv branch is consumed EAGERLY by the iterative components
    # loop, the final join lazily afterwards), so without it documents
    # is scanned and window-shuffled twice per query.  MEMORY_AND_DISK
    # spills on big corpora; the _ivf_model cache follows the same
    # convention.
    ex = d.select(
        "doc_id", "source", "text",
        F.min("doc_id").over(W.partitionBy(F.md5("text")))
        .alias("ecan")).cache()
    surv = (ex.filter(F.col("doc_id") == F.col("ecan"))
            .select("doc_id", "text"))
    pairs = minhash_lsh_pairs(surv, "text", "doc_id",
                              max_band_bucket=_MINHASH_CAP,
                              **_MINHASH).select("key_a", "key_b")
    comp = connected_components(pairs, "key_a", "key_b")
    ex = ex.select("doc_id", "source", "ecan")
    return (ex.join(comp, ex["ecan"] == comp["node"], "left")
            .select("doc_id", "source",
                    F.coalesce("comp", "ecan").alias("cluster_id")))


@q("neardup_clusters_capped", ("W2", "J5"),
   oracle=_tiered_oracle("SELECT doc_id, cluster_id FROM final"))
def neardup_clusters_capped(spark: "SparkSession",
                            sf_dir: str) -> "DataFrame":
    """(doc_id, cluster_id) from the tiered production pipeline (see
    ``_tiered_final``): exact duplicates collapse into their group's
    min doc_id, then capped banding clusters the survivors, and every
    document inherits its exact-canonical's near-dup component.  The
    uncapped ``neardup_clusters`` twin is the recall reference; this
    form is the one that survives a template-heavy corpus."""
    return _tiered_final(spark, sf_dir).select("doc_id", "cluster_id")


@q("fuzzy_dedup_report_capped", ("W2", "J5", "A1"), bench=True,
   oracle=_tiered_oracle("""
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN doc_id = cluster_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN doc_id = cluster_id THEN 0 ELSE 1 END)
            AS BIGINT) AS n_removed
FROM final GROUP BY source"""))
def fuzzy_dedup_report_capped(spark: "SparkSession",
                              sf_dir: str) -> "DataFrame":
    """Per-source retention report from the tiered pipeline — the
    numbers a curator reviews, now counting BOTH tiers' removals
    (exact-duplicate collapse + capped near-dup clustering), unlike
    the uncapped ``fuzzy_dedup_report`` whose banding must also carry
    every verbatim copy.  n_docs ≡ n_kept + n_removed per source, and
    Σ n_kept = number of final clusters."""
    cl = _tiered_final(spark, sf_dir)
    keep = (F.col("doc_id") == F.col("cluster_id")).cast("long")
    return (cl.groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum(keep).alias("n_kept"),
                 F.sum(1 - keep).alias("n_removed")))


# =========================================================================
# Incremental dedup: new batch vs standing corpus ([EXT] W2/J5/J3)
# =========================================================================

#: doc_id % _DELTA_MOD == 0 plays the "newly ingested batch" (20%);
#: the rest is the standing, already-indexed corpus.
_DELTA_MOD = 5


def _incremental_oracle(cap: int | None = None) -> str:
    """Cross-corpus replay of the md5-slice MinHash recipe (same
    constants as _minhash_oracle, two relations) + the exact-hash tier
    + the verdict fold — the whole incremental-dedup decision in one
    DuckDB statement.  ``cap`` mirrors the base-side hot-band guard."""
    k, bands, n = (_MINHASH["n_hashes"], _MINHASH["bands"],
                   _MINHASH["shingle_n"])

    def side(rel: str, tag: str) -> str:
        # composed from queries_ext's shared recipe builders — the one
        # source of the oracle-side hash scheme (see their comment)
        return f"""tok_{tag} AS (
  SELECT doc_id, {O_TOKENS.format(c='text')} AS toks FROM {rel}
), sh_{tag} AS (
  SELECT doc_id, {_mh_shingles_sql(n)} AS sh FROM tok_{tag}
), sig_{tag} AS (
  SELECT doc_id, sh,
         {_mh_sigs_sql(k)}
  FROM sh_{tag}
), band_{tag} AS (
  SELECT doc_id, unnest([{_mh_bandkeys_sql(k, bands)}]) AS band
  FROM sig_{tag}
)"""

    return f"""
WITH batch AS (
  SELECT doc_id, text FROM documents WHERE doc_id % {_DELTA_MOD} = 0
), base AS (
  SELECT doc_id, text FROM documents WHERE doc_id % {_DELTA_MOD} <> 0
), exact AS (
  SELECT b.doc_id, MIN(a.doc_id) AS exact_id
  FROM batch b JOIN base a ON md5(b.text) = md5(a.text)
  GROUP BY b.doc_id
), {side('batch', 'b')}, {side('base', 'a')}, band_a_kept AS (
  {f'''SELECT ba.* FROM band_a ba
  JOIN (SELECT band, COUNT(*) AS bn FROM band_a GROUP BY band) bc
    ON ba.band = bc.band WHERE bc.bn <= {cap}''' if cap is not None
   else "SELECT * FROM band_a"}
), cand AS (
  SELECT DISTINCT bb.doc_id AS batch_key, ab.doc_id AS base_key
  FROM band_b bb JOIN band_a_kept ab ON bb.band = ab.band
), scored AS (
  SELECT batch_key, base_key,
         len(list_intersect(sb.sh, sa.sh))
           / len(list_distinct(list_concat(sb.sh, sa.sh))) AS jaccard
  FROM cand
  JOIN sh_b sb ON sb.doc_id = cand.batch_key
  JOIN sh_a sa ON sa.doc_id = cand.base_key
), near AS (
  SELECT batch_key AS doc_id, MIN(base_key) AS near_id,
         MAX(jaccard) AS best_jaccard
  FROM scored WHERE jaccard >= {_MINHASH["threshold"]}
  GROUP BY batch_key
)
SELECT b.doc_id,
       CASE WHEN e.exact_id IS NOT NULL THEN 'exact'
            WHEN nr.near_id IS NOT NULL THEN 'near'
            ELSE 'new' END AS verdict,
       COALESCE(e.exact_id, nr.near_id) AS match_id,
       nr.best_jaccard AS best_jaccard
FROM batch b
LEFT JOIN exact e ON b.doc_id = e.doc_id
LEFT JOIN near nr ON b.doc_id = nr.doc_id
"""


@q("incremental_dedup_batch", ("W2", "J5", "J3"),
   oracle=_incremental_oracle())
def incremental_dedup_batch(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Incremental (delta-vs-corpus) dedup verdicts: each doc of a
    newly ingested batch (doc_id % {mod} == 0) is classified against
    the standing corpus as ``exact`` (byte-identical to a base doc, by
    content hash), ``near`` (MinHash-LSH candidate with Jaccard ≥
    {thr}), or ``new`` — with the minimum matching base doc_id and the
    best candidate Jaccard.  This is THE production dedup regime: a
    100-TB corpus is never re-deduped per ingest; the delta is matched
    against persisted indexes.

    Scale design: tier 1 joins 32-byte md5 keys (never document text);
    tier 2 is operators/dedup.minhash_lsh_cross_pairs — the base-side
    band index and shingle store are the once-per-snapshot persisted
    artifacts, the delta's band relation is size-gate broadcast into
    the band join, and exact-Jaccard verification reads base shingles
    only for candidate keys.  The verdict fold is two left joins from
    the delta, both delta-sized.  The oracle replays every tier —
    hash recipe, banding, cross-candidates, Jaccard, verdict
    precedence — in one DuckDB statement.
    """
    return _incremental_verdicts(spark, sf_dir, cap=None)


def _incremental_verdicts(spark: "SparkSession", sf_dir: str,
                          cap: int | None) -> "DataFrame":
    d = load(spark, sf_dir, "documents")
    batch = d.filter(F.col("doc_id") % _DELTA_MOD == 0)
    base = d.filter(F.col("doc_id") % _DELTA_MOD != 0)
    exact = (batch.select("doc_id", F.md5("text").alias("h"))
             .join(base.select(F.col("doc_id").alias("base_id"),
                               F.md5("text").alias("h")), "h")
             .groupBy("doc_id").agg(F.min("base_id").alias("exact_id")))
    pairs = minhash_lsh_cross_pairs(
        batch, base, "text", "doc_id",
        n_hashes=_MINHASH["n_hashes"], bands=_MINHASH["bands"],
        shingle_n=_MINHASH["shingle_n"], threshold=_MINHASH["threshold"],
        max_band_bucket=cap)
    near = (pairs.groupBy("batch_key")
            .agg(F.min("base_key").alias("near_id"),
                 F.max("jaccard").alias("best_jaccard"))
            .withColumnRenamed("batch_key", "doc_id"))
    return (batch.select("doc_id")
            .join(exact, "doc_id", "left")
            .join(near, "doc_id", "left")
            .select("doc_id",
                    F.when(F.col("exact_id").isNotNull(), F.lit("exact"))
                     .when(F.col("near_id").isNotNull(), F.lit("near"))
                     .otherwise(F.lit("new")).alias("verdict"),
                    F.coalesce("exact_id", "near_id").alias("match_id"),
                    "best_jaccard"))


@q("incremental_dedup_batch_capped", ("W2", "J5", "J3"),
   oracle=_incremental_oracle(cap=_MINHASH_CAP))
def incremental_dedup_batch_capped(spark: "SparkSession",
                                   sf_dir: str) -> "DataFrame":
    """incremental_dedup_batch with the base-side hot-band guard
    engaged (cap={cap}): band buckets holding more than {cap} base
    docs are excluded before the candidate join, bounding candidates
    to batch_bands × cap no matter how template-heavy the standing
    corpus is.  This is the production path — the uncapped twin is the
    recall gate.  Byte-identical ingests are still caught (the md5
    exact tier ignores banding), so the cap's recall loss is confined
    to NEAR-dups of heavily-duplicated templates — exactly the mass
    the intra-corpus capped path routes to the exact tier too
    (SCALE.md: the uncapped cross probe does not finish at ×100; the
    capped one is measured there).
    """
    return _incremental_verdicts(spark, sf_dir, cap=_MINHASH_CAP)


# Interpolate the remaining literal {placeholders} into real __doc__
# values (these docstrings referenced module constants but were never
# .format()ed — the registry docstring lint now guards this).
doc_chunking.__doc__ = doc_chunking.__doc__.format(_CHUNK=_CHUNK,
                                                   _STRIDE=_STRIDE)
vocab_topk.__doc__ = vocab_topk.__doc__.format(_VOCAB_N=_VOCAB_N)
incremental_dedup_batch.__doc__ = incremental_dedup_batch.__doc__.format(
    mod=_DELTA_MOD, thr=_MINHASH["threshold"])
incremental_dedup_batch_capped.__doc__ = \
    incremental_dedup_batch_capped.__doc__.format(cap=_MINHASH_CAP)
