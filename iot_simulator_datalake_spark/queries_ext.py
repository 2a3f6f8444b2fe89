"""Declared queries for the [EXT] + [DOC] operator surface: dedup
family, similarity search, text analysis, SCD1/as-of, JSON access.

Oracle strategy: each Spark operator composition has a DuckDB twin
generated *from the same constants* (lexicons, regexes, hash recipes)
so the two sides cannot drift.  Hashing is md5-hex (portable); integer
hashes come from the first 15 md5 hex chars parsed base-16 — identical
in Spark (``conv(_,16,10)``) and DuckDB (``('0x'||_)::BIGINT``).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .functions.text import (LANG_LEXICONS, TOKEN_REGEX, fingerprint, ngrams,
                             language_id, quality_score, regex_token_count,
                             tokens)
from .operators.dedup import (exact_dedup, minhash_lsh_pairs,
                              ngram_jaccard_pairs, simhash, SIMHASH_BITS)
from .operators.asof import asof_join
from .operators.hints import maybe_broadcast
from .operators.scd import scd1_current
from .operators.similarity import (brute_force_topk,
                                   embedding_neardup_pairs, lsh_bucket_topk)
from .queries import load, q

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession

# -- shared DuckDB fragments ----------------------------------------------

#: whitespace tokens, lowercased, empties dropped (functions.text.tokens)
O_TOKENS = r"list_filter(string_split_regex(lower({c}), '\s+'), x -> x <> '')"


def o_lex_array(words) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


# =========================================================================
# Text analysis (F9, [EXT])
# =========================================================================

def _lang_oracle() -> str:
    score = {lang: f"len(list_intersect(toks, {o_lex_array(words)}))"
             for lang, words in sorted(LANG_LEXICONS.items())}
    best = "greatest(" + ", ".join(score.values()) + ")"
    case = "CASE " + " ".join(
        f"WHEN {score[lang]} = best THEN '{lang}'"
        for lang in sorted(score)) + " END"
    return f"""
WITH tok AS (
  SELECT doc_id, lang AS lang_label, {O_TOKENS.format(c='text')} AS toks
  FROM documents
), scored AS (
  SELECT doc_id, lang_label, toks, {best} AS best FROM tok
)
SELECT doc_id, lang_label,
       CASE WHEN best > 0 THEN {case} ELSE 'und' END AS lang_pred
FROM scored
"""


@q("text_language_id", ("F9",), oracle=_lang_oracle())
def text_language_id(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Heuristic language ID over documents (lexicon-overlap argmax,
    deterministic alphabetical tie-break).  Map-only: no shuffle."""
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", F.col("lang").alias("lang_label"),
                    language_id(F.col("text")).alias("lang_pred"))


_EN = o_lex_array(LANG_LEXICONS["en"])

@q("text_quality_score", ("F9",), bench=True, oracle=f"""
WITH tok AS (
  SELECT doc_id, text, {O_TOKENS.format(c='text')} AS toks FROM documents
), m AS (
  SELECT doc_id,
         len(toks) AS n_tok,
         length(text) AS n_chars,
         len(list_intersect(toks, {_EN})) AS stop_hits
  FROM tok
)
SELECT doc_id,
       CAST(least(n_tok * 5000, 1000000)
            + 1000000 - least((abs(n_chars - 5 * (n_tok + 1)) * 1000000)
                              // (5 * (n_tok + 1)), 1000000)
            + least(stop_hits * 250000, 1000000)
          AS DOUBLE) / 3000000.0 AS quality
FROM m
""")
def text_quality_score(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Pre-training quality gate: length saturation + token-shape +
    stopword-ratio blend, one pass, no Python."""
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", quality_score(F.col("text")).alias("quality"))


@q("text_char_entropy", ("F9", "A1"), oracle="""
WITH ch AS (
  SELECT doc_id, UNNEST(string_split(text, '')) AS c FROM documents
), cnt AS (
  SELECT doc_id, c, COUNT(*) AS k
  FROM ch WHERE len(c) > 0 GROUP BY 1, 2
), wn AS (
  SELECT doc_id, k, SUM(k) OVER (PARTITION BY doc_id) AS n FROM cnt
), t AS (
  SELECT doc_id, n,
         CAST(ROUND(CAST(k AS DOUBLE) *
                    log2(CAST(n AS DOUBLE) / CAST(k AS DOUBLE))
                    * 1000) AS BIGINT) AS ti
  FROM wn
)
SELECT doc_id,
       CAST(SUM(ti) AS DOUBLE) /
         (CAST(MAX(n) AS DOUBLE) * 1000.0) AS entropy_bits
FROM t GROUP BY 1
""")
def text_char_entropy(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Shannon character entropy per document (bits/char) — the classic
    gibberish / boilerplate / repeated-text signal in corpus curation:
    natural prose sits ~4 bits, single-char spam near 0, random noise
    near log2(alphabet).

    Shape: chars explode to rows, per-(doc,char) counts combine
    map-side, the per-doc total is a window over the already-collapsed
    count relation (≤ |alphabet| rows per doc, NOT the char stream),
    and one final per-doc sum.  All shuffles carry counts, never text.

    Determinism: each term k·log2(n/k) quantizes to an integer
    milli-bit BEFORE summation, so the per-doc sum is exact and
    order-independent; a raw double Σ p·log p would differ between
    engines in final ulps (both summation order and libm log2 differ).
    The 1e3 quantum dwarfs any libm ulp disagreement on the term
    itself (~1e-9 for these magnitudes)."""
    d = load(spark, sf_dir, "documents")
    ch = (d.select("doc_id",
                   F.explode(F.split(F.col("text"), "")).alias("c"))
          .filter(F.length("c") > 0))
    cnt = ch.groupBy("doc_id", "c").agg(F.count(F.lit(1)).alias("k"))
    n = F.sum("k").over(W.partitionBy("doc_id"))
    t = cnt.select(
        "doc_id", n.alias("n"),
        F.round(F.col("k").cast("double") *
                F.log2(n.cast("double") / F.col("k").cast("double"))
                * 1000).cast("bigint").alias("ti"))
    return (t.groupBy("doc_id")
            .agg((F.sum("ti").cast("double") /
                  (F.max("n").cast("double") * 1000.0))
                 .alias("entropy_bits")))


@q("text_token_stats", ("F9",), oracle=f"""
SELECT doc_id,
       len({O_TOKENS.format(c='text')})::INT AS ws_tokens,
       len(regexp_extract_all(text, '{TOKEN_REGEX}'))::INT AS bpe_tokens,
       length(text)::INT AS n_chars
FROM documents
""")
def text_token_stats(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Token counting: whitespace tokens + BPE-ish regex tokens — the
    budget accounting pass of a training-data pipeline."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(tokens(F.col("text"))).alias("ws_tokens"),
        regex_token_count(F.col("text")).alias("bpe_tokens"),
        F.length("text").alias("n_chars"))


@q("text_fingerprint", ("F9", "W2"), oracle=f"""
WITH tok AS (
  SELECT doc_id, {O_TOKENS.format(c='text')} AS toks FROM documents
)
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fp
FROM tok
""")
def text_fingerprint(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Order-insensitive document fingerprint (rolling-hash family):
    md5 of the sorted distinct token set."""
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", fingerprint(F.col("text")).alias("fp"))


# =========================================================================
# Dedup family ([EXT] W2, J5)
# =========================================================================

@q("dedup_exact", ("W2",), oracle="""
SELECT doc_id, n_dupes FROM (
  SELECT doc_id,
         ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY md5(text)) AS n_dupes
  FROM documents
) WHERE rn = 1
""")
def dedup_exact(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Exact (hash-groupBy) dedup: one kept row per distinct content;
    the shuffle key is md5(text) (32 bytes), never the document."""
    d = load(spark, sf_dir, "documents")
    kept = exact_dedup(
        d.withColumn("n_dupes", F.count(F.lit(1)).over(
            W.partitionBy(F.md5("text")))),
        content_col="text", key_col="doc_id")
    return kept.select("doc_id", "n_dupes")


_MINHASH = dict(n_hashes=6, bands=3, shingle_n=2, threshold=0.3)


# -- shared DuckDB twins of the MinHash recipe (operators/dedup.py) ------
# These three builders are the SINGLE source of the oracle-side hash
# recipe; every MinHash oracle (intra-corpus here, cross-corpus in
# queries_training._incremental_oracle) must compose them so a change
# to the slice width / band-key separator / whole-doc-shingle fallback
# cannot leave one oracle certifying a stale recipe.

def _mh_sigs_sql(k: int) -> str:
    """K slice-min signature columns over a shingle-list column ``sh``
    — the one-md5-split-into-K-20-bit-slices trick
    (minhash_signatures)."""
    return ",\n         ".join(
        f"list_min(list_transform(sh, s -> substr(md5(s), {i * 5 + 1}, 5)))"
        f" AS sig_{i}"
        for i in range(k))


def _mh_bandkeys_sql(k: int, bands: int) -> str:
    """DuckDB list literal body of the ``bands`` band keys over
    sig_0..sig_{k-1} — twin of _band_key_col's md5('b|sig|sig…')."""
    rpb = k // bands
    return ", ".join(
        "md5('{b}|' || ".format(b=b)
        + " || '|' || ".join(f"sig_{b * rpb + r}" for r in range(rpb)) + ")"
        for b in range(bands))


def _mh_shingles_sql(n: int) -> str:
    """Distinct word-``n``-gram shingle list over a token-list column
    ``toks`` — twin of functions.text.ngrams (incl. the ≤n-token
    whole-doc fallback)."""
    return f"""list_distinct(CASE WHEN len(toks) <= {n}
           THEN [array_to_string(toks, ' ')]
           ELSE [array_to_string(toks[i:i+{n - 1}], ' ')
                 for i in generate_series(1, len(toks) - {n - 1})]
         END)"""


def _minhash_oracle(cap: int | None = None,
                    src: str = "documents") -> str:
    """``src`` is the relation the pairs are mined from — a table name
    or a parenthesized subquery exposing (doc_id, text); the tiered
    dedup twins pass the exact-canonical survivor set."""
    k, bands, n = (_MINHASH["n_hashes"], _MINHASH["bands"],
                   _MINHASH["shingle_n"])
    return f"""
WITH tok AS (
  SELECT doc_id, {O_TOKENS.format(c='text')} AS toks FROM {src}
), sh AS (
  SELECT doc_id, {_mh_shingles_sql(n)} AS sh
  FROM tok
), sig AS (
  SELECT doc_id, sh,
         {_mh_sigs_sql(k)}
  FROM sh
), banded0 AS (
  SELECT doc_id, sh, unnest([{_mh_bandkeys_sql(k, bands)}]) AS band FROM sig
), banded AS (
  {"SELECT b.* FROM banded0 b JOIN (SELECT band, COUNT(*) AS bn "
   "FROM banded0 GROUP BY band) bc ON b.band = bc.band "
   f"WHERE bc.bn <= {cap}" if cap is not None
   else "SELECT * FROM banded0"}
), cand AS (
  SELECT DISTINCT a.doc_id AS key_a, b.doc_id AS key_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.doc_id < b.doc_id
), scored AS (
  SELECT key_a, key_b,
         len(list_intersect(sa.sh, sb.sh))
           / len(list_distinct(list_concat(sa.sh, sb.sh))) AS jaccard
  FROM cand
  JOIN sh sa ON sa.doc_id = cand.key_a
  JOIN sh sb ON sb.doc_id = cand.key_b
)
SELECT key_a, key_b, jaccard FROM scored
WHERE jaccard >= {_MINHASH["threshold"]}
"""


@q("dedup_minhash_lsh", ("J5", "W2"), oracle=_minhash_oracle())
def dedup_minhash_lsh(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """MinHash-LSH near-duplicate pairs: shingle → 6 min-hashes → 3 band
    keys → band-bucket equi-join → exact Jaccard on candidates only.
    The only shuffle is on the band hash; candidate count is bounded by
    band-bucket sizes — which is exactly why this UNCAPPED form is the
    RECALL REFERENCE, not the production path: a template shared by B
    docs emits B² candidates (measured ×100 kill, X100_LEDGER
    `uncapped-twin-kill`).  ``dedup_minhash_lsh_capped`` is the
    headline/production form (VERDICT r8 #1 promoted it)."""
    d = load(spark, sf_dir, "documents")
    return minhash_lsh_pairs(d, "text", "doc_id", **_MINHASH)


#: Hot-band cap for the production dedup path (VERDICT r2 #2 /
#: SCALE.md boilerplate pathology): a band bucket with B members emits
#: B² candidate pairs, so one boilerplate template shared by 10⁶ docs
#: would cost 10¹² pairs.  Buckets past the cap are dropped here —
#: their members are exact/near-identical clusters that the cheap
#: exact/fingerprint dedup tier already collapses (fuzzy_dedup_report
#: runs that tier first), so recall loss is confined to docs the
#: upstream tier owns anyway.
_MINHASH_CAP = 8


@q("dedup_minhash_lsh_capped", ("J5", "W2"), bench=True,
   oracle=_minhash_oracle(cap=_MINHASH_CAP))
def dedup_minhash_lsh_capped(spark: "SparkSession",
                             sf_dir: str) -> "DataFrame":
    """MinHash-LSH near-dup pairs with the hot-band guard engaged: band
    buckets holding more than {cap} docs are excluded before the
    bucket self-join, bounding worst-case candidates to buckets × cap²
    regardless of how template-heavy the corpus is.  Same plan as
    dedup_minhash_lsh plus one band-count aggregate (tiny: one row per
    distinct band hash) joined back onto the banded relation.
    """
    d = load(spark, sf_dir, "documents")
    return minhash_lsh_pairs(d, "text", "doc_id",
                             max_band_bucket=_MINHASH_CAP, **_MINHASH)


def _simhash_oracle() -> str:
    votes = ",\n       ".join(
        f"list_sum(list_transform(hs, h -> CASE WHEN ((h >> {i}) & 1) = 1 "
        f"THEN 1 ELSE -1 END)) AS v{i}" for i in range(SIMHASH_BITS))
    fp = " + ".join(
        f"(CASE WHEN v{i} > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(SIMHASH_BITS))
    return f"""
WITH tok AS (
  SELECT doc_id, {O_TOKENS.format(c='text')} AS toks FROM documents
), h AS (
  SELECT doc_id, list_transform(toks,
           t -> ('0x' || substr(md5(t), 1, 15))::BIGINT) AS hs
  FROM tok
), v AS (
  SELECT doc_id,
       {votes}
  FROM h
)
SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM v
"""


@q("dedup_simhash", ("W2",), oracle=_simhash_oracle())
def dedup_simhash(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """16-bit SimHash fingerprint per document (bit-majority of 60-bit
    md5-derived token hashes).  Map-only; near-dups cluster by
    fingerprint or small hamming distance."""
    d = load(spark, sf_dir, "documents")
    return simhash(d, "text", "doc_id")


_JACCARD = dict(shingle_n=2, threshold=0.2)


@q("dedup_ngram_jaccard", ("J5", "F11"), oracle=f"""
WITH tok AS (
  SELECT doc_id, lang, {O_TOKENS.format(c='text')} AS toks FROM documents
), sh AS (
  SELECT doc_id, lang, list_distinct(CASE WHEN len(toks) <= 2
           THEN [array_to_string(toks, ' ')]
           ELSE [array_to_string(toks[i:i+1], ' ')
                 for i in generate_series(1, len(toks) - 1)]
         END) AS sh
  FROM tok
)
SELECT a.doc_id AS key_a, b.doc_id AS key_b,
       len(list_intersect(a.sh, b.sh))
         / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
WHERE len(list_intersect(a.sh, b.sh))
        / len(list_distinct(list_concat(a.sh, b.sh)))
      >= {_JACCARD["threshold"]}
""")
def dedup_ngram_jaccard(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Blocked n-gram-Jaccard similarity join (blocked on lang so the
    pair space is Σ block², not corpus²)."""
    d = load(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(d, "text", "doc_id", block_col="lang",
                               **_JACCARD)


@q("text_repetition_ngram", ("F9",), oracle=f"""
WITH tok AS (
  SELECT doc_id, {O_TOKENS.format(c='text')} AS toks FROM documents
), sh AS (
  SELECT doc_id, CASE WHEN len(toks) <= 3
           THEN [array_to_string(toks, ' ')]
           ELSE [array_to_string(toks[i:i+2], ' ')
                 for i in generate_series(1, len(toks) - 2)]
         END AS sh
  FROM tok
)
SELECT doc_id,
       CAST(len(sh) AS INT) AS n_ngrams,
       CAST(len(list_distinct(sh)) AS INT) AS n_distinct,
       (len(sh) - len(list_distinct(sh))) /
         CAST(len(sh) AS DOUBLE) AS rep_ratio
FROM sh
""")
def text_repetition_ngram(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Duplicate-trigram fraction per document — the Gopher-style
    repetition filter (high rep_ratio ⇒ boilerplate / looped text /
    listicles; a core pre-training quality rule alongside
    ``text_quality_score`` and ``text_char_entropy``).  Map-only: the
    shingle array never explodes, both counts are array-local, and the
    ratio is int/int in identical IEEE division on both engines.

    Counting detail: ``ngrams()`` returns the DISTINCT shingle set (the
    right unit for MinHash/Jaccard), so the raw trigram total comes
    from arithmetic — max(len−2, 1) — which equals the oracle's
    pre-distinct list length including the ≤3-token whole-doc
    fallback."""
    d = load(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n_all = F.greatest(F.size(toks) - 2, F.lit(1))
    n_dist = F.size(ngrams(toks, 3))
    return d.select(
        "doc_id",
        n_all.alias("n_ngrams"),
        n_dist.alias("n_distinct"),
        # raw int quotient (no ROUND) — cross-engine boundary hazard
        ((n_all - n_dist) / n_all.cast("double")).alias("rep_ratio"))


# =========================================================================
# Similarity search over embeddings ([EXT] F10, J5/W3)
# =========================================================================

# Cosine in integer MICRO-UNITS (floor(cos*1e6), BIGINT) — the
# repo-wide determinism recipe (_O_SEM_COS, queries_curation.py):
# fractional ROUND(...,6) of a raw double quotient was the
# HALF_UP-vs-scaled-double cross-engine boundary class.
_O_COS = ("CAST(floor(list_dot_product(a.vec, b.vec) / "
          "(sqrt(list_dot_product(a.vec, a.vec)) * "
          "sqrt(list_dot_product(b.vec, b.vec))) * 1e6) AS BIGINT)")

#: zero-norm vectors are excluded on BOTH engines (the Spark operators
#: filter norm > 0 — see operators/similarity.exact_topk): without the
#: WHERE, a degenerate all-zero embedding would make DuckDB raise on
#: CAST(floor(NaN) AS BIGINT) while Spark silently dropped it
_O_EMB = ("SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec "
          "FROM embeddings "
          "WHERE list_dot_product(CAST(embedding AS DOUBLE[]), "
          "CAST(embedding AS DOUBLE[])) > 0")


@q("similarity_topk_bruteforce", ("F10", "W3", "J5"), bench=True, oracle=f"""
WITH emb AS ({_O_EMB}),
probes AS (SELECT * FROM emb WHERE vec_id < 10),
scored AS (
  SELECT b.vec_id AS probe_id, a.vec_id AS vec_id, {_O_COS} AS score_u
  FROM emb a, probes b
  WHERE a.vec_id <> b.vec_id
)
SELECT probe_id, vec_id, score_u, rank::INT AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY probe_id ORDER BY score_u DESC, vec_id) AS rank
  FROM scored
) WHERE rank <= 5
""")
def similarity_topk_bruteforce(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Exact cosine top-5 for 10 probe vectors: probes broadcast, corpus
    never shuffles, per-partition partial top-K before the rank."""
    e = load(spark, sf_dir, "embeddings")
    return brute_force_topk(e, e.filter(F.col("vec_id") < 10), k=5)


@q("similarity_topk_lsh", ("F10", "W3", "J5"), oracle=f"""
WITH emb AS ({_O_EMB}),
bucketed AS (
  SELECT vec_id, vec,
         (CASE WHEN vec[1] >= 0 THEN 1 ELSE 0 END)
       + (CASE WHEN vec[2] >= 0 THEN 2 ELSE 0 END)
       + (CASE WHEN vec[3] >= 0 THEN 4 ELSE 0 END)
       + (CASE WHEN vec[4] >= 0 THEN 8 ELSE 0 END) AS bucket
  FROM emb
),
probes AS (SELECT * FROM bucketed WHERE vec_id < 10),
scored AS (
  SELECT b.vec_id AS probe_id, a.vec_id AS vec_id, {_O_COS} AS score_u
  FROM bucketed a JOIN probes b ON a.bucket = b.bucket
  WHERE a.vec_id <> b.vec_id
)
SELECT probe_id, vec_id, score_u, rank::INT AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY probe_id ORDER BY score_u DESC, vec_id) AS rank
  FROM scored
) WHERE rank <= 5
""")
def similarity_topk_lsh(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Approximate top-5 via sign-LSH buckets (16 buckets from 4 sign
    bits): each probe scores ~1/16 of the corpus."""
    e = load(spark, sf_dir, "embeddings")
    return lsh_bucket_topk(e, e.filter(F.col("vec_id") < 10), k=5,
                           n_planes=4)


# =========================================================================
# SCD1 / as-of / JSON access / sort-limit ([DOC] surface)
# =========================================================================

_O_COS_EC = ("CAST(floor(list_dot_product(e.vec, c.cent_vec) / "
             "(sqrt(list_dot_product(e.vec, e.vec)) * "
             "sqrt(list_dot_product(c.cent_vec, c.cent_vec))) "
             "* 1e6) AS BIGINT)")


@q("similarity_topk_ivf", ("F10", "W3", "J5"), oracle=f"""
WITH emb AS ({_O_EMB}),
cents AS (
  SELECT vec_id AS cent_id, vec AS cent_vec FROM emb
  ORDER BY vec_id LIMIT 8
),
assign AS (
  SELECT vec_id, vec, cluster FROM (
    SELECT e.vec_id, e.vec, c.cent_id AS cluster,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
               ORDER BY -{_O_COS_EC}, c.cent_id) AS rn
    FROM emb e CROSS JOIN cents c
  ) WHERE rn = 1
),
probes AS (
  SELECT vec_id AS probe_id, vec, cluster
  FROM assign WHERE vec_id < 10
),
scored AS (
  SELECT b.probe_id, a.vec_id, {_O_COS} AS score_u
  FROM assign a JOIN probes b ON a.cluster = b.cluster
  WHERE a.vec_id <> b.probe_id
)
SELECT probe_id, vec_id, score_u, rank::INT AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY probe_id ORDER BY score_u DESC, vec_id) AS rank
  FROM scored
) WHERE rank <= 5
""")
def similarity_topk_ivf(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """IVF ANN top-5: corpus partitioned into 8 deterministic centroid
    cells, probes score only their own cell (~1/8 of the corpus).  The
    second scale path beside sign-LSH; cell assignment is reusable
    across probe batches."""
    from .operators.similarity import ivf_topk
    e = load(spark, sf_dir, "embeddings")
    return ivf_topk(e, e.filter(F.col("vec_id") < 10), k=5, n_centroids=8)


@q("embedding_neardup_pairs", ("F10", "J5", "W2"), oracle=f"""
WITH emb AS ({_O_EMB}),
bucketed AS (
  SELECT vec_id AS id, vec,
         (CASE WHEN vec[1] >= 0 THEN 1 ELSE 0 END)
       + (CASE WHEN vec[2] >= 0 THEN 2 ELSE 0 END)
       + (CASE WHEN vec[3] >= 0 THEN 4 ELSE 0 END)
       + (CASE WHEN vec[4] >= 0 THEN 8 ELSE 0 END) AS bucket
  FROM emb
)
SELECT a.id AS id_a, b.id AS id_b, {_O_COS} AS cosine_u
FROM bucketed a JOIN bucketed b
  ON a.bucket = b.bucket AND a.id < b.id
WHERE {_O_COS} >= 350000
""")
def embedding_neardup_q(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Embedding-cosine near-duplicate pairs within sign-LSH buckets —
    the vector member of the dedup family (threshold tuned to the test
    corpus's neighbour density).  Deliberately uncapped: the recall
    twin; the production path is ``embedding_neardup_capped`` (the
    ×100 pathology of this one is measured in SCALE.md)."""
    e = load(spark, sf_dir, "embeddings")
    return embedding_neardup_pairs(e, threshold_micro=350_000, n_planes=4)


_ENDUP_CAP = 32


@q("embedding_neardup_capped", ("F10", "J5", "W2"), oracle=f"""
WITH emb AS ({_O_EMB}),
bucketed0 AS (
  SELECT vec_id AS id, vec,
         (CASE WHEN vec[1] >= 0 THEN 1 ELSE 0 END)
       + (CASE WHEN vec[2] >= 0 THEN 2 ELSE 0 END)
       + (CASE WHEN vec[3] >= 0 THEN 4 ELSE 0 END)
       + (CASE WHEN vec[4] >= 0 THEN 8 ELSE 0 END) AS bucket
  FROM emb
), bc AS (
  SELECT bucket, COUNT(*) AS bn FROM bucketed0 GROUP BY bucket
), bucketed AS (
  SELECT b0.* FROM bucketed0 b0 JOIN bc USING (bucket)
  WHERE bc.bn <= {_ENDUP_CAP}
)
SELECT a.id AS id_a, b.id AS id_b, {_O_COS} AS cosine_u
FROM bucketed a JOIN bucketed b
  ON a.bucket = b.bucket AND a.id < b.id
WHERE {_O_COS} >= 350000
""")
def embedding_neardup_capped(spark: "SparkSession",
                             sf_dir: str) -> "DataFrame":
    """The PRODUCTION vector near-dup path: same sign-LSH bucket join
    as ``embedding_neardup_pairs`` with the hot-bucket cap engaged
    (``max_bucket={cap}``), bounding pair cost to buckets×cap² no
    matter how duplicated the corpus is — the vector twin of
    ``dedup_minhash_lsh_capped``.  At the gate scale the cap really
    discriminates (sf0.01 bucket sizes span 25–42, so some buckets
    drop), which is what certifies the cap SEMANTICS, not just the
    happy path; over-cap buckets route their (byte-identical)
    duplicate mass through md5-exact dedup in production.
    """
    e = load(spark, sf_dir, "embeddings")
    return embedding_neardup_pairs(e, threshold_micro=350_000, n_planes=4,
                                   max_bucket=_ENDUP_CAP)


@q("scd1_current_state", ("W1",), oracle="""
SELECT user_id, event_id, ts, event_type, value
FROM (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1 AND event_type <> 'error'
""")
def scd1_current_state(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """SCD Type 1 current state from a CDC-style stream: latest row per
    key, soft-deleted keys dropped (events whose latest op is 'error'
    stand in for _is_deleted — README_DBT.md:243)."""
    e = (load(spark, sf_dir, "events")
         .withColumn("_is_deleted", F.col("event_type") == "error"))
    return (scd1_current(e, key="user_id", order_col="ts",
                         tiebreak="event_id")
            .select("user_id", "event_id", "ts", "event_type", "value"))


@q("asof_threshold_join", ("J4",), oracle="""
WITH clicks AS (
  SELECT event_id, user_id, ts, value FROM events
  WHERE event_type = 'click'
), purch AS (
  SELECT user_id, ts, MAX(value) AS purchase_value
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id, ts
)
SELECT c.event_id, c.user_id, c.ts, c.value,
       p.purchase_value AS last_purchase_value
FROM clicks c
ASOF LEFT JOIN purch p
  ON c.user_id = p.user_id AND p.ts <= c.ts
""")
def asof_threshold_join(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """As-of join: each click gets the user's most recent prior purchase
    value (union-window composition — one shuffle, no range explosion;
    operators/asof.py)."""
    e = load(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click") \
              .select("event_id", "user_id", "ts", "value")
    purch = (e.filter(F.col("event_type") == "purchase")
             .groupBy("user_id", "ts")
             .agg(F.max("value").alias("purchase_value")))
    out = asof_join(clicks, purch, on="user_id", ts="ts",
                    payload=["purchase_value"])
    return out.withColumnRenamed("right_purchase_value",
                                 "last_purchase_value")


@q("json_field_access", ("F8",), oracle="""
SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
FROM events
""")
def json_field_access(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """CDC-payload JSON field extraction (README_DBT.md:163-169):
    get_json_object stays JVM-side."""
    e = load(spark, sf_dir, "events")
    return e.select("event_id",
                    F.get_json_object("props", "$.k").cast("int").alias("k"))


@q("kafka_envelope_parse", ("S8", "F8"), oracle="""
SELECT event_id, user_id, event_type,
       CAST(ROUND(value * 100) AS BIGINT) AS value_cents,
       'events' AS topic,
       CAST(user_id % 8 AS INT) AS partition,
       event_id AS "offset"
FROM events
""")
def kafka_envelope_parse(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Kafka ingress contract end-to-end without a broker (VERDICT r2
    #5): events are staged into the exact envelope a Spark Kafka read
    yields — binary key/value, topic, partition, offset, timestamp
    (sources/kafka.py KAFKA_ENVELOPE) — then decoded back through
    :func:`sources.kafka.parse_kafka_json` (binary → string →
    from_json → typed columns + metadata propagation).  The oracle pins
    the round-trip law parse(to_json(x)) = x plus the metadata columns.
    Payload carries value_cents (bigint), not the raw double, so the
    JSON round-trip stays exact by construction; real deployments
    encode decimals as strings for the same reason.
    """
    from pyspark.sql import types as T
    from .sources.kafka import parse_kafka_json

    ev = load(spark, sf_dir, "events")
    payload = F.to_json(F.struct(
        F.col("event_id"), F.col("user_id"), F.col("event_type"),
        F.round(F.col("value") * 100).cast("long").alias("value_cents")))
    raw = ev.select(
        F.col("user_id").cast("string").cast("binary").alias("key"),
        payload.cast("binary").alias("value"),
        F.lit("events").alias("topic"),
        (F.col("user_id") % 8).cast("int").alias("partition"),
        F.col("event_id").alias("offset"),
        F.col("ts").alias("timestamp"))
    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value_cents", T.LongType()),
    ])
    return (parse_kafka_json(raw, schema)
            .select("event_id", "user_id", "event_type", "value_cents",
                    "topic", "partition", "offset"))


@q("multimodal_features", ("F10",), oracle="""
SELECT doc_id,
       octet_length(CAST(text AS BLOB)) AS n_bytes,
       md5(text) AS digest,
       64 + (('0x' || substr(md5(text), 1, 2))::INT % 192) AS width,
       64 + (('0x' || substr(md5(text), 3, 2))::INT % 192) AS height
FROM documents
""")
def multimodal_features(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Multimodal binary-column plumbing: text bytes stand in for media
    payloads (binary col + typed metadata struct), features extracted by
    an Arrow-batched mapInPandas pass (multimodal/transforms.py).  The
    decode step is a deterministic stub (md5-derived dims) — which makes
    even the Pandas-UDF path oracle-checkable."""
    from .multimodal import attach_payload, extract_features
    d = load(spark, sf_dir, "documents")
    wrapped = attach_payload(d, "text", media_type="image", fmt="raw")
    return extract_features(wrapped, id_col="doc_id")


#: fixture image geometry for the decode round-trip gate — width 7 on
#: purpose: 7*3 = 21-byte rows exercise BMP's 4-byte stride padding
_IMG_W, _IMG_H = 7, 5


@q("multimodal_decode_image", ("F10",), oracle=f"""
WITH d AS (
  SELECT doc_id,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))::INT AS seed
  FROM documents
), px AS (
  SELECT doc_id,
         (seed + 7 * x.x + 13 * y.y + c.c) % 256 AS b,
         ((y.y * {_IMG_W} + x.x) * 3 + c.c) AS idx
  FROM d
  CROSS JOIN (SELECT UNNEST(range({_IMG_W})) AS x) x
  CROSS JOIN (SELECT UNNEST(range({_IMG_H})) AS y) y
  CROSS JOIN (SELECT UNNEST(range(3)) AS c) c
)
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'ppm' END AS format,
       {_IMG_W} AS width, {_IMG_H} AS height,
       CAST(COUNT(*) AS BIGINT) AS tensor_len,
       CAST(SUM(b) AS BIGINT) AS byte_sum,
       CAST(SUM(idx * b) AS BIGINT) AS pos_checksum
FROM px GROUP BY 1, 2
""")
def multimodal_decode_image(spark: "SparkSession",
                            sf_dir: str) -> "DataFrame":
    """REAL image decode, oracle-gated end-to-end (VERDICT r8 #8):
    every document gets a deterministic synthetic image — pixel byte
    (x, y, c) = (seed + 7x + 13y + c) mod 256, seed = first md5(doc_id)
    byte — encoded as a genuine on-disk format (even doc_ids → 24bpp
    bottom-up BMP with stride padding; odd → binary P6 PPM), then
    decoded by the stdlib codecs in multimodal/transforms.py
    (``decode_image``) back to the [0,1] float tensor.

    The gate compares position-sensitive checksums (Σ b and Σ idx·b
    over the decoded bytes) against the pattern's closed form in
    DuckDB: a BGR↔RGB swap, bottom-up flip, stride-padding slip, or
    off-by-one in either codec shifts ``pos_checksum`` and fails the
    hash.  Compressed formats still raise NotImplementedError inside
    the operator (no fake pixels); this query certifies the formats
    the stdlib CAN decode.

    Scale shape: encode is the test-fixture stage (production payloads
    arrive from the lake); decode is one Arrow-batched mapInPandas
    pass; the checksum explode is ×(w·h·3) of a fixed tiny geometry —
    gate cost, not production cost."""
    import hashlib

    import pandas as pd

    from .multimodal import decode_image
    from .multimodal.transforms import encode_bmp, encode_ppm

    d = load(spark, sf_dir, "documents").select("doc_id")
    w_, h_ = _IMG_W, _IMG_H

    def enc(batches):
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                seed = int(hashlib.md5(str(did).encode())
                           .hexdigest()[:2], 16)
                rgb = bytes(((seed + 7 * x + 13 * y + c) % 256)
                            for y in range(h_) for x in range(w_)
                            for c in range(3))
                payloads.append(encode_bmp(w_, h_, rgb) if did % 2 == 0
                                else encode_ppm(w_, h_, rgb))
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values,
                                "payload": payloads})

    enc_df = d.mapInPandas(enc, schema="doc_id long, payload binary")
    dec = decode_image(enc_df, id_col="doc_id")
    byte = F.round(F.col("v") * 255).cast("long")
    ex = dec.select("doc_id", "width", "height",
                    F.posexplode("tensor").alias("idx", "v"))
    return (ex.groupBy("doc_id", "width", "height")
            .agg(F.count(F.lit(1)).alias("tensor_len"),
                 F.sum(byte).alias("byte_sum"),
                 F.sum(F.col("idx") * byte).alias("pos_checksum"))
            .select("doc_id",
                    F.when(F.col("doc_id") % 2 == 0, "bmp")
                    .otherwise("ppm").alias("format"),
                    "width", "height", "tensor_len", "byte_sum",
                    "pos_checksum"))


#: fixture audio geometry for the decode round-trip gate
_AUD_N, _AUD_RATE = 200, 16000


@q("multimodal_decode_audio", ("F10",), oracle=f"""
WITH d AS (
  SELECT doc_id,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))::INT AS seed
  FROM documents
), s AS (
  SELECT doc_id, i.i AS i,
         ((seed + 11 * i.i) % 65536) - 32768 AS amp
  FROM d CROSS JOIN (SELECT UNNEST(range({_AUD_N})) AS i) i
)
SELECT doc_id, {_AUD_RATE} AS sample_rate, 1 AS n_channels,
       CAST({_AUD_N} AS BIGINT) AS n_samples,
       CAST(SUM(amp) AS BIGINT) AS sum_amp,
       CAST(SUM(amp * amp) AS BIGINT) AS sumsq_amp,
       CAST(SUM(i * amp) AS BIGINT) AS pos_checksum
FROM s GROUP BY 1
""")
def multimodal_decode_audio(spark: "SparkSession",
                            sf_dir: str) -> "DataFrame":
    """REAL audio decode, oracle-gated end-to-end — the audio analog
    of ``multimodal_decode_image``: every document gets a
    deterministic synthetic 16-bit PCM waveform (sample i =
    ((seed + 11·i) mod 65536) − 32768, seed = first md5(doc_id) byte),
    written as a genuine RIFF/WAVE file (stdlib ``wave`` writer), then
    decoded by ``multimodal.transforms.decode_audio`` back to the
    [−1, 1] float waveform.

    The gate compares Σ amp, Σ amp² (energy — the RMS numerator a real
    audio-quality filter uses) and the position-sensitive Σ i·amp
    against the pattern's closed form in DuckDB: byte-order, container
    offset, or interleave mistakes in either codec shift the sums.
    Compressed audio still raises NotImplementedError per payload.

    Scale shape mirrors the image gate: encode is the fixture stage,
    decode one Arrow-batched mapInPandas pass, the checksum explode
    ×``_AUD_N`` of a fixed tiny geometry — gate cost, not production
    cost."""
    import hashlib
    import struct

    import pandas as pd

    from .multimodal.transforms import decode_audio, encode_wav

    d = load(spark, sf_dir, "documents").select("doc_id")
    n, rate = _AUD_N, _AUD_RATE

    def enc(batches):
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                seed = int(hashlib.md5(str(did).encode())
                           .hexdigest()[:2], 16)
                samples = struct.pack(
                    f"<{n}h", *(((seed + 11 * i) % 65536) - 32768
                                for i in range(n)))
                payloads.append(encode_wav(rate, 1, samples))
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values,
                                "payload": payloads})

    enc_df = d.mapInPandas(enc, schema="doc_id long, payload binary")
    dec = decode_audio(enc_df, id_col="doc_id")
    amp = F.round(F.col("v") * 32768).cast("long")
    ex = dec.select("doc_id", "sample_rate", "n_channels", "n_samples",
                    F.posexplode("waveform").alias("i", "v"))
    return (ex.groupBy("doc_id", "sample_rate", "n_channels",
                       "n_samples")
            .agg(F.sum(amp).alias("sum_amp"),
                 F.sum(amp * amp).alias("sumsq_amp"),
                 F.sum(F.col("i") * amp).alias("pos_checksum")))


@q("entity_resolution_best_match", ("J5", "F11", "W3"), oracle="""
WITH p AS (
  SELECT c.c_custkey, s.s_suppkey,
         (700000 * (GREATEST(length(c.c_name), length(s.s_name))
                    - levenshtein(c.c_name, s.s_name)))
           // GREATEST(length(c.c_name), length(s.s_name))
       + (300000 * (ABS(CAST(ROUND(c.c_acctbal * 100) AS BIGINT))
                    + ABS(CAST(ROUND(s.s_acctbal * 100) AS BIGINT)) + 100
                    - ABS(CAST(ROUND(c.c_acctbal * 100) AS BIGINT)
                          - CAST(ROUND(s.s_acctbal * 100) AS BIGINT))))
           // (ABS(CAST(ROUND(c.c_acctbal * 100) AS BIGINT))
               + ABS(CAST(ROUND(s.s_acctbal * 100) AS BIGINT)) + 100)
           AS score_u
  FROM customer c JOIN supplier s ON c.c_nationkey = s.s_nationkey
), r AS (
  SELECT c_custkey, s_suppkey, score_u,
         ROW_NUMBER() OVER (PARTITION BY c_custkey
                            ORDER BY score_u DESC, s_suppkey) AS rn
  FROM p
)
SELECT c_custkey AS customer, s_suppkey AS supplier,
       CAST(score_u AS DOUBLE) / 1000000.0 AS match_score
FROM r WHERE rn = 1
""")
def entity_resolution_best_match(spark: "SparkSession",
                                 sf_dir: str) -> "DataFrame":
    """Record linkage: match each customer to its most similar supplier
    account — the canonical entity-resolution pipeline in three moves:
    (1) BLOCK on a cheap equality key (nation) so the pair space is
    Σ block_c × block_s, never |C|×|S|; (2) score candidates with a
    weighted multi-signal blend (name edit-similarity + balance
    proximity — all JVM builtins); (3) keep the argmax per left entity
    via ROW_NUMBER over the INTEGER micro-unit score (doctrine 4: a
    raw double blend differs in the last ulp between engines, which
    would silently flip the argmax near score ties — the failure mode
    quality_score exhibited; exact ties break on supplier key).

    Scale: the blocked join broadcasts the smaller side per block; at
    100 TB with skewed blocks, swap the blocking key for (nation,
    name-prefix) or an LSH band — same downstream shape.  The argmax
    window uses WindowGroupLimit (rank ≤ 1 pushdown), so no full
    per-customer sort materializes."""
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    pairs = c.join(maybe_broadcast(s),
                   c["c_nationkey"] == s["s_nationkey"])
    # name similarity in micro-units: 0.7·(1 − lev/maxlen) =
    # 700000·(maxlen − lev) div maxlen (floor via the mod identity —
    # the numerator becomes exactly divisible, so the division is an
    # exact IEEE op)
    maxlen = F.greatest(F.length("c_name"), F.length("s_name")) \
        .cast("long")
    name_num = (maxlen - F.levenshtein("c_name", "s_name")) * 700000
    name_u = ((name_num - name_num % maxlen) / maxlen).cast("long")
    # balance proximity in micro-units over exact cents:
    # 0.3·(1 − |Δ|/(|a|+|b|+1$)) = 300000·(den − |Δc|) div den,
    # den = |a_c|+|b_c|+100
    c_c = F.round(F.col("c_acctbal") * 100).cast("long")
    s_c = F.round(F.col("s_acctbal") * 100).cast("long")
    den = F.abs(c_c) + F.abs(s_c) + 100
    acct_num = (den - F.abs(c_c - s_c)) * 300000
    acct_u = ((acct_num - acct_num % den) / den).cast("long")
    scored = pairs.select(
        F.col("c_custkey").alias("customer"),
        F.col("s_suppkey").alias("supplier"),
        (name_u + acct_u).alias("score_u"))
    w = W.partitionBy("customer").orderBy(F.col("score_u").desc(),
                                          F.col("supplier"))
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("customer", "supplier",
                    (F.col("score_u").cast("double") / 1000000.0)
                    .alias("match_score")))


_SNM_W = 16  # sorted-neighborhood rank window (± records compared)

#: the ER score in micro-units over (cname, sname, cc, sc) — identical
#: formula to entity_resolution_best_match's, restated over pre-rounded
#: cents so both the full and the sorted-neighborhood oracle share it
_O_ER_SCORE = """(700000 * (GREATEST(length(cname), length(sname))
                    - levenshtein(cname, sname)))
           // GREATEST(length(cname), length(sname))
       + (300000 * (ABS(cc) + ABS(sc) + 100 - ABS(cc - sc)))
           // (ABS(cc) + ABS(sc) + 100)"""


_O_SNM_REC = """
  SELECT 'c' AS side, c_custkey AS rid, c_name AS name,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents,
         c_nationkey AS nation
  FROM customer
  UNION ALL
  SELECT 's', s_suppkey, s_name,
         CAST(ROUND(s_acctbal * 100) AS BIGINT), s_nationkey
  FROM supplier
"""

#: two-pass SNM candidate set: pass 1 sorts (nation, cents), pass 2
#: (nation, name digit suffix); UNION dedupes pairs found by both
_O_SNM_PAIRS = f"""
rec AS ({_O_SNM_REC}),
rk1 AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY nation, cents, side, rid) AS rk
  FROM rec
), rk2 AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY nation, right(name, 9), side, rid)
             AS rk
  FROM rec
), p AS (
  SELECT c.rid AS c_id, s.rid AS s_id,
         c.name AS cname, s.name AS sname, c.cents AS cc, s.cents AS sc
  FROM rk1 c JOIN rk1 s
    ON c.side = 'c' AND s.side = 's'
   AND ABS(c.rk - s.rk) <= {{w}} AND c.nation = s.nation
  UNION
  SELECT c.rid, s.rid, c.name, s.name, c.cents, s.cents
  FROM rk2 c JOIN rk2 s
    ON c.side = 'c' AND s.side = 's'
   AND ABS(c.rk - s.rk) <= {{w}} AND c.nation = s.nation
)""".format(w=_SNM_W)


def _snm_pairs(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Two-pass SNM candidate pairs (c_id, s_id, cname, sname, cc, sc):
    shared by the gated query and its recall eval; see the query
    docstring for the method and scale shape."""
    from .operators.prefix import ranged_prefix
    c = load(spark, sf_dir, "customer").select(
        F.lit("c").alias("side"), F.col("c_custkey").alias("rid"),
        F.col("c_name").alias("name"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
        F.col("c_nationkey").alias("nation"))
    s = load(spark, sf_dir, "supplier").select(
        F.lit("s").alias("side"), F.col("s_suppkey").alias("rid"),
        F.col("s_name").alias("name"),
        F.round(F.col("s_acctbal") * 100).cast("long").alias("cents"),
        F.col("s_nationkey").alias("nation"))
    rec = c.unionByName(s)
    w = _SNM_W

    def one_pass(order) -> "DataFrame":
        ranked, _ = ranged_prefix(rec, order, rank_col="rk")
        cust = (ranked.filter(F.col("side") == "c")
                .select(F.col("rid").alias("c_id"),
                        F.col("name").alias("cname"),
                        F.col("cents").alias("cc"),
                        F.col("nation").alias("cn"),
                        F.col("rk").alias("crk"),
                        F.expr(f"rk div {w}").alias("blk")))
        supp = (ranked.filter(F.col("side") == "s")
                .select(F.col("rid").alias("s_id"),
                        F.col("name").alias("sname"),
                        F.col("cents").alias("sc"),
                        F.col("nation").alias("sn"),
                        F.col("rk").alias("srk"))
                .withColumn("blk", F.explode(F.expr(
                    f"array(srk div {w} - 1, srk div {w},"
                    f" srk div {w} + 1)"))))
        return (cust.join(supp, ["blk"])
                .filter((F.abs(F.col("crk") - F.col("srk")) <= w) &
                        (F.col("cn") == F.col("sn")))
                .select("c_id", "s_id", "cname", "sname", "cc", "sc"))

    p1 = one_pass([F.col("nation"), F.col("cents"),
                   F.col("side"), F.col("rid")])
    # right(), not substring(name, -9, 9): for a name SHORTER than 9
    # chars Spark's negative-pos substring returns '' while DuckDB's
    # right() returns the whole string — right() agrees in both
    # engines at every length, so the pass-2 sort key has no
    # short-name divergence envelope
    p2 = one_pass([F.col("nation"), F.expr("right(name, 9)"),
                   F.col("side"), F.col("rid")])
    # UNION set semantics: a pair found by both passes scores once
    return p1.union(p2).distinct()


@q("entity_resolution_sorted_neighborhood", ("J5", "F11", "W3", "W1"),
   oracle=f"""
WITH {_O_SNM_PAIRS}, scored AS (
  SELECT c_id, s_id, {_O_ER_SCORE} AS score_u FROM p
), r AS (
  SELECT c_id, s_id, score_u,
         ROW_NUMBER() OVER (PARTITION BY c_id
                            ORDER BY score_u DESC, s_id) AS rn
  FROM scored
)
SELECT c_id AS customer, s_id AS supplier,
       CAST(score_u AS DOUBLE) / 1000000.0 AS match_score
FROM r WHERE rn = 1
""")
def entity_resolution_sorted_neighborhood(spark: "SparkSession",
                                          sf_dir: str) -> "DataFrame":
    """Record linkage by MULTI-PASS SORTED NEIGHBORHOOD (Hernández &
    Stolfo): the linear-pair-space production path for the quadratic
    trend the ×100 probe measured on ``entity_resolution_best_match``
    (its Σ block_c·block_s grows ∝ N² when both sides grow, because
    the 25-nation blocking key has FIXED cardinality).  Records from
    both sides sort together twice — pass 1 by (nation, balance
    cents), pass 2 by (nation, name digit suffix), each signal one of
    the match score's two components — and only pairs within ±16
    rank positions in EITHER pass are scored: candidate count is
    2·N·w, LINEAR in the corpus no matter how the per-key blocks
    skew.  Multi-pass is the method's own answer to a single weak
    sort key (one pass over balance alone matched only ~7% of
    customers here — measured, which is why the pass-2 key exists).

    Scale design: each global rank comes from
    ``operators.prefix.ranged_prefix`` (two-level bucketed row_number
    — no single-partition window over the corpus); the rank-window
    join is the adjacent-block trick — customers keyed at blk =
    rk div w, suppliers replicated to (blk−1, blk, blk+1), equi-join
    on blk then the exact |Δrk| ≤ w filter — a plain hash join on a
    balanced synthetic key, never a range/theta join; the two passes
    dedupe by pair key.  The recall cost of the windows (vs the full
    blocked argmax) is measured, not assumed:
    ``entity_resolution_snm_recall_eval``.

    KNOWN BOUND (measured at ×100 — SCALE.md): under side imbalance
    the mixed-rank ±w window starves the large side — matched
    customers plateau at suppliers·2w.
    ``entity_resolution_blocked_refined`` closes this by taking the
    window in SUPPLIER-rank space; prefer it when the sides skew.
    """
    pairs = _snm_pairs(spark, sf_dir)
    maxlen = F.greatest(F.length("cname"), F.length("sname")) \
        .cast("long")
    name_num = (maxlen - F.levenshtein("cname", "sname")) * 700000
    name_u = ((name_num - name_num % maxlen) / maxlen).cast("long")
    den = F.abs(F.col("cc")) + F.abs(F.col("sc")) + 100
    acct_num = (den - F.abs(F.col("cc") - F.col("sc"))) * 300000
    acct_u = ((acct_num - acct_num % den) / den).cast("long")
    scored = pairs.select(
        F.col("c_id").alias("customer"), F.col("s_id").alias("supplier"),
        (name_u + acct_u).alias("score_u"))
    wn = W.partitionBy("customer").orderBy(F.col("score_u").desc(),
                                           F.col("supplier"))
    return (scored.withColumn("rn", F.row_number().over(wn))
            .filter(F.col("rn") == 1)
            .select("customer", "supplier",
                    (F.col("score_u").cast("double") / 1000000.0)
                    .alias("match_score")))


@q("entity_resolution_snm_recall_eval", ("J5", "A1"), oracle=f"""
WITH full_p AS (
  SELECT c.c_custkey, s.s_suppkey,
         (700000 * (GREATEST(length(c.c_name), length(s.s_name))
                    - levenshtein(c.c_name, s.s_name)))
           // GREATEST(length(c.c_name), length(s.s_name))
       + (300000 * (ABS(CAST(ROUND(c.c_acctbal * 100) AS BIGINT))
                    + ABS(CAST(ROUND(s.s_acctbal * 100) AS BIGINT)) + 100
                    - ABS(CAST(ROUND(c.c_acctbal * 100) AS BIGINT)
                          - CAST(ROUND(s.s_acctbal * 100) AS BIGINT))))
           // (ABS(CAST(ROUND(c.c_acctbal * 100) AS BIGINT))
               + ABS(CAST(ROUND(s.s_acctbal * 100) AS BIGINT)) + 100)
           AS score_u
  FROM customer c JOIN supplier s ON c.c_nationkey = s.s_nationkey
), full_r AS (
  SELECT c_custkey AS customer, score_u,
         ROW_NUMBER() OVER (PARTITION BY c_custkey
                            ORDER BY score_u DESC, s_suppkey) AS rn
  FROM full_p
), fb AS (SELECT customer, score_u AS full_u FROM full_r WHERE rn = 1),
{_O_SNM_PAIRS}, snm_r AS (
  SELECT c_id AS customer, score_u,
         ROW_NUMBER() OVER (PARTITION BY c_id
                            ORDER BY score_u DESC, s_id) AS rn
  FROM (SELECT c_id, s_id, {_O_ER_SCORE} AS score_u FROM p)
), sb AS (SELECT customer, score_u AS snm_u FROM snm_r WHERE rn = 1)
SELECT COUNT(*)::INT AS n_customers,
       COUNT(sb.snm_u)::INT AS n_snm_matched,
       COUNT(*) FILTER (WHERE sb.snm_u = fb.full_u)::INT
         AS n_score_equal,
       CAST(COUNT(*) FILTER (WHERE sb.snm_u = fb.full_u) AS DOUBLE)
         / COUNT(*) AS snm_recall,
       CAST(SUM(fb.full_u - COALESCE(sb.snm_u, 0)) AS BIGINT)
         AS score_shortfall_u
FROM fb LEFT JOIN sb USING (customer)
""")
def entity_resolution_snm_recall_eval(spark: "SparkSession",
                                      sf_dir: str) -> "DataFrame":
    """Trust gate for the sorted-neighborhood window (the ER analog of
    ``ann_recall_eval`` / ``semdedup_cap_recall_eval``): what fraction
    of customers get a best match AS GOOD AS the full nation-blocked
    argmax?  Equality is on the integer score (ties in name-space are
    interchangeable matches); ``score_shortfall_u`` totals the micro-
    units lost where the window missed the optimum — the number that
    says whether to widen w or add a second sort pass (classic
    multi-pass SNM).  Runs BOTH variants, so it is offline QA over a
    sample at scale, like every other recall gate in the repo."""
    full = (entity_resolution_best_match(spark, sf_dir)
            .select("customer",
                    F.round(F.col("match_score") * 1000000)
                    .cast("long").alias("full_u")))
    snm = (entity_resolution_sorted_neighborhood(spark, sf_dir)
           .select("customer",
                   F.round(F.col("match_score") * 1000000)
                   .cast("long").alias("snm_u")))
    both = full.join(snm, "customer", "left")
    eq = F.count_if(F.col("snm_u") == F.col("full_u"))
    return both.agg(
        F.count(F.lit(1)).cast("int").alias("n_customers"),
        F.count("snm_u").cast("int").alias("n_snm_matched"),
        eq.cast("int").alias("n_score_equal"),
        (eq.cast("double") / F.count(F.lit(1))).alias("snm_recall"),
        F.sum(F.col("full_u") - F.coalesce(F.col("snm_u"), F.lit(0)))
        .cast("long").alias("score_shortfall_u"))


_ERB_K = 2  # nearest suppliers kept on EACH side of a customer's
#            per-pass as-of position (candidates per pass = 2K)
_ERB_ALPHA = 5   # auto-K: target suppliers per kept candidate —
#                  K_n = ⌈block/α⌉ tracks the SCALE.md K-vs-recall
#                  curve (K=8 at the ×10 40-supplier blocks → 0.972)
_ERB_KMAX = 64   # auto-K hard cap: pair space stays ≤ 2·2·KMAX·|C|
#                  (linear in the growing side) under ANY block growth


def _o_erb_pairs(autok: bool = False) -> str:
    """Refined-blocking candidate pairs (oracle twin) → relation
    ``erb``: suppliers ranked per nation by each sort key, each
    customer joined to the 2K suppliers nearest its as-of position p
    (= count of strictly-smaller supplier keys in its nation) — shared
    by the gated queries and their recall evals.  With ``autok`` the
    window half-width is per-nation data-dependent
    (K_n = clamp(⌈block/α⌉, K, KMAX), the ``snk`` CTE) instead of the
    pinned ``_ERB_K``; ONE template emits both so the fixed and auto-K
    oracles cannot drift."""
    if autok:
        snk = (f", snk AS (\n  SELECT nation, LEAST({_ERB_KMAX}, "
               f"GREATEST({_ERB_K}, (COUNT(*) + {_ERB_ALPHA - 1}) "
               f"// {_ERB_ALPHA})) AS kn\n  FROM sup GROUP BY 1\n)")
        joink = "JOIN snk k ON k.nation = c.nation\n              "
        win = "BETWEEN c.p - (k.kn - 1) AND c.p + k.kn"
    else:
        snk, joink = "", ""
        win = f"BETWEEN c.p - {_ERB_K - 1} AND c.p + {_ERB_K}"
    return f"""
sup AS (
  SELECT s_suppkey AS s_id, s_name AS sname,
         CAST(ROUND(s_acctbal * 100) AS BIGINT) AS sc,
         s_nationkey AS nation
  FROM supplier
), cus AS (
  SELECT c_custkey AS c_id, c_name AS cname,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cc,
         c_nationkey AS nation
  FROM customer
){snk}, srk1 AS (
  SELECT nation, s_id, sname, sc,
         ROW_NUMBER() OVER (PARTITION BY nation ORDER BY sc, s_id) AS srk
  FROM sup
), srk2 AS (
  SELECT nation, s_id, sname, sc,
         ROW_NUMBER() OVER (PARTITION BY nation
                            ORDER BY right(sname, 9), s_id) AS srk
  FROM sup
), pos1 AS (
  SELECT c.c_id, c.cname, c.cc, c.nation, COUNT(s.s_id) AS p
  FROM cus c LEFT JOIN sup s ON s.nation = c.nation AND s.sc < c.cc
  GROUP BY 1, 2, 3, 4
), pos2 AS (
  SELECT c.c_id, c.cname, c.cc, c.nation, COUNT(s.s_id) AS p
  FROM cus c LEFT JOIN sup s
    ON s.nation = c.nation AND right(s.sname, 9) < right(c.cname, 9)
  GROUP BY 1, 2, 3, 4
), erb AS (
  SELECT c.c_id, s.s_id, c.cname, s.sname, c.cc, s.sc
  FROM pos1 c {joink}JOIN srk1 s
    ON s.nation = c.nation
   AND s.srk {win}
  UNION
  SELECT c.c_id, s.s_id, c.cname, s.sname, c.cc, s.sc
  FROM pos2 c {joink}JOIN srk2 s
    ON s.nation = c.nation
   AND s.srk {win}
)"""


_O_ERB_PAIRS = _o_erb_pairs()
_O_ERB_AUTOK_PAIRS = _o_erb_pairs(autok=True)


def _o_erb_recall(pairs_sql: str) -> str:
    """Recall-eval oracle template shared by the fixed-K and auto-K
    refined-blocking variants: full nation-blocked argmax baseline
    LEFT JOIN the blocked variant's per-customer best score."""
    return f"""
WITH full_p AS (
  SELECT c.c_custkey, s.s_suppkey,
         (700000 * (GREATEST(length(c.c_name), length(s.s_name))
                    - levenshtein(c.c_name, s.s_name)))
           // GREATEST(length(c.c_name), length(s.s_name))
       + (300000 * (ABS(CAST(ROUND(c.c_acctbal * 100) AS BIGINT))
                    + ABS(CAST(ROUND(s.s_acctbal * 100) AS BIGINT)) + 100
                    - ABS(CAST(ROUND(c.c_acctbal * 100) AS BIGINT)
                          - CAST(ROUND(s.s_acctbal * 100) AS BIGINT))))
           // (ABS(CAST(ROUND(c.c_acctbal * 100) AS BIGINT))
               + ABS(CAST(ROUND(s.s_acctbal * 100) AS BIGINT)) + 100)
           AS score_u
  FROM customer c JOIN supplier s ON c.c_nationkey = s.s_nationkey
), full_r AS (
  SELECT c_custkey AS customer, score_u,
         ROW_NUMBER() OVER (PARTITION BY c_custkey
                            ORDER BY score_u DESC, s_suppkey) AS rn
  FROM full_p
), fb AS (SELECT customer, score_u AS full_u FROM full_r WHERE rn = 1),
{pairs_sql}, ref_r AS (
  SELECT c_id AS customer, score_u,
         ROW_NUMBER() OVER (PARTITION BY c_id
                            ORDER BY score_u DESC, s_id) AS rn
  FROM (SELECT c_id, s_id, {_O_ER_SCORE} AS score_u FROM erb)
), rb AS (SELECT customer, score_u AS ref_u FROM ref_r WHERE rn = 1)
SELECT COUNT(*)::INT AS n_customers,
       COUNT(rb.ref_u)::INT AS n_ref_matched,
       COUNT(*) FILTER (WHERE rb.ref_u = fb.full_u)::INT
         AS n_score_equal,
       CAST(COUNT(*) FILTER (WHERE rb.ref_u = fb.full_u) AS DOUBLE)
         / COUNT(*) AS refined_recall,
       CAST(SUM(fb.full_u - COALESCE(rb.ref_u, 0)) AS BIGINT)
         AS score_shortfall_u
FROM fb LEFT JOIN rb USING (customer)
"""



def _refined_pairs(spark: "SparkSession", sf_dir: str,
                   autok: bool = False) -> "DataFrame":
    """Refined-blocking candidate pairs (c_id, s_id, cname, sname, cc,
    sc): per sort pass, each customer pairs with the 2K suppliers
    nearest its as-of position in the SUPPLIER rank order of its
    nation; shared by the gated queries and their recall evals.  With
    ``autok`` the half-width is per-nation data-dependent —
    K_n = clamp(⌈block/α⌉, K, KMAX) — computed MAP-SIDE from the same
    broadcast key array that gives the as-of position (its size IS the
    block size), so the quality knob costs zero extra shuffles."""
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("c_id"), F.col("c_name").alias("cname"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("cc"),
        F.col("c_nationkey").alias("nation"))
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("s_id"), F.col("s_name").alias("sname"),
        F.round(F.col("s_acctbal") * 100).cast("long").alias("sc"),
        F.col("s_nationkey").alias("nation"))
    k = _ERB_K

    def one_pass(skey, ckey) -> "DataFrame":
        wr = W.partitionBy("nation").orderBy(skey, "s_id")
        ranked = s.select("nation", "s_id", "sname", "sc",
                          F.row_number().over(wr).alias("srk"))
        # per-nation sorted supplier-key array, broadcast: the as-of
        # position is computed MAP-SIDE on the customer scan — the
        # big side never shuffles for it (supplier is dimension-like:
        # the ×100 imbalance replica holds it fixed while customers
        # grow, the exact shape this operator is built for)
        keys = s.groupBy("nation").agg(
            F.sort_array(F.collect_list(skey)).alias("sk"))
        pos = (c.join(F.broadcast(keys), "nation", "left")
               .withColumn("p", F.coalesce(
                   F.size(F.filter("sk", lambda x: x < ckey)), F.lit(0)))
               .withColumn("kn", F.coalesce(
                   F.least(F.lit(_ERB_KMAX), F.greatest(
                       F.lit(k),
                       F.expr(f"(size(sk) + {_ERB_ALPHA - 1}) "
                              f"div {_ERB_ALPHA}"))),
                   F.lit(k)) if autok else F.lit(k))
               .drop("sk"))
        cand = pos.select(
            "c_id", "cname", "cc", "nation",
            F.explode(F.sequence(F.col("p") - F.col("kn") + 1,
                                 F.col("p") + F.col("kn"))).alias("srk"))
        return (cand.join(F.broadcast(ranked), ["nation", "srk"])
                .select("c_id", "s_id", "cname", "sname", "cc", "sc"))

    p1 = one_pass(F.col("sc"), F.col("cc"))
    # right(name, 9), not substring(-9): engine-parity at every length
    # (see _snm_pairs)
    p2 = one_pass(F.expr("right(sname, 9)"), F.expr("right(cname, 9)"))
    # UNION set semantics: a pair found by both passes scores once
    return p1.union(p2).distinct()


@q("entity_resolution_blocked_refined", ("J5", "F11", "W3", "W1"),
   oracle=f"""
WITH {_O_ERB_PAIRS}, scored AS (
  SELECT c_id, s_id, {_O_ER_SCORE} AS score_u FROM erb
), r AS (
  SELECT c_id, s_id, score_u,
         ROW_NUMBER() OVER (PARTITION BY c_id
                            ORDER BY score_u DESC, s_id) AS rn
  FROM scored
)
SELECT c_id AS customer, s_id AS supplier,
       CAST(score_u AS DOUBLE) / 1000000.0 AS match_score
FROM r WHERE rn = 1
""")
def entity_resolution_blocked_refined(spark: "SparkSession",
                                      sf_dir: str) -> "DataFrame":
    """Record linkage with a REFINED, imbalance-proof blocking scheme —
    the production answer to the two measured pathologies of its
    siblings (SCALE.md): ``entity_resolution_best_match``'s fixed
    25-nation key goes quadratic when both sides grow, and
    ``entity_resolution_sorted_neighborhood``'s ±w window over the
    MIXED-side rank starves customers under side imbalance (the ×100
    replica holds suppliers fixed while customers grow 100× → most
    customers see zero suppliers within ±16 mixed positions; matched
    customers plateau at suppliers·2w — measured, queries_ext.py SNM
    docstring).

    The fix: take the window in SUPPLIER-rank space.  Per sort pass
    (pass 1 balance cents, pass 2 name digit suffix — one per score
    signal, classic multi-pass), suppliers are ranked per nation and
    each customer pairs with the 2K suppliers nearest its as-of
    position p (count of strictly-smaller supplier keys).  Candidates
    per customer are EXACTLY 2K per pass no matter how the sides skew
    — coverage is complete by construction (every customer with ≥1
    same-nation supplier gets candidates), and the pair space is
    2·2K·|C|, linear in the growing side with a constant independent
    of the imbalance ratio.

    Scale shape: the supplier side is dimension-like, so its per-pass
    rank is a tiny window and its per-nation sorted key arrays
    broadcast; the as-of position is computed map-side on the customer
    scan (no customer shuffle), candidates explode to 2K synthetic
    ranks and hash-join the broadcast ranked suppliers.  Only the
    final per-customer argmax shuffles the (already 4K-bounded)
    candidate set.  The recall cost vs the full blocked argmax is
    measured, not assumed: ``entity_resolution_refined_recall_eval``.
    """
    return _erb_score_argmax(_refined_pairs(spark, sf_dir))


def _erb_score_argmax(pairs: "DataFrame") -> "DataFrame":
    """Score candidate pairs with the shared integer-unit ER formula
    (`_O_ER_SCORE`) and keep each customer's argmax (min-supplier
    tie-break) — the final stage of every refined-blocking variant."""
    maxlen = F.greatest(F.length("cname"), F.length("sname")) \
        .cast("long")
    name_num = (maxlen - F.levenshtein("cname", "sname")) * 700000
    name_u = ((name_num - name_num % maxlen) / maxlen).cast("long")
    den = F.abs(F.col("cc")) + F.abs(F.col("sc")) + 100
    acct_num = (den - F.abs(F.col("cc") - F.col("sc"))) * 300000
    acct_u = ((acct_num - acct_num % den) / den).cast("long")
    scored = pairs.select(
        F.col("c_id").alias("customer"), F.col("s_id").alias("supplier"),
        (name_u + acct_u).alias("score_u"))
    wn = W.partitionBy("customer").orderBy(F.col("score_u").desc(),
                                           F.col("supplier"))
    return (scored.withColumn("rn", F.row_number().over(wn))
            .filter(F.col("rn") == 1)
            .select("customer", "supplier",
                    (F.col("score_u").cast("double") / 1000000.0)
                    .alias("match_score")))


@q("entity_resolution_blocked_autok", ("J5", "F11", "W3", "W1"),
   oracle=f"""
WITH {_O_ERB_AUTOK_PAIRS}, scored AS (
  SELECT c_id, s_id, {_O_ER_SCORE} AS score_u FROM erb
), r AS (
  SELECT c_id, s_id, score_u,
         ROW_NUMBER() OVER (PARTITION BY c_id
                            ORDER BY score_u DESC, s_id) AS rn
  FROM scored
)
SELECT c_id AS customer, s_id AS supplier,
       CAST(score_u AS DOUBLE) / 1000000.0 AS match_score
FROM r WHERE rn = 1
""")
def entity_resolution_blocked_autok(spark: "SparkSession",
                                    sf_dir: str) -> "DataFrame":
    """Refined-blocking ER with a DATA-DEPENDENT window — the quality
    fix for the measured K-vs-recall cliff (SCALE.md: pinned K=2 gives
    0.993 argmax recall at sf0.01's ~4-supplier nation blocks but
    0.711 at ×10's 40-supplier blocks; the curve says K must track
    block size).  Per nation, K_n = clamp(⌈block/α⌉, K=2, KMAX=64)
    with α=5 (_ERB_ALPHA) — the auto-K idea from SemDeDup
    applied to blocking: hold the CANDIDATE-TO-BLOCK ratio fixed
    instead of the candidate count, so recall is scale-stable while
    the hard cap keeps the pair space ≤ 2·2·KMAX·|C|, still linear in
    the growing side and independent of the imbalance ratio.

    Plan shape is IDENTICAL to ``entity_resolution_blocked_refined``:
    K_n derives map-side from size(broadcast key array) — the array
    already shipped for the as-of position — so the data-dependence
    adds zero shuffles and zero extra passes; only the explode width
    changes (``F.sequence`` on a per-row bound instead of a constant
    array).  Recall vs the full argmax is measured, not assumed:
    ``entity_resolution_autok_recall_eval``."""
    return _erb_score_argmax(_refined_pairs(spark, sf_dir, autok=True))


@q("entity_resolution_autok_recall_eval", ("J5", "A1"),
   oracle=_o_erb_recall(_O_ERB_AUTOK_PAIRS))
def entity_resolution_autok_recall_eval(spark: "SparkSession",
                                        sf_dir: str) -> "DataFrame":
    """Trust gate for the data-dependent window: same contract as
    ``entity_resolution_refined_recall_eval`` but over the auto-K
    variant — the acceptance bar is recall ≥ 0.95 at ×10 where the
    pinned-K variant measured 0.711 (SCALE.md K-vs-recall curve)."""
    full = (entity_resolution_best_match(spark, sf_dir)
            .select("customer",
                    F.round(F.col("match_score") * 1000000)
                    .cast("long").alias("full_u")))
    ref = (entity_resolution_blocked_autok(spark, sf_dir)
           .select("customer",
                   F.round(F.col("match_score") * 1000000)
                   .cast("long").alias("ref_u")))
    both = full.join(ref, "customer", "left")
    eq = F.count_if(F.col("ref_u") == F.col("full_u"))
    return both.agg(
        F.count(F.lit(1)).cast("int").alias("n_customers"),
        F.count("ref_u").cast("int").alias("n_ref_matched"),
        eq.cast("int").alias("n_score_equal"),
        (eq.cast("double") / F.count(F.lit(1))).alias("refined_recall"),
        F.sum(F.col("full_u") - F.coalesce(F.col("ref_u"), F.lit(0)))
        .cast("long").alias("score_shortfall_u"))


@q("entity_resolution_refined_recall_eval", ("J5", "A1"),
   oracle=_o_erb_recall(_O_ERB_PAIRS))
def entity_resolution_refined_recall_eval(spark: "SparkSession",
                                          sf_dir: str) -> "DataFrame":
    """Trust gate for the refined blocking (the ER analog of
    ``entity_resolution_snm_recall_eval``): what fraction of customers
    get a best match AS GOOD AS the full nation-blocked argmax, and —
    the property the refinement exists for — does every full-matched
    customer get SOME candidate (``n_ref_matched`` vs ``n_customers``:
    coverage must be complete by construction, unlike the SNM window
    whose matched-customer count plateaus at suppliers·2w under
    imbalance)."""
    full = (entity_resolution_best_match(spark, sf_dir)
            .select("customer",
                    F.round(F.col("match_score") * 1000000)
                    .cast("long").alias("full_u")))
    ref = (entity_resolution_blocked_refined(spark, sf_dir)
           .select("customer",
                   F.round(F.col("match_score") * 1000000)
                   .cast("long").alias("ref_u")))
    both = full.join(ref, "customer", "left")
    eq = F.count_if(F.col("ref_u") == F.col("full_u"))
    return both.agg(
        F.count(F.lit(1)).cast("int").alias("n_customers"),
        F.count("ref_u").cast("int").alias("n_ref_matched"),
        eq.cast("int").alias("n_score_equal"),
        (eq.cast("double") / F.count(F.lit(1))).alias("refined_recall"),
        F.sum(F.col("full_u") - F.coalesce(F.col("ref_u"), F.lit(0)))
        .cast("long").alias("score_shortfall_u"))


@q("multimodal_frame_sample", ("F10",), oracle="""
WITH f AS (
  SELECT doc_id, text,
         CAST(LEAST(CEIL(length(text) / 256.0), 16) AS INT) AS k
  FROM documents
), idx AS (
  SELECT doc_id, text, UNNEST(generate_series(0, k - 1)) AS i FROM f
)
SELECT doc_id,
       CAST(i AS INT) AS frame_idx,
       CAST(i * 256 AS BIGINT) AS offset_bytes,
       CAST(length(substr(text, CAST(i * 256 + 1 AS INT), 256)) AS BIGINT)
         AS frame_bytes,
       md5(substr(text, CAST(i * 256 + 1 AS INT), 256)) AS frame_digest
FROM idx
""")
def multimodal_frame_sample(spark: "SparkSession",
                            sf_dir: str) -> "DataFrame":
    """Frame-sampling plumbing under the gate: the 1→k mapInPandas
    explode (multimodal/transforms.py:frame_sample) with its
    deterministic fake codec — text bytes stand in for video payloads
    (pure-ASCII corpus, so byte slices == char slices and DuckDB can
    twin the digests).  What the oracle certifies is the CONTRACT a
    real codec plugs into: per-frame rows, offsets, sizes, digests,
    Arrow-batched, nothing accumulated across batches."""
    from .multimodal import attach_payload, frame_sample
    d = load(spark, sf_dir, "documents")
    wrapped = attach_payload(d, "text", media_type="video", fmt="raw")
    return frame_sample(wrapped, id_col="doc_id")


@q("string_similarity_levenshtein", ("F11", "J5"), oracle="""
SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
       levenshtein(a.p_name, b.p_name)::INT AS dist
FROM part a JOIN part b
  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= 12
""")
def string_similarity_levenshtein(spark: "SparkSession",
                                  sf_dir: str) -> "DataFrame":
    """Edit-distance similarity join (F11), blocked on brand so the
    pair space is Σ block² — levenshtein is O(len²) per pair, so the
    blocking is what makes it feasible at scale (or swap in the
    minhash/ngram operators for unblocked corpora)."""
    p = load(spark, sf_dir, "part")
    a = p.select(F.col("p_partkey").alias("key_a"),
                 F.col("p_brand").alias("brand"),
                 F.col("p_name").alias("name_a"))
    b = p.select(F.col("p_partkey").alias("key_b"),
                 F.col("p_brand").alias("brand"),
                 F.col("p_name").alias("name_b"))
    dist = F.levenshtein("name_a", "name_b")
    return (a.join(b, ["brand"])
            .filter(F.col("key_a") < F.col("key_b"))
            .select("key_a", "key_b", dist.alias("dist"))
            .filter(F.col("dist") <= 12))


@q("set_ops_union_except", ("A2",), oracle="""
WITH active AS (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
  UNION
  SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
),
churny AS (
  SELECT user_id FROM events WHERE event_type = 'error'
  GROUP BY user_id HAVING COUNT(*) > 25
)
SELECT user_id FROM active
EXCEPT
SELECT user_id FROM churny
""")
def set_ops_union_except(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """UNION/EXCEPT set ops (SURVEY §2.6 — absent from the reference but
    part of any complete engine surface; Spark plans EXCEPT as a
    left-anti hash join, UNION-distinct as one hash aggregate)."""
    e = load(spark, sf_dir, "events")
    buyers = e.filter(F.col("event_type") == "purchase") \
              .select("user_id").distinct()
    clickers = e.filter(F.col("event_type") == "click") \
                .select("user_id").distinct()
    churny = (e.filter(F.col("event_type") == "error")
              .groupBy("user_id").count().filter(F.col("count") > 25)
              .select("user_id"))
    return buyers.union(clickers).distinct().exceptAll(churny)


@q("date_spine", ("A3", "F2", "F3"), oracle="""
WITH bounds AS (
  SELECT MIN(CAST(o_orderdate AS DATE)) AS lo,
         MAX(CAST(o_orderdate AS DATE)) AS hi
  FROM orders
)
SELECT CAST(d AS DATE) AS date,
       EXTRACT(year FROM d)::INT AS year,
       EXTRACT(month FROM d)::INT AS month,
       EXTRACT(dow FROM d)::INT AS day_of_week
FROM bounds, LATERAL unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS t(d)
""")
def date_spine(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Gap-free date dimension spanning the data's date range (the
    classic dbt date-spine utility dim_date lacks — observed-dates-only
    dims break left joins on quiet days).  F.sequence generates the
    spine JVM-side from one min/max aggregate; no driver loop."""
    o = load(spark, sf_dir, "orders")
    bounds = o.agg(F.min(F.to_date("o_orderdate")).alias("lo"),
                   F.max(F.to_date("o_orderdate")).alias("hi"))
    return (bounds
            .select(F.explode(F.sequence("lo", "hi")).alias("date"))
            .select("date",
                    F.year("date").alias("year"),
                    F.month("date").alias("month"),
                    (F.dayofweek("date") - 1).alias("day_of_week")))


@q("unpivot_metrics", ("P4",), oracle="""
SELECT c_custkey AS customer, metric, value FROM (
  SELECT c_custkey,
         UNNEST(['acctbal', 'nationkey']) AS metric,
         UNNEST([c_acctbal, CAST(c_nationkey AS DOUBLE)]) AS value
  FROM customer
)
""")
def unpivot_metrics(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """UNPIVOT (wide → long melt): Spark's native unpivot produces an
    Expand node — one pass, rows × n_metrics output, no join."""
    c = load(spark, sf_dir, "customer")
    return (c.select(F.col("c_custkey").alias("customer"),
                     F.col("c_acctbal").alias("acctbal"),
                     F.col("c_nationkey").cast("double").alias("nationkey"))
            .unpivot("customer", ["acctbal", "nationkey"],
                     "metric", "value"))


@q("global_topn", ("W3",), oracle="""
SELECT o_orderkey AS order_id, o_totalprice AS total
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
""")
def global_topn(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Global ORDER BY + LIMIT: Spark plans TakeOrderedAndProject —
    per-partition top-N then a single-row-count merge, no full sort."""
    o = load(spark, sf_dir, "orders")
    return (o.select(F.col("o_orderkey").alias("order_id"),
                     F.col("o_totalprice").alias("total"))
            .orderBy(F.col("total").desc(), "order_id").limit(10))


@q("set_ops_intersect", ("A2",), oracle="""
SELECT user_id FROM events WHERE event_type = 'purchase'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'error'
""")
def set_ops_intersect(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """INTERSECT (distinct) — completes the §2.6 set-op family with
    UNION/EXCEPT (set_ops_union_except).  Spark plans INTERSECT as a
    left-semi hash join over the two distinct sets: both sides reduce
    map-side before any shuffle, so the wire carries distinct keys
    only — at 100 TB the cost is two key-distinct shuffles, never the
    fact rows."""
    e = load(spark, sf_dir, "events")
    buyers = e.filter(F.col("event_type") == "purchase").select("user_id")
    erroring = e.filter(F.col("event_type") == "error").select("user_id")
    return buyers.intersect(erroring)


@q("scd2_version_history", ("W1",), oracle="""
SELECT user_id, event_id, ts AS valid_from, valid_to,
       (valid_to IS NULL) AS is_current, event_type, value
FROM (
  SELECT *, LEAD(ts) OVER (
      PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
  FROM events
) WHERE event_type <> 'error'
""")
def scd2_version_history(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """SCD Type 2 full version history from a CDC-style stream (⇔ dbt
    snapshots): each change is valid from its own timestamp until the
    key's next change; 'error' ops act as soft deletes — they close
    the prior version (its valid_to = the delete time) and open
    nothing, so deleted keys carry no current row
    (operators/scd.py:scd2_history)."""
    e = (load(spark, sf_dir, "events")
         .withColumn("_is_deleted", F.col("event_type") == "error"))
    from .operators.scd import scd2_history
    h = scd2_history(e, key="user_id", order_col="ts",
                     tiebreak="event_id")
    return h.select("user_id", "event_id",
                    F.col("ts").alias("valid_from"), "valid_to",
                    "is_current", "event_type", "value")


@q("simhash_hamming_pairs", ("J5", "W2", "F11"), oracle=f"""
WITH sh AS ({_simhash_oracle()})
SELECT a.doc_id AS key_a, b.doc_id AS key_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
""")
def simhash_hamming_pairs(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Near-duplicate pairs at SimHash Hamming distance ≤ 3, via
    banding over DISTINCT fingerprints + output-bound family expansion.

    Pigeonhole: 3 differing bits can touch at most 3 of the 4 4-bit
    bands, so every qualifying fingerprint pair collides in ≥1 band.
    The scale-critical move is WHERE the banding join runs: on the
    distinct-fingerprint relation, whose size is bounded by the
    fingerprint space (2^16 here, 2^64 for production SimHash) — NOT
    by corpus size.  Doc-level banding melts down on template-heavy
    corpora: every template family shares a fingerprint, band buckets
    grow with the corpus, and candidate work goes quadratic even
    though most comparisons repeat the same fingerprint pair (probed
    empirically at sf0.1: 5k docs → 2.8M qualifying pairs — the JVM
    died doing ~50M doc-level candidate comparisons for ~5k distinct
    fingerprints).  With fingerprint-level banding the only
    corpus-proportional work left is emitting the answer itself:
    qualifying fingerprint pairs (tiny, broadcast) expand to doc pairs
    through two equi-joins against the (doc, fingerprint) relation —
    pair emission is output-bound, which is optimal for an enumerate-
    the-pairs operator.  Same-fingerprint families self-pair via the
    fpa = fpb row with doc_a < doc_b ordering; cross-family pairs
    normalize with least/greatest.  The oracle brute-forces all pairs
    — exact recall of the banding scheme is what the hash-match
    proves.
    """
    from .operators.dedup import simhash_hamming_pair_join
    d = load(spark, sf_dir, "documents")
    sh = simhash(d, "text", "doc_id")
    return simhash_hamming_pair_join(sh)


#: Per-fingerprint family cap for the production pair dump (VERDICT r8
#: #5, mirroring _MINHASH_CAP): a fingerprint shared by B docs emits
#: B(B-1)/2 pairs in the uncapped dump — corpus-quadratic OUTPUT on
#: duplicated corpora even though the banding work itself is
#: fingerprint-space-bounded.  Keeping C deterministic representatives
#: per fingerprint bounds the dump to |qualifying fp pairs| × C².
_SIMHASH_FAMILY_CAP = 8


@q("simhash_hamming_pairs_capped", ("J5", "W2", "F11"), oracle=f"""
WITH sh AS ({_simhash_oracle()}),
ranked AS (
  SELECT doc_id, simhash,
         ROW_NUMBER() OVER (PARTITION BY simhash
             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM sh
), capped AS (
  SELECT doc_id, simhash FROM ranked WHERE rn <= {_SIMHASH_FAMILY_CAP}
)
SELECT a.doc_id AS key_a, b.doc_id AS key_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM capped a JOIN capped b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
""")
def simhash_hamming_pairs_capped(spark: "SparkSession",
                                 sf_dir: str) -> "DataFrame":
    """Production twin of ``simhash_hamming_pairs``: identical
    fingerprint-level banding, but each fingerprint FAMILY is first
    capped to {cap} deterministic representatives (md5(doc_id) rank —
    the same uniform-deterministic selection as ``per_source_cap`` and
    the SemDeDup ``_cap_sub``), so the pair DUMP is output-bounded at
    |qualifying fingerprint pairs| × {cap}² no matter how duplicated
    the corpus is.  Docs dropped by the cap are verbatim
    fingerprint-duplicates of a kept representative — exactly the mass
    the exact/fingerprint dedup tier owns (the ``_MINHASH_CAP``
    argument), so pair recall loss is confined to within-family pairs
    the cheaper tier already collapses.

    Scale shape: the cap is one row_number over (fp; md5-pri) that
    Spark executes as WindowGroupLimit — partial top-{cap} per map
    partition BEFORE the shuffle, so a 10⁶-doc template family never
    funnels through one task — followed by the sibling's
    fingerprint-banded join on the (now ≤{cap}-per-fp) relation.  The
    uncapped sibling remains the recall reference; its ×100 exclusion
    (corpus-quadratic output) is the measurement this twin exists to
    answer.
    """
    from .operators.dedup import simhash_hamming_pair_join
    d = load(spark, sf_dir, "documents")
    sh = simhash(d, "text", "doc_id")
    pri = F.md5(F.col("doc_id").cast("string"))
    wn = W.partitionBy("simhash").orderBy(pri, "doc_id")
    capped = (sh.select("doc_id", "simhash",
                        F.row_number().over(wn).alias("rn"))
              .filter(F.col("rn") <= _SIMHASH_FAMILY_CAP)
              .select("doc_id", "simhash"))
    return simhash_hamming_pair_join(capped)


simhash_hamming_pairs_capped.__doc__ = \
    simhash_hamming_pairs_capped.__doc__.format(cap=_SIMHASH_FAMILY_CAP)


@q("set_ops_multiset", ("A2", "A5"), oracle="""
WITH a AS (
  SELECT l_suppkey FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1997-01-01'
), b AS (
  SELECT l_suppkey FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
), ea AS (SELECT l_suppkey FROM a EXCEPT ALL SELECT l_suppkey FROM b),
ia AS (SELECT l_suppkey FROM a INTERSECT ALL SELECT l_suppkey FROM b)
SELECT 'except_all' AS op, l_suppkey AS suppkey, COUNT(*) AS n
FROM ea GROUP BY 1, 2
UNION ALL
SELECT 'intersect_all' AS op, l_suppkey AS suppkey, COUNT(*) AS n
FROM ia GROUP BY 1, 2
""")
def set_ops_multiset(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Bag-semantics set ops (EXCEPT ALL / INTERSECT ALL) between two
    shipment-year (1996 vs 1997) supplier multisets — multiplicity-aware, unlike the
    distinct-based set_ops_* twins.  Spark plans both as a single
    count-per-key aggregate + generate (no sort, no join): each side
    shuffles once on the value, multiplicities subtract/min in the
    reduce — exactly the hand rewrite one would do at scale, for free.
    Aggregated per key afterwards so the declared result is
    deterministic while the physical bag operators still execute."""
    li = load(spark, sf_dir, "lineitem")

    def year_keys(y: int) -> "DataFrame":
        return (li.filter(
            (F.col("l_shipdate") >= F.lit(f"{y}-01-01").cast("timestamp")) &
            (F.col("l_shipdate") < F.lit(f"{y + 1}-01-01").cast("timestamp")))
            .select(F.col("l_suppkey").alias("suppkey")))

    a, b = year_keys(1996), year_keys(1997)
    ea = (a.exceptAll(b).groupBy("suppkey")
          .agg(F.count(F.lit(1)).alias("n"))
          .select(F.lit("except_all").alias("op"), "suppkey", "n"))
    ia = (a.intersectAll(b).groupBy("suppkey")
          .agg(F.count(F.lit(1)).alias("n"))
          .select(F.lit("intersect_all").alias("op"), "suppkey", "n"))
    return ea.unionAll(ia)


_CONTAIN = dict(shingle_n=2, threshold=0.5)


@q("dedup_ngram_containment", ("J5", "F11", "W2"), oracle=f"""
WITH tok AS (
  SELECT doc_id, lang, {O_TOKENS.format(c='text')} AS toks FROM documents
), sh AS (
  SELECT doc_id, lang, list_distinct(CASE WHEN len(toks) <= 2
           THEN [array_to_string(toks, ' ')]
           ELSE [array_to_string(toks[i:i+1], ' ')
                 for i in generate_series(1, len(toks) - 1)]
         END) AS sh
  FROM tok
)
SELECT a.doc_id AS key_src, b.doc_id AS key_in,
       len(list_intersect(a.sh, b.sh)) / len(a.sh) AS containment
FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id <> b.doc_id
WHERE len(a.sh) > 0
  AND len(list_intersect(a.sh, b.sh)) / len(a.sh)
      >= {_CONTAIN["threshold"]}
""")
def dedup_ngram_containment(spark: "SparkSession", sf_dir: str
                            ) -> "DataFrame":
    """Directional shingle containment — the subset-duplication
    detector Jaccard misses (a short doc quoted inside a long one has
    high containment, low Jaccard).  Blocked on lang like the Jaccard
    twin; see operators.dedup.ngram_containment_pairs."""
    from .operators.dedup import ngram_containment_pairs
    d = load(spark, sf_dir, "documents")
    return ngram_containment_pairs(d, "text", "doc_id", block_col="lang",
                                   **_CONTAIN)


@q("asof_forward_join", ("J4", "W1"), oracle="""
WITH c AS (SELECT * FROM events WHERE event_type = 'click'),
p0 AS (
  SELECT user_id, ts, MIN(event_id) AS event_id
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
), m AS (
  SELECT c.event_id AS click_id, c.user_id, c.ts,
         MIN(p0.ts) AS next_ts
  FROM c LEFT JOIN p0 ON p0.user_id = c.user_id AND p0.ts >= c.ts
  GROUP BY 1, 2, 3
)
SELECT m.click_id, m.user_id AS user_id,
       p0.event_id AS next_purchase_id, m.next_ts AS next_purchase_ts
FROM m LEFT JOIN p0
  ON p0.user_id = m.user_id AND p0.ts = m.next_ts
""")
def asof_forward_join(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """FORWARD as-of join — each click attached to the EARLIEST
    same-user purchase at or after it (time-to-conversion shape); the
    direction the gated backward variant (asof_threshold_join) leaves
    untested.  Same union-window plan: one shuffle on user_id, one
    descending-sorted window, no right-history explosion — the oracle
    is the unscalable theta-join + double-argmin restatement.  The
    purchase side is pre-deduped to one row per (user, ts) (min
    event_id) so the attached payload is deterministic under ties."""
    ev = load(spark, sf_dir, "events")
    clicks = (ev.filter(F.col("event_type") == "click")
              .select(F.col("event_id").alias("click_id"),
                      "user_id", "ts"))
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .groupBy("user_id", "ts")
                 .agg(F.min("event_id").alias("event_id")))
    joined = asof_join(clicks, purchases, on="user_id", ts="ts",
                       payload=["event_id"], direction="forward")
    # forward as-of fills from rows with right.ts >= left.ts; surface
    # the matched purchase ts by re-deriving it from the payload join
    return (joined
            .join(purchases.select("user_id",
                                   F.col("ts").alias("next_purchase_ts"),
                                   F.col("event_id").alias("right_event_id")),
                  ["user_id", "right_event_id"], "left")
            .select("click_id", "user_id",
                    F.col("right_event_id").alias("next_purchase_id"),
                    "next_purchase_ts"))


@q("variant_json_shredding", ("F8",), oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INT) AS k,
       CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_mod,
       json_valid(props) AS is_valid
FROM events
""")
def variant_json_shredding(spark: "SparkSession",
                           sf_dir: str) -> "DataFrame":
    """Semi-structured shredding through Spark 4's VARIANT type
    (`parse_json` → `variant_get`) — the lakehouse-native replacement
    for repeated `get_json_object` string re-parsing: the document is
    parsed ONCE into the binary variant encoding and every field access
    is a typed path lookup, which is how an open-format table would
    store the reference's CDC payloads (README_DBT.md:163-169) at
    100 TB (shredded columnar variant beats string JSON by an order of
    magnitude on repeated access).  Oracle: DuckDB JSON path extraction
    over the same documents."""
    e = load(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    return e.select(
        "event_id",
        F.expr("variant_get(parse_json(props), '$.k', 'int')").alias("k"),
        (F.expr("variant_get(parse_json(props), '$.k', 'int')") % 10)
        .alias("k_mod"),
        F.expr("try_parse_json(props) IS NOT NULL").alias("is_valid"))


@q("udtf_doc_chunker", ("F9",), oracle="""
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     x -> x <> '') AS t
  FROM documents
)
SELECT doc_id, CAST(i - 1 AS INT) AS pos,
       array_to_string(t[(i-1)*8+1:(i-1)*8+8], ' ') AS chunk
FROM tok, LATERAL (SELECT unnest(generate_series(
     1, CAST(ceil(len(t)/8.0) AS INT))) AS i) g
""")
def udtf_doc_chunker(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Document chunking via a Spark 4 Python UDTF in a LATERAL join —
    the table-function API surface (one input row → N typed output
    rows) that RAG/doc-prep pipelines use for custom chunkers whose
    logic (sentence packing, token budgets, overlap) outgrows SQL.

    Honesty note on the 100 TB stance: a UDTF is the Python row path;
    for THIS fixed-width chunker the production implementation is the
    pure-builtin slice/posexplode in ``boilerplate_chunk_removal`` —
    the UDTF exists to gate the API's correctness (arity, ordering,
    lateral correlation) against a SQL oracle, so a user bringing a
    genuinely non-relational chunker inherits verified plumbing.  When
    the custom logic truly needs Python AT SCALE, use the
    Arrow-batched shape instead: ``arrow_doc_chunker`` below is the
    same chunker gated by the same oracle through ``mapInPandas``."""
    from pyspark.sql.functions import udtf

    import re as _re
    # split on the RE2 \s class ([\t\n\f\r ]) exactly as the DuckDB
    # oracle's string_split_regex does — Python str.split() would also
    # split on Unicode whitespace (U+00A0 …) and silently diverge
    ws = _re.compile(r"[\t\n\f\r ]+")

    @udtf(returnType="pos: int, chunk: string")
    class FixedChunker:
        def eval(self, text: str):
            toks = [t for t in ws.split((text or "").lower()) if t]
            for i in range(0, len(toks), 8):
                yield (i // 8, " ".join(toks[i:i + 8]))

    spark.udtf.register("fixed_chunker", FixedChunker)
    d = load(spark, sf_dir, "documents")
    d.createOrReplaceTempView("_udtf_docs")
    return spark.sql("""
        SELECT d.doc_id, c.pos, c.chunk
        FROM _udtf_docs d, LATERAL fixed_chunker(d.text) c
    """)


@q("arrow_doc_chunker", ("F9",), oracle="""
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     x -> x <> '') AS t
  FROM documents
)
SELECT doc_id, CAST(i - 1 AS INT) AS pos,
       array_to_string(t[(i-1)*8+1:(i-1)*8+8], ' ') AS chunk
FROM tok, LATERAL (SELECT unnest(generate_series(
     1, CAST(ceil(len(t)/8.0) AS INT))) AS i) g
""")
def arrow_doc_chunker(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """The PRODUCTION twin of ``udtf_doc_chunker``: the same
    fixed-width chunker as an Arrow-batched ``mapInPandas`` transform
    (1 input batch → one expanded output batch), gated by the SAME
    DuckDB oracle — so the two Python API surfaces (row-path UDTF for
    API correctness, Arrow path for scale) are certified equivalent
    and nobody needs to reach for the UDTF at 100 TB.

    Scale design: Arrow transfers columns batch-wise (no per-row
    pickling — the 10-100× difference vs BatchEvalPython); the 1→k
    expansion stays bounded by
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` input rows per
    batch, and only (doc_id, pos, chunk) columns cross the boundary.
    Plan shows FlatMapGroupsInPandas-family Arrow eval, never
    BatchEvalPython (plan-lint enforced)."""
    import re as _re

    import pandas as pd

    # RE2-\s-compatible split — see udtf_doc_chunker's note
    ws = _re.compile(r"[\t\n\f\r ]+")

    def chunk(batches):
        for pdf in batches:
            ids: list = []
            poss: list = []
            chunks: list = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                toks = [t for t in ws.split((text or "").lower()) if t]
                for i in range(0, len(toks), 8):
                    ids.append(doc_id)
                    poss.append(i // 8)
                    chunks.append(" ".join(toks[i:i + 8]))
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "pos": pd.Series(poss, dtype="int32"),
                "chunk": pd.Series(chunks, dtype="object")})

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInPandas(chunk, "doc_id bigint, pos int, chunk string")


@q("json_schema_profile", ("F8", "A1", "ST6"), oracle="""
WITH keys AS (
  SELECT event_id, unnest(json_keys(props)) AS k
  FROM events WHERE json_valid(props)
), tot AS (
  SELECT COUNT(*) AS n_docs FROM events
)
SELECT k AS field,
       COUNT(*) AS n_present,
       CAST((COUNT(*) * 1000000) // (SELECT n_docs FROM tot) AS BIGINT)
         AS presence_ppm
FROM keys GROUP BY 1
""")
def json_schema_profile(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Schema-drift monitor for semi-structured feeds: per-field
    presence counts/ratios across the corpus (`json_object_keys`
    exploded → count per key).  This is the observability half of
    schema evolution (SURVEY §2 ST6): a new producer field shows up as
    a rising presence curve, a dropped field as a falling one, BEFORE
    any consumer breaks.  One explode + one key-sized aggregate — the
    profile relation is bounded by distinct field-name count, so at
    100 TB it broadcasts back into alerting joins for free.  Integer
    ppm (floor division) keeps the ratio engine-exact."""
    e = load(spark, sf_dir, "events")
    valid = e.filter(F.expr("try_parse_json(props) IS NOT NULL"))
    keys = valid.select(
        "event_id", F.explode(F.json_object_keys("props")).alias("field"))
    total = e.agg(F.count(F.lit(1)).alias("n_docs"))  # 1-row broadcast
    return (keys.groupBy("field")
            .agg(F.count(F.lit(1)).alias("n_present"))
            .crossJoin(F.broadcast(total))
            .selectExpr("field", "n_present",
                        "(n_present * 1000000) div n_docs"
                        " AS presence_ppm"))


@q("map_token_frequencies", ("F9", "A1"), oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest({O_TOKENS.format(c='text')}) AS w FROM documents
), freq AS (
  SELECT doc_id, w, COUNT(*) AS n FROM tok GROUP BY 1, 2
)
SELECT doc_id,
       COUNT(*) AS n_distinct_tokens,
       CAST(COALESCE(MAX(CASE WHEN w = 'data' THEN n END), 0) AS BIGINT)
         AS data_count,
       CAST(SUM(CASE WHEN n >= 5 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_frequent
FROM freq GROUP BY doc_id
""")
def map_token_frequencies(spark: "SparkSession",
                          sf_dir: str) -> "DataFrame":
    """MapType(String→Long) as a first-class column (SURVEY §1.3 [EXT]
    metadata-map type): per-document token-frequency maps built with
    ``map_from_entries`` over aggregated (token, count) structs, then
    consumed with the map algebra — ``map_keys`` cardinality,
    ``element_at`` point lookup, ``map_filter`` + size for a threshold
    count.  All map construction/access is JVM expression work on the
    already-aggregated relation (maps never ride a shuffle wider than
    their entry structs); outputs are scalars so the hash gate is
    map-iteration-order independent."""
    d = load(spark, sf_dir, "documents")
    freq = (d.select("doc_id", F.explode(tokens(F.col("text"))).alias("w"))
            .groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("n")))
    mapped = (freq.groupBy("doc_id")
              .agg(F.map_from_entries(
                  F.collect_list(F.struct("w", "n"))).alias("tf")))
    return mapped.select(
        "doc_id",
        F.size(F.map_keys("tf")).cast("long").alias("n_distinct_tokens"),
        F.coalesce(F.element_at("tf", "data"), F.lit(0)).cast("long")
        .alias("data_count"),
        F.size(F.map_filter("tf", lambda k, v: v >= 5)).cast("long")
        .alias("n_frequent"))


# Interpolate the parameter placeholders into the real
# __doc__ attributes (a '"""...""".format(...)' first statement
# is a discarded expression, not a docstring — help()/inspect
# saw None for these functions until this pass).
dedup_minhash_lsh_capped.__doc__ = dedup_minhash_lsh_capped.__doc__.format(cap=_MINHASH_CAP)
embedding_neardup_capped.__doc__ = embedding_neardup_capped.__doc__.format(cap=_ENDUP_CAP)
