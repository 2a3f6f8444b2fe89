"""Text-analysis column functions ([EXT] north star: language-ID,
quality scoring, token counting, fingerprinting — BASELINE.json).

Everything here is built from ``pyspark.sql.functions`` only — JVM-side,
whole-stage-codegen-eligible, no Python in the row path.  Each function
has an exact DuckDB-SQL twin used by the oracle gate (see
queries_text.py), so the implementations deliberately stick to
primitives with identical cross-engine semantics (md5, regex classes,
set ops on arrays, integer→double division).

At 100 TB these are embarrassingly parallel map-only transforms: no
shuffle, no state, fully pipelined into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny per-language lexicons for the n-gram/stopword-overlap heuristic
#: language ID.  Deliberately small & deterministic; a production system
#: swaps in real frequency tables without changing the operator shape.
LANG_LEXICONS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "is", "in", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "dans", "pour"),
    "es": ("el", "la", "los", "y", "es", "un", "una", "en", "para", "que"),
}

#: BPE-ish tokenization regex: letter runs, digit runs, single symbols.
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(text: Column | str) -> Column:
    """Whitespace tokens, lowercased, empties dropped."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(c), r"\s+"), lambda x: x != "")


def ngrams(toks: Column, n: int = 3, sep: str = " ") -> Column:
    """Word n-grams ("shingles") from a token array — the MinHash unit.

    Implemented as a sequence-index transform (no explode → no row
    blow-up before hashing).  Docs shorter than ``n`` tokens yield the
    whole doc as one shingle so they still participate in dedup.
    """
    # zip_with over shifted slices instead of transform-over-indices
    # with per-element F.get: same outputs, ~8× faster (the get path
    # re-checks bounds per element inside an interpreted lambda; the
    # zip formulation runs one vectorized pass per shift).  zip_with
    # pads the shorter side with NULL and concat_ws drops NULLs, so
    # docs shorter than n collapse to one whole-doc shingle; the final
    # slice trims the padded tail.
    zipped = toks
    for j in range(1, n):
        # slice length = size(toks): always covers the full tail — a
        # fixed constant would silently truncate docs with more tokens
        # than it, null-padding their tail shingles into (n-1)-grams
        zipped = F.zip_with(zipped, F.slice(toks, j + 1, F.size(toks)),
                            lambda a, b: F.concat_ws(sep, a, b))
    sliced = F.slice(zipped, 1,
                     F.greatest(F.size(toks) - (n - 1), F.lit(1)))
    # empty token list → one empty shingle (matches the oracle's
    # whole-doc fallback for len(toks) <= n)
    return F.array_distinct(
        F.when(F.size(toks) == 0, F.array(F.lit(""))).otherwise(sliced))


def language_id(text: Column | str,
                lexicons: dict[str, tuple[str, ...]] | None = None,
                fallback: str = "und") -> Column:
    """Heuristic language ID: argmax of lexicon-token overlap.

    Deterministic tie-break: languages are compared in sorted key order
    and the first max wins; zero overlap → ``fallback``.
    """
    lex = lexicons or LANG_LEXICONS
    toks = tokens(text)
    scores = {lang: F.size(F.array_intersect(
        toks, F.array(*[F.lit(w) for w in words])))
        for lang, words in sorted(lex.items())}
    best_score = F.greatest(*scores.values())
    result = F.lit(fallback)
    # build right-to-left so earlier (sorted-first) languages win ties
    for lang in sorted(scores, reverse=True):
        result = F.when(scores[lang] == best_score, F.lit(lang)) \
                  .otherwise(result)
    return F.when(best_score > 0, result).otherwise(F.lit(fallback))


def quality_score(text: Column | str,
                  stopwords: tuple[str, ...] = LANG_LEXICONS["en"]) -> Column:
    """Document quality score ∈ [0,1]: blend of length saturation,
    mean-token-length plausibility, and stopword ratio (the classic
    pre-training quality gates, each a cheap column expression)."""
    c = F.col(text) if isinstance(text, str) else text
    toks = tokens(c)
    n_tok = F.size(toks).cast("long")
    n_chars = F.length(c).cast("long")
    stop_hits = F.size(F.array_intersect(
        toks, F.array(*[F.lit(w) for w in stopwords]))).cast("long")
    # Integer micro-unit arithmetic end-to-end (doctrine 4): each
    # component is an exact integer in [0, 1e6], so the blend is exact
    # and the ONLY float op is the final division of an exact int by
    # 3e6 — bit-identical in any engine.  (A raw double blend differs
    # in the last ulp between Spark and DuckDB — different expression
    # compilation — and ROUND(blend, 6) trades that for the HALF_UP
    # boundary hazard; exact integers sidestep both.)
    # length saturation: 1 at ≥200 tokens → n_tok/200 = n_tok·5000 µ
    len_u = F.least(n_tok * 5000, F.lit(1000000).cast("long"))
    # mean token length ideal ≈ 5: |n_chars/(n_tok+1) − 5|/5 =
    # |n_chars − 5(n_tok+1)| / (5(n_tok+1)), floored at micro
    # precision via the mod identity (a − a%b)/b — the numerator is
    # exactly divisible, so the one double division is exact
    den = 5 * (n_tok + 1)
    sh_dev = F.abs(n_chars - 5 * (n_tok + 1)) * 1000000
    sh_q = ((sh_dev - sh_dev % den) / den).cast("long")
    sh_u = (F.lit(1000000).cast("long")
            - F.least(sh_q, F.lit(1000000).cast("long")))
    # stopword ratio: stop_hits/4 = stop_hits·250000 µ
    stop_u = F.least(stop_hits * 250000, F.lit(1000000).cast("long"))
    return (len_u + sh_u + stop_u).cast("double") / F.lit(3000000.0)


def regex_token_count(text: Column | str,
                      pattern: str = TOKEN_REGEX) -> Column:
    """BPE-ish token count: letter runs + digit runs + single symbols."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(pattern), F.lit(0)))


def fingerprint(text: Column | str) -> Column:
    """Order-insensitive document fingerprint: md5 of the sorted distinct
    token set — the classic 'fingerprint clustering' key for grouping
    reordered/whitespace-variant duplicates."""
    toks = tokens(text)
    return F.md5(F.array_join(F.array_sort(F.array_distinct(toks)), " "))
