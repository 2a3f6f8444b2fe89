"""Relational + LLM-pipeline operators (SURVEY §2 J/W rows + [EXT])."""

from .dedup import (
    exact_dedup,
    fingerprint_dedup,
    minhash_signatures,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    window_dedup,
)
from .similarity import (brute_force_topk, embedding_neardup_pairs,
                         lsh_bucket_topk)
from .scd import scd1_current
from .rollup import time_rollup
from .asof import asof_join

__all__ = [
    "exact_dedup", "fingerprint_dedup", "window_dedup",
    "minhash_signatures", "minhash_lsh_pairs", "ngram_jaccard_pairs",
    "simhash",
    "brute_force_topk", "embedding_neardup_pairs", "lsh_bucket_topk",
    "scd1_current", "time_rollup", "asof_join",
]
