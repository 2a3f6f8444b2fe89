"""Column-level function library (SURVEY §2.7 F8-F11 + [EXT] text/vector)."""

from .text import (
    LANG_LEXICONS,
    fingerprint,
    language_id,
    ngrams,
    quality_score,
    regex_token_count,
    tokens,
)
from .units import to_units
from .vector import cosine_micro, cosine_similarity, dot, l2_norm

__all__ = [
    "tokens", "ngrams", "language_id", "quality_score",
    "regex_token_count", "fingerprint", "LANG_LEXICONS",
    "cosine_micro", "cosine_similarity", "dot", "l2_norm", "to_units",
]
