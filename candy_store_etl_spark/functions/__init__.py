from .text import (
    avg_token_len,
    distinct_ratio,
    stopword_ratio,
    token_chars,
    tokens,
    word_shingles,
)
from .vectors import cosine_similarity, dot, l2_norm, to_double_array

__all__ = [
    "tokens",
    "token_chars",
    "avg_token_len",
    "distinct_ratio",
    "stopword_ratio",
    "word_shingles",
    "to_double_array",
    "dot",
    "l2_norm",
    "cosine_similarity",
]
