"""Text-analysis column expressions — pure built-in functions.

Everything here stays JVM-side inside whole-stage codegen: no Python
UDFs in the hot path. These are the building blocks for the
documents-table operators (token counting, quality scoring, language
heuristics, fingerprinting) that a training-data pipeline runs over
billions of documents.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (collapses runs, drops empties)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), r"\s+"), lambda x: x != "")


# DuckDB twin of ``tokens`` for oracle SQL (kept next to the Spark
# form so they can only drift together).
SQL_TOKENS = "list_filter(string_split_regex(trim(text), '\\s+'), x -> x != '')"

# The corpus's filler/stopword vocabulary (the synthetic generator's
# six function words) — canonical home; plans/text.py and the funnel
# primitives import these so the Spark and SQL forms cannot drift.
FILLER_TOKENS = ("a", "the", "big", "small", "slow", "fast")
SQL_FILLER_IN = "('a','the','big','small','slow','fast')"


def token_chars(toks: Column) -> Column:
    """Total characters across tokens (exact integer arithmetic)."""
    return F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x)).cast("long")


def avg_token_len(toks: Column) -> Column:
    return token_chars(toks) / F.size(toks)


def distinct_ratio(toks: Column) -> Column:
    """Lexical diversity: distinct tokens / total tokens."""
    return F.size(F.array_distinct(toks)) / F.size(toks)


def stopword_ratio(toks: Column, stopwords: Sequence[str]) -> Column:
    """Fraction of tokens that are stopwords."""
    sw = list(stopwords)
    return F.size(F.filter(toks, lambda x: x.isin(*sw))) / F.size(toks)


def window_join(toks: Column, start: Column, n: int) -> Column:
    """``concat_ws(' ', toks[start], …, toks[start+n-1])`` (1-based)
    via ``n`` element_at reads — byte-identical to ``concat_ws(' ',
    slice(toks, start, n))`` for the non-null token arrays every
    caller feeds (r13: equality verified corpus-wide), and measured
    2.2-2.4x faster at sf1: ``slice`` allocates a fresh n-element
    array per window, ``element_at`` reads the backing array in
    place. The window width must be a Python int (it unrolls)."""
    return F.concat_ws(
        " ", *[F.element_at(toks, start + k) for k in range(n)]
    )


def word_shingles(toks: Column, n: int = 3) -> Column:
    """Overlapping n-word shingles (the MinHash/Jaccard unit).

    Documents shorter than ``n`` tokens yield a single whole-document
    shingle so they still participate in dedup.

    ``toks`` MUST be a staged column (an attribute), not an inline
    ``tokens(...)`` expression: the shingle lambda references the
    array once per window token, and an interpreted lambda body
    re-evaluates any non-column subtree PER REFERENCE — an inline
    tokenization would run n times per window (r13; measured +0.5 s
    on the bloom prefilter at sf0.1 before its call site was staged).
    """
    joined = F.concat_ws(" ", toks)
    shingled = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: window_join(toks, i + 1, n),
    )
    return F.when(F.size(toks) <= n, F.array(joined)).otherwise(shingled)
