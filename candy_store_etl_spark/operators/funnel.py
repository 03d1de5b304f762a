"""Shared pretraining-funnel stage primitives.

The round-7 capstone (``pretraining_pipeline_funnel``), the
incremental composite (``incremental_corpus_refresh``), and the
streaming refresh sink (``streaming/refresh.py``) all gate documents
through the same stages — composite quality score, exact content
fingerprint, bag-of-words near-dup fingerprint. Each primitive lives
here exactly ONCE, in TWO adjacent forms: the Spark Column expression
the plan uses and the DuckDB SQL fragment its oracle uses — adjacency
is the drift guard (same discipline as ``functions/text.py``'s
``tokens``/``SQL_TOKENS`` pair).

Extracted from the capstone's inline expressions the moment a second
composite needed them (the round-7 "reusable funnel stages" item);
moved from ``plans/`` to ``operators/`` when the STREAMING consumer
arrived (plans imports streaming, so streaming cannot import plans).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..functions.text import (
    FILLER_TOKENS as _FILLER,
    SQL_FILLER_IN as _SQL_FILLER,
    distinct_ratio,
    stopword_ratio,
)


def quality_ok(toks: Column, qmin: float) -> Column:
    """``corpus_curation``'s composite quality formula as a survival
    flag: 0.5*distinct_ratio + 0.3*length_score + 0.2*(1-filler_ratio)
    over whitespace tokens, with the >=5-token floor. Identical
    association order to the SQL twin below — the two can only drift
    together."""
    n_tok = F.size(toks)
    dr = distinct_ratio(toks)
    fr = stopword_ratio(toks, _FILLER)
    ls = F.least(n_tok / F.lit(40.0), F.lit(1.0))
    quality = 0.5 * dr + 0.3 * ls + 0.2 * (1.0 - fr)
    return (n_tok >= 5) & (quality >= qmin) & (n_tok > 0)


def sql_quality_select(src: str, qmin: float) -> str:
    """DuckDB CTE body selecting the quality survivors of ``src``
    (which must expose doc_id, source, text, toks)."""
    return f"""SELECT doc_id, source, text, toks FROM (
        SELECT *, len(toks) AS n_tokens,
               len(list_distinct(toks)) * 1.0 / len(toks) AS dr,
               len(list_filter(toks, x -> x IN {_SQL_FILLER})) * 1.0
                 / len(toks) AS fr,
               LEAST(len(toks) / 40.0, 1.0) AS ls
        FROM {src} WHERE len(toks) > 0
      )
      WHERE n_tokens >= 5
        AND 0.5 * dr + 0.3 * ls + 0.2 * (1.0 - fr) >= {qmin}"""


def content_fp(text: Column) -> Column:
    """Exact-dedup fingerprint: md5 of the lowercased trimmed text."""
    return F.md5(F.lower(F.trim(text)))


def sql_content_fp(col: str = "text") -> str:
    return f"md5(lower(trim({col})))"


def bow_fp(toks: Column) -> Column:
    """Bag-of-words near-dup fingerprint: md5 of the sorted distinct
    token set — word-order-invariant, the portable tier of the
    near-dup family."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks))))


def sql_bow_fp(toks: str = "toks") -> str:
    return f"md5(array_to_string(list_sort(list_distinct({toks})), ' '))"
