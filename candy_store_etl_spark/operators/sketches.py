"""Bounded-memory frequent-items: Misra-Gries candidates + exact verify.

The last classic sketch family missing from the catalog (HLL,
quantile, Bloom, MinHash, SimHash are covered): ε-heavy-hitters.
On Spark the naive plan — ``groupBy(item).count()`` then filter — is
already distributed, but at 100 TB its shuffle carries one record per
DISTINCT item per map partition; for n-gram-shaped domains (quadrillions
of distinct keys, Zipf-distributed) that shuffle volume is the
bottleneck. The two-phase sketch plan bounds it:

1. **Candidate generation** — each input partition folds its rows into
   a Misra-Gries summary of ``k`` counters via ``mapInPandas``. The
   fold is the MERGEABLE-summaries form (Agarwal et al., PODS'12):
   per Arrow batch, a C-speed ``value_counts`` is combined into the
   running summary by adding counts, subtracting the (k+1)-th largest
   total from everything, and dropping non-positives — never a
   per-row Python loop. Each partition emits ≤ k candidate rows.
2. **Exact verify** — the tiny candidate union is broadcast back and
   the true counts of ONLY those items are computed exactly; the
   final filter keeps items above the global threshold.

Guarantee (what makes the output deterministic and oracle-checkable):
a k-counter Misra-Gries summary of a partition with n_p rows retains
every item whose local count exceeds n_p/(k+1); if an item's GLOBAL
count exceeds n/(k+1), by pigeonhole some partition holds it above its
local n_p/(k+1). The union of partition summaries therefore contains
every item with global count > n/(k+1) — so for any threshold
n/t with t ≤ k, phase 2's exact filter returns EXACTLY the true
heavy-hitter set, independent of partitioning, row order, or how the
sketch pruned everything else (pinned by tests/test_sketches.py on a
Zipf vocabulary much larger than k, across partitionings).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType


def misra_gries_candidates(
    items: DataFrame, col: str, k: int, *, weight: str | None = None
) -> DataFrame:
    """≤ k candidate values per input partition via a mergeable
    Misra-Gries fold (see module docstring). Output: distinct ``col``
    values — a SUPERSET of every item with global frequency >
    1/(k+1).

    The output column keeps the SOURCE column's type: the candidates
    are joined back against the original relation in the exact-verify
    phase, and a hardcoded string output would force an implicit
    string-vs-native cast on that join for int/float keys — silently
    dropping candidates and voiding the exactness guarantee
    (round-5 advisory).

    NULL keys are excluded at the source (round-6 review): they are
    not items — and letting null-bearing int64 batches through would
    coerce the whole pandas column to float64, corrupting candidate
    values above 2^53 on the round-trip and silently dropping a true
    heavy hitter. ``heavy_hitters_exact`` applies the same filter to
    its denominator, so both phases see one universe.

    ``weight``: when the input is PRE-AGGREGATED (col, weight) partial
    counts (e.g. from ``char_ngram_partial_counts``), fold weights
    instead of row occurrences. The retention bound transfers
    verbatim — MG over weighted items retains every item whose
    weighted local mass exceeds W_p/(k+1)."""

    src_field = items.schema[col]
    out_schema = StructType(
        [StructField(col, src_field.dataType, False)]
    )
    keep_str = isinstance(src_field.dataType, StringType)
    items = items.filter(F.col(col).isNotNull())
    cols = [col] if weight is None else [col, weight]
    items = items.select(*cols)

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        summary = pd.Series(dtype="int64")
        for pdf in batches:
            counts = (
                pdf[col].value_counts()
                if weight is None
                else pdf.groupby(col, sort=False)[weight].sum()
            )
            summary = summary.add(counts, fill_value=0)
            if len(summary) > k:
                # mergeable-summaries step: SUBTRACT the (k+1)-th
                # largest from every counter, keep positives (≤ k
                # survive). The subtraction is load-bearing: each
                # prune removes ≥ (k+1)·cut of counter mass, so the
                # cuts sum to ≤ n_p/(k+1) and every item's counter
                # underestimates its true local count by at most that
                # — which is exactly why locally-heavy items always
                # survive. Pruning WITHOUT subtracting (plain top-k)
                # has no such bound.
                cut = summary.nlargest(k + 1).iloc[-1]
                summary = summary - cut
                summary = summary[summary > 0]
        vals = summary.index
        # pandas may have widened the index dtype (e.g. object); pin
        # strings explicitly, let Arrow cast numerics to the declared
        # source type
        yield pd.DataFrame({col: vals.astype(str) if keep_str else vals})

    return items.mapInPandas(fold, out_schema).distinct()


def heavy_hitters_exact(
    items: DataFrame, col: str, *, t: int, k: int = 256
) -> DataFrame:
    """All values of ``col`` with exact count * t > total rows —
    computed via the sketch-prune + exact-verify plan. ``t`` must be
    ≤ k for the candidate superset guarantee to hold (asserted).

    Returns (col, cnt, share_ppm): exact count and integer
    parts-per-million share (count * 1e6 div n), both deterministic.
    NULL keys are not items: excluded from candidates, counts, AND the
    total n (one universe across both phases — round-6 review).

    Delegates to ``heavy_hitters_from_partials`` with unit weights —
    an unweighted occurrence IS a partial count of 1, so one
    implementation carries the guard, the null-universe discipline,
    and the threshold/ppm expressions for both forms."""
    unit = items.select(col).withColumn("__w1", F.lit(1).cast("long"))
    return heavy_hitters_from_partials(unit, col, "__w1", t=t, k=k)


def char_ngram_partial_counts(
    docs: DataFrame, text_col: str, *, n: int = 3, max_pos: int | None = None
) -> DataFrame:
    """(ngram, cnt) partial counts per Arrow batch, WITHOUT ever
    materializing one row per n-gram occurrence.

    The explode plan materializes ~len(text) rows per document through
    the JVM before anything aggregates — at sf10 that is ~450M short
    strings, and round-6's A/B showed the explode COMPUTE (not cache
    shape, not shuffle) is the trigram heavy-hitter's entire bill.
    This counter keeps the occurrence relation virtual: per Arrow
    batch, each text's code points are decoded once into a numpy
    uint32 array (``utf-32-le`` — CHARACTER semantics, matching
    substr-based oracles for all of Unicode), every n-gram window is
    packed into one int64 (21 bits per code point, collision-free
    since code points < 2^21), and one ``np.unique`` over the batch's
    concatenated codes yields the distinct n-grams with counts. Only
    the DISTINCT n-grams per batch (a vocabulary-sized set) are
    decoded back to strings and emitted.

    ``max_pos`` caps n-gram START positions per document (shared-cap
    discipline with SQL oracles: position i in 1..min(len-n+1,
    max_pos)).

    Feed the result to ``heavy_hitters_from_partials`` (weighted MG
    fold); at 100 TB the shuffle carries vocabulary-sized partials
    instead of the corpus's n-gram occurrences."""
    import numpy as np

    if n < 1 or n * 21 > 63:
        # 21 bits per code point in a SIGNED int64: n >= 4 would wrap
        # silently in numpy shifts, colliding distinct n-grams into one
        # code (wrong counts) and decoding garbage — fail loudly instead
        raise ValueError(
            f"n={n} not packable: 21-bit-per-codepoint int64 packing "
            "supports 1 <= n <= 3"
        )

    out_schema = StructType(
        [
            StructField("ngram", StringType(), False),
            StructField("cnt", LongType(), False),
        ]
    )
    mask = (1 << 21) - 1

    def count_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            per_doc = []
            for s in pdf[text_col]:
                if s is None:
                    continue
                cp = np.frombuffer(
                    s.encode("utf-32-le"), dtype=np.uint32
                )
                if max_pos is not None:
                    cp = cp[: max_pos + n - 1]
                w = len(cp) - n + 1
                if w <= 0:
                    continue
                code = np.zeros(w, dtype=np.int64)
                for j in range(n):
                    code = (code << 21) | cp[j : j + w].astype(np.int64)
                per_doc.append(code)
            if not per_doc:
                continue
            uniq, cnts = np.unique(np.concatenate(per_doc), return_counts=True)
            grams = [
                "".join(
                    chr((int(c) >> (21 * (n - 1 - j))) & mask)
                    for j in range(n)
                )
                for c in uniq
            ]
            yield pd.DataFrame(
                {"ngram": grams, "cnt": cnts.astype("int64")}
            )

    return docs.select(text_col).mapInPandas(count_batches, out_schema)


def heavy_hitters_from_partials(
    partials: DataFrame, col: str, weight: str, *, t: int, k: int = 256
) -> DataFrame:
    """``heavy_hitters_exact`` over a PRE-AGGREGATED (col, weight)
    relation — same output contract (col, cnt, share_ppm), same
    retention guarantee (weighted MG), but every phase aggregates
    weights: the exact-verify shuffle carries partial counts, never
    occurrences. NULL keys excluded from both phases, as in the
    unweighted form."""
    if t > k:
        raise ValueError(f"threshold divisor t={t} must be <= k={k}")
    from ..caching import tracked_cache

    cached = (
        partials.select(col, weight)
        .filter(F.col(col).isNotNull())
        .transform(tracked_cache)
    )
    total = cached.agg(F.sum(weight).alias("__n"))
    cands = misra_gries_candidates(cached, col, k, weight=weight)
    exact = (
        cached.join(F.broadcast(cands), col)
        .groupBy(col)
        .agg(F.sum(weight).alias("cnt"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * t > F.col("__n"))
        .select(
            col,
            F.col("cnt").cast("long").alias("cnt"),
            F.expr("cnt * CAST(1000000 AS BIGINT) div __n")
            .cast("long")
            .alias("share_ppm"),
        )
    )
