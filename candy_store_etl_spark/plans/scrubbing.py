"""Corpus scrubbing + model-based quality queries — the remaining
standard stages of a pre-training data pipeline: PII redaction,
per-domain balancing, a corpus-LM perplexity proxy, and a fixed-weight
quality classifier. All JVM-side built-ins with DuckDB oracles.

The documents testdata is synthetic word-soup with no PII, so the
redaction query APPENDS deterministic doc_id-derived PII spans
(identically in Spark and the oracle) before scrubbing them — the
redaction path is exercised on guaranteed-nonzero matches while both
engines see byte-identical input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..caching import tracked_persist

from ..functions.rounding import SQL_FROUND, fround
from ..functions.text import tokens, word_shingles
from ..operators.dedup import explode_nonempty
from ..sources.tpch import load_table
from .registry import register

# Patterns restricted to the Java-regex ∩ RE2 common subset (no
# backrefs / lookaround), passed verbatim to both engines. Replacement
# order is email → IP → phone; the inserted tags contain no digits so
# later patterns cannot match inside earlier replacements.
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PII_PHONE = r"\+\d[\d-]{5,}\d"

# doc_id-derived PII suffix, written once and twinned exactly in SQL.
_SQL_AUG = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR)"
    " || '@mail.example.com from host 10.'"
    " || CAST(doc_id % 200 AS VARCHAR) || '.0.'"
    " || CAST(doc_id % 250 AS VARCHAR) || ' call +1-555-'"
    " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' end'"
)


def _aug_text() -> F.Column:
    return F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com from host 10."),
        (F.col("doc_id") % 200).cast("string"),
        F.lit(".0."),
        (F.col("doc_id") % 250).cast("string"),
        F.lit(" call +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" end"),
    )


@register(
    "pii_redact_docs",
    oracle=f"""
    WITH aug AS (SELECT doc_id, {_SQL_AUG} AS aug_text FROM documents),
    red AS (
      SELECT doc_id, aug_text,
             regexp_replace(
               regexp_replace(
                 regexp_replace(aug_text, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                 '{_PII_IPV4}', '<IP>', 'g'),
               '{_PII_PHONE}', '<PHONE>', 'g') AS redacted
      FROM aug
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(aug_text, '{_PII_EMAIL}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(aug_text, '{_PII_IPV4}')) AS BIGINT)
             AS n_ips,
           CAST(len(regexp_extract_all(aug_text, '{_PII_PHONE}')) AS BIGINT)
             AS n_phones,
           CAST(length(redacted) AS BIGINT) AS redacted_len,
           md5(redacted) AS redacted_md5
    FROM red
    """,
    doc="PII redaction (email/IPv4/phone regex scrub) with per-class "
    "match counts — the standard pre-release scrubbing pass. Patterns "
    "sit in the Java-regex ∩ RE2 subset; matches are synthesized "
    "deterministically from doc_id so counts are provably nonzero. "
    "Embarrassingly parallel: no shuffle, pure codegen.",
    tags=("text", "scrubbing"),
)
def pii_redact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", _aug_text().alias("aug_text")
    )
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("aug_text"), _PII_EMAIL, "<EMAIL>"),
            _PII_IPV4,
            "<IP>",
        ),
        _PII_PHONE,
        "<PHONE>",
    )
    docs = docs.select("doc_id", "aug_text", red.alias("redacted"))
    return docs.select(
        "doc_id",
        F.regexp_count("aug_text", F.lit(_PII_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count("aug_text", F.lit(_PII_IPV4)).cast("long").alias("n_ips"),
        F.regexp_count("aug_text", F.lit(_PII_PHONE)).cast("long").alias("n_phones"),
        F.length("redacted").cast("long").alias("redacted_len"),
        F.md5("redacted").alias("redacted_md5"),
    )


@register(
    "domain_capped_sample",
    oracle="""
    SELECT doc_id, source, rn FROM (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      FROM documents
    ) WHERE rn <= 10
    """,
    doc="Per-domain document cap (Common-Crawl-style source balancing): "
    "keep the first K=10 docs per source by doc_id. One shuffle on "
    "source; at 100 TB a skewed mega-domain is pre-reduced by a "
    "per-partition top-K before the window (see top_orders_per_customer "
    "for the audited pattern).",
    tags=("text", "sampling"),
)
def domain_capped_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("doc_id")
    return (
        docs.select(
            "doc_id", "source", F.row_number().over(w).cast("long").alias("rn")
        )
        .filter(F.col("rn") <= 10)
    )


# Bigram definition shared with doc_repetition_stats: docs with <= 2
# tokens contribute one whole-document shingle.
_SQL_TOKS = "list_filter(string_split_regex(trim(text), '\\s+'), x -> x != '')"
_SQL_BIGRAMS = """
  CASE WHEN len(toks) <= 2 THEN [array_to_string(toks, ' ')]
       ELSE list_transform(generate_series(1, len(toks) - 1),
                           i -> array_to_string(toks[i:i+1], ' '))
  END
"""


@register(
    "doc_bigram_logprob",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
    bg AS (
      SELECT doc_id, unnest({_SQL_BIGRAMS}) AS bg FROM tok
    ),
    occ AS (SELECT doc_id, bg, split_part(bg, ' ', 1) AS w1 FROM bg),
    c2 AS (SELECT w1, bg, COUNT(*) AS n2 FROM occ GROUP BY w1, bg),
    c1 AS (SELECT w1, SUM(n2) AS n1 FROM c2 GROUP BY w1),
    model AS (
      SELECT c2.bg,
             CAST(FLOOR(-ln(CAST(c2.n2 AS DOUBLE) / CAST(c1.n1 AS DOUBLE))
                        * 10000.0) AS BIGINT) * 100 AS nlp_micro
      FROM c2 JOIN c1 ON c2.w1 = c1.w1
    )
    SELECT occ.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(model.nlp_micro) AS BIGINT) AS sum_nlp_micro,
           CAST(SUM(model.nlp_micro) // COUNT(*) AS BIGINT) AS avg_nlp_micro
    FROM occ JOIN model ON occ.bg = model.bg
    GROUP BY occ.doc_id
    """,
    doc="Corpus-LM perplexity proxy (CCNet-style quality signal): fit a "
    "bigram model on the corpus itself, score each document by its "
    "mean negative log-probability. Per-bigram terms are floored at "
    "4-dp nat resolution (in micro-units) BEFORE summation, so group "
    "sums are "
    "order-independent and bit-identical across engines. At 100 TB the "
    "count-pruned model is broadcast (as here); documents never "
    "shuffle — only the exploded bigram relation does, once.",
    tags=("text", "quality", "lm"),
)
def doc_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens(F.col("text")).alias("toks")
    )
    occ = explode_nonempty(
        docs, "bg", word_shingles(F.col("toks"), 2), "doc_id"
    ).select("doc_id", "bg", F.split_part("bg", F.lit(" "), F.lit(1)).alias("w1"))
    occ = occ.transform(tracked_persist)
    c2 = occ.groupBy("w1", "bg").agg(F.count("*").alias("n2"))
    c1 = c2.groupBy("w1").agg(F.sum("n2").alias("n1"))
    model = (
        c2.join(F.broadcast(c1), "w1")
        .select(
            "bg",
            # floor at 4-dp nat resolution (×100 back to micro-units):
            # the ln is transcendental, so a 1-ulp libm divergence can
            # flip a floor — 1e-4 bins put boundaries ~1e5 ulps away
            # instead of ~1e3, making a flip vanishingly unlikely.
            (
                F.floor(
                    -F.ln(F.col("n2").cast("double") / F.col("n1").cast("double"))
                    * 10000.0
                ).cast("long")
                * 100
            ).alias("nlp_micro"),
        )
    )
    return (
        occ.join(F.broadcast(model), "bg")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum("nlp_micro").cast("long").alias("sum_nlp_micro"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "sum_nlp_micro",
            # integer division (nonnegative operands, so trunc == floor
            # == DuckDB's //) keeps the average exact and portable
            F.expr("sum_nlp_micro div n_bigrams").cast("long").alias("avg_nlp_micro"),
        )
    )


@register(
    "doc_quality_classifier",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
    feats AS (
      SELECT doc_id,
             len(list_distinct(toks)) * 1.0 / len(toks) AS dr,
             len(list_filter(toks,
                 x -> x IN ('a','the','big','small','slow','fast')))
               * 1.0 / len(toks) AS fr,
             LEAST(len(toks) / 40.0, 1.0) AS ls,
             list_sum(list_transform(toks, x -> length(x))) * 1.0 / len(toks)
               AS atl
      FROM tok
    ),
    z AS (
      SELECT doc_id,
             CAST(-1.2 AS DOUBLE) + CAST(3.1 AS DOUBLE) * dr
               - CAST(2.4 AS DOUBLE) * fr + CAST(0.8 AS DOUBLE) * ls
               + CAST(0.15 AS DOUBLE) * atl AS z
      FROM feats
    )
    SELECT doc_id,
           {SQL_FROUND("z", 6)} AS logit,
           CAST(FLOOR(1.0 / (1.0 + exp(-z)) * 10000.0) AS BIGINT) * 100
             AS prob_micro
    FROM z
    """,
    doc="Fixed-weight logistic quality classifier over the handcrafted "
    "features (the fastText-classifier stage of a curation pipeline, "
    "with literal weights standing in for trained ones). The logit is "
    "pure rational arithmetic (portable round-half-up); the sigmoid is "
    "transcendental, so the probability is floored at 4-dp "
    "resolution (in micro-units). Embarrassingly parallel, no shuffle.",
    tags=("text", "quality"),
)
def doc_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens(F.col("text")).alias("toks")
    )
    t = F.col("toks")
    feats = docs.select(
        "doc_id",
        (F.size(F.array_distinct(t)) * 1.0 / F.size(t)).alias("dr"),
        (
            F.size(F.filter(t, lambda x: x.isin("a", "the", "big", "small", "slow", "fast")))
            * 1.0
            / F.size(t)
        ).alias("fr"),
        F.least(F.size(t) / 40.0, F.lit(1.0)).alias("ls"),
        (
            F.aggregate(t, F.lit(0), lambda acc, x: acc + F.length(x)) * 1.0 / F.size(t)
        ).alias("atl"),
    )
    z = (
        F.lit(-1.2)
        + F.lit(3.1) * F.col("dr")
        - F.lit(2.4) * F.col("fr")
        + F.lit(0.8) * F.col("ls")
        + F.lit(0.15) * F.col("atl")
    )
    staged = feats.select("doc_id", z.alias("z"))
    return staged.select(
        "doc_id",
        fround(F.col("z"), 6).alias("logit"),
        # 4-dp probability resolution expressed in micro-units: exp is
        # transcendental, so keep floor boundaries ~1e5 ulps away from
        # any 1-ulp engine divergence (same discipline as nlp_micro).
        (
            F.floor(1.0 / (1.0 + F.exp(-F.col("z"))) * 10000.0).cast("long") * 100
        ).alias("prob_micro"),
    )
