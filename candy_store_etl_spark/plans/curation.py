"""Corpus-curation queries beyond per-document scoring: cluster
resolution for near-dup groups, deterministic stratified sampling,
benchmark decontamination, and TF-IDF term extraction — the remaining
stages of a training-data pipeline after the pair finders and quality
scorers in ``plans/text.py`` / ``plans/vectors.py``.

Registered AFTER the round-2 driver window (see
``registry._ensure_loaded``): these enter the external gate in a later
rotation; until then the local oracle mirror (tests/test_oracle.py)
carries them.

Determinism notes (per NOTES.md rules):
- Sampling keys are md5 hex prefixes — both engines emit identical
  lowercase hex for identical utf-8 input, and hex-string ordering is
  proportional to the hash value, so a prefix-vs-threshold compare is
  an exact Bernoulli draw with no float in sight.
- Single divisions of exact integers (contamination ratio) are IEEE
  correctly-rounded in both engines — no rounding helper needed.
- TF-IDF ranks by the integer tuple (tf DESC, doc_freq ASC, term ASC),
  never by the float score, so a 1-ulp ``ln`` divergence cannot flip
  ranks; the emitted score is truncated at 4 dp (transcendental-safe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..caching import tracked_cache

from ..functions.rounding import SQL_FROUND, SQL_FTRUNC, fround, ftrunc
from ..functions.text import SQL_TOKENS, tokens, word_shingles
from ..operators.dedup import (
    lsh_probe_pairs,
    minhash_dedup_pairs,
    minhash_signatures,
    minhash_signatures_portable,
    minhash_similarity,
)
from ..operators.dedup import explode_nonempty
from ..operators.graph import component_labels
from ..sources.tpch import load_table
from .registry import register

# ---------------------------------------------------------------------------
# Near-dup cluster resolution (connected components)
# ---------------------------------------------------------------------------

_JACCARD_EDGE_THRESHOLD = 0.7
_CC_ID_CAP = 300  # ground-truth range, same cap as token_jaccard_pairs


def _exact_jaccard_edges(docs: DataFrame, threshold: float) -> DataFrame:
    """All-pairs token-set Jaccard >= threshold as (src, dst) edges.

    Quadratic BY DESIGN as ground truth on a restricted id range — the
    corpus-wide scale path feeds LSH candidate pairs into the same
    component resolver (``neardup_clusters_minhash``).
    """
    tok = docs.select(
        "doc_id", F.array_distinct(tokens(F.col("text"))).alias("toks")
    )
    flat = tok.select("doc_id", F.explode("toks").alias("t"))
    sizes = tok.select("doc_id", F.size("toks").cast("long").alias("n"))
    a, b = flat.alias("a"), flat.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.t") == F.col("b.t"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("src"), F.col("b.doc_id").alias("dst"))
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    jac = F.col("i") / (F.col("sa.n") + F.col("sb.n") - F.col("i"))
    return (
        inter.join(sa, F.col("sa.doc_id") == F.col("src"))
        .join(sb, F.col("sb.doc_id") == F.col("dst"))
        .filter(jac >= threshold)
        .select("src", "dst")
    )


def _clusters_output(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """(doc_id, cluster_id, cluster_size, is_canonical) from edge set."""
    labels = component_labels(nodes, edges, "doc_id")
    sizes = labels.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        labels.join(F.broadcast(sizes), "component")
        .select(
            "doc_id",
            F.col("component").alias("cluster_id"),
            "cluster_size",
            (F.col("doc_id") == F.col("component")).cast("int").alias(
                "is_canonical"
            ),
        )
    )


@register(
    "neardup_clusters",
    oracle=f"""
    WITH RECURSIVE tok AS (
      SELECT doc_id, list_distinct({SQL_TOKENS}) AS toks
      FROM documents WHERE doc_id < {_CC_ID_CAP}
    ),
    flat AS (SELECT doc_id, unnest(toks) AS t FROM tok),
    sizes AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n FROM tok),
    inter AS (
      SELECT a.doc_id AS src, b.doc_id AS dst, COUNT(*) AS i
      FROM flat a JOIN flat b ON a.t = b.t AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT src, dst FROM inter
      JOIN sizes sa ON sa.doc_id = src JOIN sizes sb ON sb.doc_id = dst
      WHERE i * 1.0 / (sa.n + sb.n - i) >= {_JACCARD_EDGE_THRESHOLD}
    ),
    edges AS (
      SELECT src AS a, dst AS b FROM pairs
      UNION ALL SELECT dst, src FROM pairs
    ),
    reach(node, comp) AS (
      SELECT doc_id, doc_id FROM tok
      UNION
      SELECT e.b, r.comp FROM reach r JOIN edges e ON e.a = r.node
    ),
    labels AS (
      SELECT node AS doc_id, MIN(comp) AS cluster_id FROM reach GROUP BY node
    ),
    csize AS (
      SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
      FROM labels GROUP BY 1
    )
    SELECT l.doc_id, l.cluster_id, c.cluster_size,
           CAST(l.doc_id = l.cluster_id AS INT) AS is_canonical
    FROM labels l JOIN csize c USING (cluster_id)
    """,
    doc="Near-dup CLUSTER resolution: exact-Jaccard edges (ground-truth "
    "range) closed into connected components via distributed min-label "
    "propagation (operators/graph.py), with the lowest doc_id as the "
    "canonical survivor. Oracle: DuckDB recursive-CTE reachability with "
    "MIN-label aggregation — an independent fixed-point formulation.",
    tags=("text", "dedup", "graph"),
)
def neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < _CC_ID_CAP
    )
    edges = _exact_jaccard_edges(docs, _JACCARD_EDGE_THRESHOLD)
    return _clusters_output(docs, edges)


@register(
    "neardup_clusters_minhash",
    oracle=None,  # MinHash edges are built on Spark xxhash64 (no DuckDB twin)
    doc="The SCALE form of cluster resolution: corpus-wide MinHash-LSH "
    "candidate pairs (banded, never all-pairs) closed into components "
    "by the same min-label propagation. Equality of the resolver "
    "itself vs the oracled exact-edge variant is pinned in "
    "tests/test_curation.py.",
    tags=("text", "dedup", "graph", "minhash"),
)
def neardup_clusters_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    edges = minhash_dedup_pairs(
        docs, "doc_id", "text", num_perm=64, bands=16, threshold=0.5
    ).select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    return _clusters_output(docs, edges)


# ---------------------------------------------------------------------------
# Deterministic stratified sampling
# ---------------------------------------------------------------------------

# per-source-tier keep rates as md5-prefix thresholds (8 hex chars;
# hex ordering is proportional, so '40000000' keeps exactly the hash
# space below 0.25)
_TIER_THRESHOLDS = ("20000000", "40000000", "80000000", "c0000000")


@register(
    "stratified_sample_docs",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, lang, source,
             substr(md5(CAST(doc_id AS VARCHAR) || ':' || source), 1, 8)
               AS sample_key,
             CASE CAST(substr(source, 4) AS INT) % 4
               WHEN 0 THEN '{_TIER_THRESHOLDS[0]}'
               WHEN 1 THEN '{_TIER_THRESHOLDS[1]}'
               WHEN 2 THEN '{_TIER_THRESHOLDS[2]}'
               ELSE '{_TIER_THRESHOLDS[3]}'
             END AS thr
      FROM documents
    )
    SELECT doc_id, lang, source, sample_key
    FROM keyed WHERE sample_key < thr
    """,
    doc="Deterministic per-source Bernoulli sampling — the corpus "
    "mix-weighting stage of a training-data pipeline. The draw is an "
    "md5-prefix threshold compare (hash-split, no RNG, no state): "
    "reproducible across engines, runs, and partitionings, and each "
    "source tier gets its own keep rate (12.5/25/50/75%). Pure "
    "codegen expressions, zero shuffles.",
    tags=("text", "sampling"),
)
def stratified_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    key = F.substring(
        F.md5(F.concat_ws(":", F.col("doc_id").cast("string"), F.col("source"))),
        1,
        8,
    )
    tier = F.col("source").substr(F.lit(4), F.lit(8)).cast("int") % 4
    thr = (
        F.when(tier == 0, _TIER_THRESHOLDS[0])
        .when(tier == 1, _TIER_THRESHOLDS[1])
        .when(tier == 2, _TIER_THRESHOLDS[2])
        .otherwise(_TIER_THRESHOLDS[3])
    )
    return (
        docs.select("doc_id", "lang", "source", key.alias("sample_key"), thr.alias("__thr"))
        .filter(F.col("sample_key") < F.col("__thr"))
        .drop("__thr")
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------------

_DECON_N = 5  # n-gram width for collision detection
# benchmark set = md5-selected 1/16 of the corpus (deterministic stand-in
# for an external eval set; the operator shape is identical)
_BENCH_PREFIX_MAX = "0f"

_SQL_SHINGLES5 = f"""CASE WHEN len(toks) <= {_DECON_N}
      THEN [array_to_string(toks, ' ')]
      ELSE list_transform(generate_series(0, len(toks) - {_DECON_N}),
                          i -> array_to_string(toks[i+1:i+{_DECON_N}], ' '))
      END"""


@register(
    "benchmark_decontamination",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {SQL_TOKENS} AS toks FROM documents),
    g AS (
      SELECT doc_id, list_distinct({_SQL_SHINGLES5}) AS grams,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <= '{_BENCH_PREFIX_MAX}'
               AS is_bench
      FROM tok
    ),
    bg AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE is_bench),
    cg AS (
      SELECT doc_id, len(grams) AS n_grams, unnest(grams) AS gram
      FROM g WHERE NOT is_bench
    ),
    hit AS (
      SELECT doc_id, CAST(MAX(n_grams) AS BIGINT) AS n_grams,
             CAST(COUNT(*) AS BIGINT) AS n_shared_ngrams
      FROM cg JOIN bg USING (gram) GROUP BY doc_id
    )
    SELECT doc_id, n_grams, n_shared_ngrams,
           CAST(n_shared_ngrams AS DOUBLE) / n_grams AS contamination
    FROM hit
    """,
    doc="Test-set decontamination: flag corpus documents sharing any "
    f"{_DECON_N}-gram with a benchmark set (here an md5-selected 1/16 "
    "slice — deterministic stand-in for an external eval set). The "
    "benchmark n-gram relation is small and broadcast; the corpus side "
    "is one explode + one grouped count — no quadratic path. The "
    "contamination ratio is a single IEEE division of exact integers.",
    tags=("text", "decontamination"),
)
def benchmark_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # tokens staged before the shingle lambda (r13; _with_tokens
    # discipline — interpreted lambdas re-evaluate non-column subtrees
    # per reference)
    staged = docs.select(
        "doc_id", tokens(F.col("text")).alias("__tk")
    ).select(
        "doc_id",
        F.array_distinct(
            word_shingles(F.col("__tk"), _DECON_N)
        ).alias("grams"),
        (
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
            <= _BENCH_PREFIX_MAX
        ).alias("is_bench"),
    )
    # explode_nonempty blocks InferFiltersFromGenerate from
    # re-evaluating the whole shingle chain in a pushed-down filter
    bench_grams = explode_nonempty(
        staged.filter("is_bench"), "gram", F.col("grams")
    ).distinct()
    corpus = explode_nonempty(
        staged.filter(~F.col("is_bench")).withColumn(
            "n_grams", F.size("grams").cast("long")
        ),
        "gram",
        F.col("grams"),
        "doc_id",
        "n_grams",
    )
    hits = (
        corpus.join(F.broadcast(bench_grams), "gram")
        .groupBy("doc_id")
        .agg(
            F.max("n_grams").alias("n_grams"),
            F.count(F.lit(1)).alias("n_shared_ngrams"),
        )
    )
    return hits.select(
        "doc_id",
        "n_grams",
        "n_shared_ngrams",
        (F.col("n_shared_ngrams").cast("double") / F.col("n_grams")).alias(
            "contamination"
        ),
    )


# ---------------------------------------------------------------------------
# TF-IDF term extraction
# ---------------------------------------------------------------------------

_TFIDF_TOP_K = 3


@register(
    "tfidf_top_terms",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {SQL_TOKENS} AS toks FROM documents),
    flat AS (SELECT doc_id, unnest(toks) AS term FROM tok),
    tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM flat GROUP BY 1, 2
    ),
    dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS doc_freq FROM tf GROUP BY 1),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    scored AS (
      SELECT t.doc_id, t.term, t.tf, d.doc_freq,
             {SQL_FTRUNC(
                 "t.tf * ln(CAST(n.n_docs AS DOUBLE) / d.doc_freq)", 4)}
               AS tfidf,
             row_number() OVER (
               PARTITION BY t.doc_id
               ORDER BY t.tf DESC, d.doc_freq ASC, t.term ASC
             ) AS rk
      FROM tf t JOIN dfreq d USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tf, doc_freq, tfidf,
           CAST(rk AS BIGINT) AS term_rank
    FROM scored WHERE rk <= {_TFIDF_TOP_K}
    """,
    doc="Per-document top-3 TF-IDF terms (keyword extraction). Ranking "
    "is by the integer tuple (tf DESC, doc_freq ASC, term ASC) — "
    "monotone in tf·idf for fixed tf and immune to float noise; the "
    "emitted score tf·ln(N/df) is truncated at 4 dp. The corpus "
    "cardinality N is a one-number driver aggregate inlined as a "
    "literal (the same metadata-scale class as the catalog/centroid "
    "collects) — a constant-key join would fold into a nested-loop "
    "join, which the plan audit rightly bans.",
    tags=("text", "tfidf"),
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_docs = float(docs.count())
    flat = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    )
    tf = flat.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    scored = tf.join(F.broadcast(dfreq), "term").withColumn(
        "tfidf",
        ftrunc(F.col("tf") * F.log(F.lit(n_docs) / F.col("doc_freq")), 4),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tf"), F.asc("doc_freq"), F.asc("term")
    )
    return (
        scored.withColumn("term_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("term_rank") <= _TFIDF_TOP_K)
        .select("doc_id", "term", "tf", "doc_freq", "tfidf", "term_rank")
    )


# ---------------------------------------------------------------------------
# Deterministic shard assignment (training-data export planning)
# ---------------------------------------------------------------------------

_N_SHARDS = 32


@register(
    "doc_shard_assignment",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, source,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS hx
      FROM documents
    )
    SELECT doc_id, source,
           CAST(((strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 16
                 + strpos('0123456789abcdef', substr(hx, 2, 1)) - 1)
                % {_N_SHARDS} AS INT) AS shard
    FROM keyed
    """,
    doc="Deterministic shard assignment for training-data export: "
    f"shard = first-byte-of-md5 mod {_N_SHARDS}. Hash-sharding is "
    "reproducible across runs and engines and balances shards without "
    "a sort or repartition job — the writer just partitions by the "
    "shard column. (Spark decodes the hex byte with conv(); the DuckDB "
    "twin spells it as hex-char strpos arithmetic — same integer.)",
    tags=("text", "export", "sharding"),
)
def doc_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        "source",
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2).alias("hx"),
    )
    return keyed.select(
        "doc_id",
        "source",
        (F.conv("hx", 16, 10).cast("int") % _N_SHARDS).alias("shard"),
    )


@register(
    "shard_token_budget",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS hx,
             len({SQL_TOKENS}) AS n_toks
      FROM documents
    )
    SELECT CAST(((strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 16
                 + strpos('0123456789abcdef', substr(hx, 2, 1)) - 1)
                % {_N_SHARDS} AS INT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_toks) AS BIGINT) AS total_tokens
    FROM keyed GROUP BY 1
    """,
    doc="Per-shard token accounting for the export plan: doc and token "
    "totals per hash shard — the number a trainer needs to size steps "
    "per shard. One grouped pass; the token count reuses the staged "
    "tokenization.",
    tags=("text", "export", "sharding"),
)
def shard_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2).alias("hx"),
        F.size(tokens(F.col("text"))).cast("long").alias("n_toks"),
    )
    return (
        keyed.select(
            (F.conv("hx", 16, 10).cast("int") % _N_SHARDS).alias("shard"),
            "n_toks",
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("total_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# Incremental near-dup probe (new batch vs existing corpus)
# ---------------------------------------------------------------------------

# incoming batch = md5-selected 1/16 of the corpus; the rest is the
# already-indexed history
_INCOMING_NIBBLE = "0"
_PROBE_THRESHOLD = 0.5


@register(
    "incremental_neardup_probe",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, list_distinct({SQL_TOKENS}) AS toks,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '{_INCOMING_NIBBLE}'
               AS is_new
      FROM documents
    ),
    flat AS (SELECT doc_id, is_new, unnest(toks) AS t FROM tok),
    sizes AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n FROM tok),
    inter AS (
      SELECT a.doc_id AS incoming_id, b.doc_id AS match_id, COUNT(*) AS i
      FROM flat a JOIN flat b ON a.t = b.t AND a.is_new AND NOT b.is_new
      GROUP BY 1, 2
    )
    SELECT incoming_id, match_id,
           {SQL_FROUND("i * 1.0 / (sa.n + sb.n - i)", 6)} AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = incoming_id
    JOIN sizes sb ON sb.doc_id = match_id
    WHERE i * 1.0 / (sa.n + sb.n - i) >= {_PROBE_THRESHOLD}
    """,
    doc="Incremental dedup: match an INCOMING batch (md5-selected 1/16 "
    "slice standing in for a new crawl drop) against the indexed "
    "corpus — asymmetric, so history is never self-joined. Exact "
    "token-set-Jaccard tier; the LSH probe below is the sublinear "
    "variant (on 3-gram shingle similarity, the stricter MinHash "
    "metric — candidate equality with the symmetric tier is pinned "
    "in tests).",
    tags=("text", "dedup", "incremental"),
)
def incremental_neardup_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.array_distinct(tokens(F.col("text"))).alias("toks"),
        (
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
            == _INCOMING_NIBBLE
        ).alias("is_new"),
    )
    flat = tok.select("doc_id", "is_new", F.explode("toks").alias("t"))
    sizes = tok.select("doc_id", F.size("toks").cast("long").alias("n"))
    a = flat.filter("is_new").alias("a")
    b = flat.filter(~F.col("is_new")).alias("b")
    inter = (
        a.join(b, F.col("a.t") == F.col("b.t"))
        .groupBy(
            F.col("a.doc_id").alias("incoming_id"),
            F.col("b.doc_id").alias("match_id"),
        )
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    jac = F.col("i") / (F.col("sa.n") + F.col("sb.n") - F.col("i"))
    return (
        inter.join(sa, F.col("sa.doc_id") == F.col("incoming_id"))
        .join(sb, F.col("sb.doc_id") == F.col("match_id"))
        .filter(jac >= _PROBE_THRESHOLD)
        .select("incoming_id", "match_id", fround(jac, 6).alias("jaccard"))
    )


@register(
    "incremental_neardup_probe_lsh",
    oracle=None,  # MinHash/banding built on Spark xxhash64 (no DuckDB twin)
    doc="The SCALE form of the incremental probe: MinHash band buckets "
    "of the incoming batch equi-joined against the (persistable) index "
    "bucket relation — probe cost scales with the batch, not with "
    "history. Recall vs the exact probe is pinned in "
    "tests/test_curation.py.",
    tags=("text", "dedup", "incremental", "minhash"),
)
def incremental_neardup_probe_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    is_new = (
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
        == _INCOMING_NIBBLE
    )
    incoming = docs.filter(is_new)
    index = docs.filter(~is_new)
    # each signature relation feeds two consumers (bucket probe + the
    # similarity join side) — cache so the shingle+min-agg pass runs once
    q_sigs = minhash_signatures(incoming, "doc_id", "text", num_perm=64).transform(tracked_cache)
    ix_sigs = minhash_signatures(index, "doc_id", "text", num_perm=64).transform(tracked_cache)
    cands = lsh_probe_pairs(q_sigs, ix_sigs, num_perm=64, bands=16)
    sigs = q_sigs.union(ix_sigs)
    return (
        minhash_similarity(cands, sigs)
        .filter(F.col("est_jaccard") >= 0.4)
        .select(
            F.col("id_a").alias("incoming_id"),
            F.col("id_b").alias("match_id"),
            "est_jaccard",
        )
    )


def _portable_cluster_oracle(threshold: float = 0.5) -> str:
    from .vectors import minhash_portable_ctes

    return f"""
    WITH RECURSIVE {minhash_portable_ctes()},
    pairs AS (
      SELECT id_a AS src, id_b AS dst FROM est WHERE est_jaccard >= {threshold}
    ),
    alledges AS (
      SELECT src AS a, dst AS b FROM pairs
      UNION ALL SELECT dst, src FROM pairs
    ),
    reach(node, comp) AS (
      SELECT doc_id, doc_id FROM tok
      UNION
      SELECT e.b, r.comp FROM reach r JOIN alledges e ON e.a = r.node
    ),
    labels AS (
      SELECT node AS doc_id, MIN(comp) AS cluster_id FROM reach GROUP BY node
    ),
    csize AS (
      SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
      FROM labels GROUP BY 1
    )
    SELECT l.doc_id, l.cluster_id, c.cluster_size,
           CAST(l.doc_id = l.cluster_id AS INT) AS is_canonical
    FROM labels l JOIN csize c USING (cluster_id)
    """


@register(
    "neardup_clusters_minhash_portable",
    oracle=_portable_cluster_oracle(),
    doc="Corpus-wide cluster resolution on PORTABLE MinHash edges: the "
    "banded candidate pipeline (md5 hashes — see "
    "minhash_neardup_pairs_portable) closed into connected components "
    "by distributed min-label propagation, value-checked end-to-end: "
    "the DuckDB oracle rebuilds the same edges and closes them with "
    "recursive-CTE reachability. The full scale form "
    "(neardup_clusters_minhash) differs only in the hash function.",
    tags=("text", "dedup", "graph", "minhash", "portable"),
)
def neardup_clusters_minhash_portable(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    edges = minhash_dedup_pairs(
        docs, "doc_id", "text", num_perm=64, bands=16, threshold=0.5,
        method="portable",
    ).select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    return _clusters_output(docs, edges)


def _portable_probe_oracle(threshold: float = 0.4) -> str:
    from .vectors import minhash_portable_ctes

    nib = _INCOMING_NIBBLE
    cond = (
        f"substr(md5(CAST(x.doc_id AS VARCHAR)), 1, 1) = '{nib}'"
        f" AND substr(md5(CAST(y.doc_id AS VARCHAR)), 1, 1) <> '{nib}'"
    )
    return f"""
    WITH {minhash_portable_ctes(pair_cond=cond)}
    SELECT id_a AS incoming_id, id_b AS match_id, est_jaccard
    FROM est WHERE est_jaccard >= {threshold}
    """


@register(
    "incremental_neardup_probe_lsh_portable",
    oracle=_portable_probe_oracle(),
    doc="The incremental MinHash probe on PORTABLE hashes: incoming "
    "batch band buckets equi-joined against the index bucket relation "
    "(asymmetric candidates — probe cost scales with the batch, not "
    "history), value-checked end-to-end by the shared portable-MinHash "
    "oracle body with an incoming-vs-index candidate restriction.",
    tags=("text", "dedup", "incremental", "minhash", "portable"),
)
def incremental_neardup_probe_lsh_portable(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    is_new = (
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
        == _INCOMING_NIBBLE
    )
    incoming = docs.filter(is_new)
    index = docs.filter(~is_new)
    q_sigs = minhash_signatures_portable(
        incoming, "doc_id", "text", num_perm=64
    ).transform(tracked_cache)
    ix_sigs = minhash_signatures_portable(
        index, "doc_id", "text", num_perm=64
    ).transform(tracked_cache)
    cands = lsh_probe_pairs(q_sigs, ix_sigs, num_perm=64, bands=16, portable=True)
    sigs = q_sigs.union(ix_sigs)
    return (
        minhash_similarity(cands, sigs)
        .filter(F.col("est_jaccard") >= 0.4)
        .select(
            F.col("id_a").alias("incoming_id"),
            F.col("id_b").alias("match_id"),
            "est_jaccard",
        )
    )
