"""Round-4 surface extensions.

Themes: vector-serving shapes (range search, batched top-k, class
centroids, int8 scalar quantization), curation economics (global token
budgets, importance sampling), fuzzy matching (levenshtein), exact
time-series analytics (gap interpolation, integer-exact OLS, MAD
anomalies), window distribution functions, bit-set aggregates,
discrete mode/median, CUBE grouping ids, Spark-4 VARIANT and SQL pipe
syntax.

Determinism discipline follows NOTES.md: integer micro-units before
any aggregate, FLOOR(CAST(sum AS DOUBLE)/count) for portable floored
division, transcendental terms floored at 4-dp resolution before
summation, array outputs projected to int-derived CSV strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import SQL_FROUND, SQL_MONEY_SUM, fround, money_sum
from ..functions.text import SQL_TOKENS, tokens
from ..functions.vectors import cosine_similarity, to_double_array
from ..sources.tpch import load_table
from .registry import register
from .vectors import _sql_cosine

# ---------------------------------------------------------------------------
# Vector serving: range search + batched top-k
# ---------------------------------------------------------------------------

_RANGE_TAU = 0.25


@register(
    "ann_range_search",
    oracle=f"""
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id, e.label,
           {SQL_FROUND(_sql_cosine("e.embedding", "q.qe"), 6)} AS cosine_sim
    FROM embeddings e, q
    WHERE e.vec_id != 0
      AND {_sql_cosine("e.embedding", "q.qe")} >= {_RANGE_TAU}
    """,
    doc="Range similarity search (all neighbors with cosine >= tau, vs "
    "the top-k shape): the dedup/recall-sweep query pattern. Same "
    "codegen zip_with/aggregate fold as ann_topk_cosine; the raw-double "
    "threshold compare is a single identical IEEE pipeline on both "
    "engines. Scale path: the LSH bucket prefilter composes in front "
    "exactly as for top-k (tau bounds the Hamming radius to probe).",
    tags=("vectors", "ann", "range"),
)
def ann_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    e = emb.filter(F.col("vec_id") != 0)
    sim = cosine_similarity(
        to_double_array(F.col("embedding")), to_double_array(F.col("qe"))
    )
    return (
        e.crossJoin(F.broadcast(q))
        .filter(sim >= _RANGE_TAU)
        .select("vec_id", "label", fround(sim, 6).alias("cosine_sim"))
    )


_BATCH_QIDS = (0, 1, 2)


@register(
    "ann_batch_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
               WHERE vec_id IN {_BATCH_QIDS}),
    s AS (
      SELECT q.qid, e.vec_id, e.label,
             {SQL_FROUND(_sql_cosine("e.embedding", "q.qe"), 6)} AS cosine_sim
      FROM embeddings e, q
      WHERE e.vec_id NOT IN {_BATCH_QIDS}
    )
    SELECT qid, vec_id, label, cosine_sim, CAST(rnk AS INTEGER) AS rnk
    FROM (SELECT *, row_number() OVER (
            PARTITION BY qid ORDER BY cosine_sim DESC, vec_id) AS rnk
          FROM s)
    WHERE rnk <= 5
    """,
    doc="Batched top-k — the real serving shape (N queries amortize one "
    "corpus scan): the broadcast query block rides a single pass, and "
    "the per-query top-k is a partitioned window over the rounded "
    "score with a vec_id tie-break. At scale the same plan takes a "
    "whole query TABLE on the broadcast side; the corpus is still "
    "scanned once, not once per query.",
    tags=("vectors", "ann", "batch"),
)
def ann_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    qids = list(_BATCH_QIDS)
    qs = emb.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    e = emb.filter(~F.col("vec_id").isin(qids))
    sim = cosine_similarity(
        to_double_array(F.col("embedding")), to_double_array(F.col("qe"))
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("cosine_sim").desc(), F.col("vec_id")
    )
    return (
        e.crossJoin(F.broadcast(qs))
        .select("qid", "vec_id", "label", fround(sim, 6).alias("cosine_sim"))
        .withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= 5)
    )


# ---------------------------------------------------------------------------
# Class centroids + int8 scalar quantization (integer micro-unit algebra)
# ---------------------------------------------------------------------------

_SQL_MICRO = (
    "CAST(FLOOR(CAST(embedding[d] AS DOUBLE)*1000000 + 0.5) AS BIGINT)"
)


@register(
    "label_centroids",
    oracle=f"""
    WITH x AS (
      SELECT label, d - 1 AS pos, {_SQL_MICRO} AS micro
      FROM embeddings CROSS JOIN generate_series(1, 64) AS t(d)
    ),
    g AS (
      SELECT label, pos,
             CAST(FLOOR(CAST(SUM(micro) AS DOUBLE)/COUNT(*)) AS BIGINT) AS cm,
             COUNT(*) AS cnt
      FROM x GROUP BY 1, 2
    )
    SELECT label,
           string_agg(CAST(cm AS VARCHAR), ',' ORDER BY pos) AS centroid_micro_csv,
           CAST(MAX(cnt) AS BIGINT) AS n_vectors
    FROM g GROUP BY label
    """,
    doc="Per-label mean embedding (class centroids — the nearest-"
    "centroid classifier / cluster-summary primitive). Vectors "
    "quantize to integer micro-units so the mean is an exact integer "
    "sum with one portable floored division per dim — bit-identical "
    "across engines and partitionings (same algebra as the IVF "
    "portable twin's Lloyd step). One explode + one (label, dim) "
    "aggregate; output is the int-CSV projection the gate can hash.",
    tags=("vectors", "centroids"),
)
def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    x = emb.select(
        "label", F.posexplode(F.col("embedding")).alias("pos", "v")
    ).select(
        "label",
        "pos",
        F.floor(F.col("v").cast("double") * 1000000.0 + F.lit(0.5))
        .cast("long")
        .alias("micro"),
    )
    g = x.groupBy("label", "pos").agg(
        F.expr("CAST(FLOOR(CAST(SUM(micro) AS DOUBLE)/COUNT(*)) AS BIGINT)").alias(
            "cm"
        ),
        F.count(F.lit(1)).alias("cnt"),
    )
    return g.groupBy("label").agg(
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cm"))),
                lambda s: s["cm"].cast("string"),
            ),
        ).alias("centroid_micro_csv"),
        F.max("cnt").alias("n_vectors"),
    )


@register(
    "embedding_quantize_int8",
    oracle=f"""
    WITH x AS (
      SELECT vec_id, d - 1 AS pos, {_SQL_MICRO} AS micro
      FROM embeddings CROSS JOIN generate_series(1, 64) AS t(d)
    ),
    s AS (SELECT pos, MIN(micro) AS mn, MAX(micro) AS mx FROM x GROUP BY pos),
    c AS (
      SELECT vec_id, x.pos,
             CASE WHEN mx = mn THEN 0
                  ELSE CAST(FLOOR(CAST((micro - mn) * 255 AS DOUBLE)
                                  / (mx - mn)) AS BIGINT) END AS code
      FROM x JOIN s ON x.pos = s.pos
    )
    SELECT vec_id,
           string_agg(CAST(code AS VARCHAR), ',' ORDER BY pos) AS codes_csv,
           CAST(SUM(code) AS BIGINT) AS code_sum
    FROM c GROUP BY vec_id
    """,
    doc="Int8 scalar quantization — the embedding-storage compressor "
    "(4x over float32) serving pipelines apply before ANN: per-dim "
    "global [min,max] in integer micro-units, code = floor(255 * "
    "(x-min)/(max-min)) — all-integer, so codes are bit-identical "
    "across engines. The 64-row stats relation is broadcast; the "
    "corpus sees one narrow pass. Output: per-vector code CSV + "
    "checksum.",
    tags=("vectors", "quantization"),
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..caching import tracked_cache

    emb = load_table(spark, sf_dir, "embeddings")
    # x feeds the per-dim stats aggregate AND the code join — cache so
    # the 64x explode runs once and the doc's one-pass claim holds
    x = emb.select(
        "vec_id", F.posexplode(F.col("embedding")).alias("pos", "v")
    ).select(
        "vec_id",
        "pos",
        F.floor(F.col("v").cast("double") * 1000000.0 + F.lit(0.5))
        .cast("long")
        .alias("micro"),
    ).transform(tracked_cache)
    stats = x.groupBy("pos").agg(
        F.min("micro").alias("mn"), F.max("micro").alias("mx")
    )
    c = x.join(F.broadcast(stats), "pos").select(
        "vec_id",
        "pos",
        F.when(F.col("mx") == F.col("mn"), F.lit(0).cast("long"))
        .otherwise(
            F.expr(
                "CAST(FLOOR(CAST((micro - mn) * 255 AS DOUBLE)/(mx - mn)) AS BIGINT)"
            )
        )
        .alias("code"),
    )
    return c.groupBy("vec_id").agg(
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "code"))),
                lambda s: s["code"].cast("string"),
            ),
        ).alias("codes_csv"),
        F.sum("code").alias("code_sum"),
    )


# ---------------------------------------------------------------------------
# Curation economics: global token budget + importance sampling
# ---------------------------------------------------------------------------

_HEAD_BUDGET = 20000


@register(
    "token_budget_head_selection",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, n_chars,
             CAST(len({SQL_TOKENS}) AS BIGINT) AS n_toks
      FROM documents
    ),
    c AS (
      SELECT doc_id, n_toks,
             SUM(n_toks) OVER (ORDER BY n_chars DESC, doc_id
                               ROWS UNBOUNDED PRECEDING) AS cum_toks
      FROM d
    )
    SELECT doc_id, n_toks, CAST(cum_toks AS BIGINT) AS cum_toks
    FROM c WHERE cum_toks <= {_HEAD_BUDGET}
    """,
    doc="Global token-budget head selection: order the corpus by a "
    "quality proxy (n_chars desc, doc_id tie-break) and keep documents "
    "while the running token total fits the training budget — the "
    "'best N tokens' curation cut. Runs the prefix sum on the "
    "2-column (doc_id, n_toks) projection only; at 100 TB the global "
    "ordered cumsum becomes repartitionByRange(score) + per-partition "
    "sums + a broadcast offset join (two passes, no single-task sort).",
    tags=("text", "curation", "budget"),
)
def token_budget_head_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        F.size(tokens(F.col("text"))).cast("long").alias("n_toks"),
    )
    w = (
        Window.orderBy(F.col("n_chars").desc(), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs.withColumn("cum_toks", F.sum("n_toks").over(w))
        .filter(F.col("cum_toks") <= _HEAD_BUDGET)
        .select("doc_id", "n_toks", "cum_toks")
    )


# first 6 hex chars of md5 -> integer (DuckDB twin of Spark's conv())
_SQL_MD5_BUCKET = """
  list_sum(list_transform(generate_series(1, 6),
    i -> (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1)
         * CAST(16 AS BIGINT) ** (6 - i))) % 100
"""


@register(
    "importance_sampled_docs",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source,
             20 + (TRY_CAST(substr(source, 4) AS BIGINT) * 7) % 60 AS keep_pct,
             {_SQL_MD5_BUCKET} AS bucket
      FROM documents
    )
    SELECT doc_id, source, CAST(keep_pct AS BIGINT) AS keep_pct,
           CAST(bucket AS BIGINT) AS bucket
    FROM d WHERE bucket < keep_pct
    """,
    doc="Importance sampling by source (the DSIR/domain-reweighting "
    "shape): each source gets a deterministic keep percentage and a "
    "document survives iff its md5 bucket falls under it — hash-"
    "derived acceptance, so the SAMPLE is reproducible across runs, "
    "engines, and repartitionings with zero RNG-state coordination. "
    "Embarrassingly parallel, no shuffle.",
    tags=("text", "sampling", "curation"),
)
def importance_sampled_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # unbounded substring + try_cast on BOTH engines: a numeric suffix
    # longer than any fixed length still parses, and a non-numeric
    # suffix nulls identically instead of throwing under ANSI mode
    keep_pct = (
        F.lit(20)
        + (F.expr("try_cast(substring(source, 4) AS BIGINT)") * 7) % 60
    ).alias("keep_pct")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10)
        .cast("long")
        % 100
    ).alias("bucket")
    staged = docs.select("doc_id", "source", keep_pct, bucket)
    return staged.filter(F.col("bucket") < F.col("keep_pct"))


# ---------------------------------------------------------------------------
# Fuzzy match: edit distance
# ---------------------------------------------------------------------------

_FUZZY_QUERY = "red widget"


@register(
    "part_name_levenshtein_match",
    oracle=f"""
    SELECT p_partkey, p_name,
           CAST(levenshtein(p_name, '{_FUZZY_QUERY}') AS INTEGER) AS edit_dist
    FROM part
    WHERE levenshtein(p_name, '{_FUZZY_QUERY}') <= 4
    """,
    doc="Fuzzy string match via Levenshtein edit distance (the "
    "complement of fuzzy_part_name_match's trigram Jaccard: edit "
    "distance catches transpositions/typos that trigram overlap "
    "misses). Pure codegen, exact integer output. At 100 TB the same "
    "predicate runs AFTER a trigram-index candidate semi-join — edit "
    "distance is the verifier, never the scan filter.",
    tags=("text", "fuzzy"),
)
def part_name_levenshtein_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    dist = F.levenshtein(F.col("p_name"), F.lit(_FUZZY_QUERY))
    return (
        part.select("p_partkey", "p_name", dist.cast("int").alias("edit_dist"))
        .filter(F.col("edit_dist") <= 4)
    )


# ---------------------------------------------------------------------------
# Exact time-series analytics over the per-day aggregate tier
# ---------------------------------------------------------------------------


def _daily_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day event value in exact integer cents (order-independent)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            F.col("ts").cast("date").alias("d"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        )
        .groupBy("d")
        .agg(F.sum("cents").alias("cents"))
    )


_SQL_DAILY_CENTS = """
  SELECT CAST(ts AS DATE) AS d,
         SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) AS cents
  FROM events GROUP BY 1
"""


@register(
    "interpolate_daily_gaps",
    oracle=f"""
    WITH daily AS ({_SQL_DAILY_CENTS}),
    spine AS (
      SELECT unnest(generate_series((SELECT MIN(d) FROM daily),
                                    (SELECT MAX(d) FROM daily),
                                    INTERVAL 1 DAY))::DATE AS d
    ),
    masked AS (
      SELECT s.d,
             date_diff('day', DATE '1970-01-01', s.d) AS di,
             CASE WHEN date_diff('day', DATE '1970-01-01', s.d) % 3 != 0
                  THEN dl.cents END AS known_cents
      FROM spine s LEFT JOIN daily dl ON s.d = dl.d
    ),
    ctx AS (
      SELECT d, di, known_cents,
             last_value(known_cents IGNORE NULLS) OVER
               (ORDER BY di ROWS UNBOUNDED PRECEDING) AS prev_c,
             last_value(CASE WHEN known_cents IS NOT NULL THEN di END
                        IGNORE NULLS) OVER
               (ORDER BY di ROWS UNBOUNDED PRECEDING) AS prev_d,
             first_value(known_cents IGNORE NULLS) OVER
               (ORDER BY di ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS next_c,
             first_value(CASE WHEN known_cents IS NOT NULL THEN di END
                         IGNORE NULLS) OVER
               (ORDER BY di ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS next_d
      FROM masked
    )
    SELECT d,
           CAST(CASE
             WHEN known_cents IS NOT NULL THEN known_cents
             WHEN prev_c IS NULL THEN next_c
             WHEN next_c IS NULL THEN prev_c
             ELSE prev_c + CAST(FLOOR(CAST((next_c - prev_c) * (di - prev_d)
                                           AS DOUBLE) / (next_d - prev_d))
                                AS BIGINT)
           END AS BIGINT) AS interp_cents,
           known_cents IS NOT NULL AS is_known
    FROM ctx
    """,
    doc="Gap-fill with linear interpolation over the per-day aggregate "
    "(every third day masked out as the synthetic gap): bounded-state "
    "window pass with IGNORE NULLS last/first_value for the bracketing "
    "known points. Interpolation is exact integer algebra — cents "
    "deltas times integer day offsets with one portable floored "
    "division — so both engines produce identical fills. Runs on the "
    "<=1-row-per-day aggregate, never the fact table.",
    tags=("timeseries", "window", "interpolation"),
)
def interpolate_daily_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..caching import tracked_cache

    # daily feeds the bounds aggregate AND the spine join — cache so
    # the events aggregation runs once
    daily = _daily_cents(spark, sf_dir).transform(tracked_cache)
    bounds = daily.agg(
        F.min("d").alias("dmin"), F.max("d").alias("dmax")
    )
    spine = bounds.select(
        F.explode(F.sequence("dmin", "dmax")).alias("d")
    )
    di = F.datediff(F.col("d"), F.lit("1970-01-01"))
    masked = (
        spine.join(daily, "d", "left")
        .select(
            "d",
            di.alias("di"),
            F.when(di % 3 != 0, F.col("cents")).alias("known_cents"),
        )
    )
    w_prev = Window.orderBy("di").rowsBetween(Window.unboundedPreceding, 0)
    w_next = Window.orderBy("di").rowsBetween(0, Window.unboundedFollowing)
    known_di = F.when(F.col("known_cents").isNotNull(), F.col("di"))
    ctx = masked.select(
        "d",
        "di",
        "known_cents",
        F.last("known_cents", ignorenulls=True).over(w_prev).alias("prev_c"),
        F.last(known_di, ignorenulls=True).over(w_prev).alias("prev_d"),
        F.first("known_cents", ignorenulls=True).over(w_next).alias("next_c"),
        F.first(known_di, ignorenulls=True).over(w_next).alias("next_d"),
    )
    interp = (
        F.when(F.col("known_cents").isNotNull(), F.col("known_cents"))
        .when(F.col("prev_c").isNull(), F.col("next_c"))
        .when(F.col("next_c").isNull(), F.col("prev_c"))
        .otherwise(
            F.col("prev_c")
            + F.expr(
                "CAST(FLOOR(CAST((next_c - prev_c) * (di - prev_d) AS DOUBLE)"
                " / (next_d - prev_d)) AS BIGINT)"
            )
        )
    )
    return ctx.select(
        "d",
        interp.cast("long").alias("interp_cents"),
        F.col("known_cents").isNotNull().alias("is_known"),
    )


@register(
    "daily_value_regression",
    oracle=f"""
    WITH daily AS (
      SELECT event_type,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
             SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) AS y
      FROM events GROUP BY 1, 2
    ),
    a AS (
      SELECT event_type,
             COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x*y) AS sxy, SUM(x*x) AS sxx, SUM(y*y) AS syy
      FROM daily GROUP BY 1
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           CAST(n*sxy - sx*sy AS DOUBLE) / (n*sxx - sx*sx) AS slope_cents_per_day,
           (CAST(sy AS DOUBLE) - (CAST(n*sxy - sx*sy AS DOUBLE) / (n*sxx - sx*sx))
              * CAST(sx AS DOUBLE)) / n AS intercept_cents,
           (CAST(n*sxy - sx*sy AS DOUBLE) * CAST(n*sxy - sx*sy AS DOUBLE))
             / (CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE))
             AS r2
    FROM a
    """,
    doc="Per-series OLS trend — the regr_slope/regr_intercept/regr_r2 "
    "surface, computed from exact integer sums (n, Sx, Sy, Sxy, Sxx, "
    "Syy over epoch-days x integer cents) so partial aggregation order "
    "cannot move a bit: the only floats are the identical final IEEE "
    "division sequence on both engines. Built-in regr_* accumulate "
    "doubles and drift by ulps with partition count — equivalence to "
    "them is pinned in tests, but the registered result is the exact "
    "form. One shuffle on (type, day), then a per-type scalar fold.",
    tags=("timeseries", "regression", "agg"),
)
def daily_value_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01"))
            .cast("long")
            .alias("x"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        )
        .groupBy("event_type", "x")
        .agg(F.sum("cents").alias("y"))
    )
    a = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = F.expr("CAST(n*sxy - sx*sy AS DOUBLE)")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = F.expr("CAST(n*syy - sy*sy AS DOUBLE)")
    slope = num / den
    return a.select(
        "event_type",
        F.col("n").alias("n_days"),
        slope.alias("slope_cents_per_day"),
        ((F.col("sy").cast("double") - slope * F.col("sx").cast("double")) / F.col("n")).alias(
            "intercept_cents"
        ),
        ((num * num) / (den.cast("double") * deny)).alias("r2"),
    )


@register(
    "daily_value_anomalies_mad",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) AS cents
      FROM events GROUP BY 1, 2
    ),
    med AS (
      SELECT event_type,
             (list_sort(list(cents)))[CAST((COUNT(*)+1)//2 AS BIGINT)] AS med_cents
      FROM daily GROUP BY 1
    ),
    dev AS (
      SELECT d.event_type, d.d, d.cents, m.med_cents,
             abs(d.cents - m.med_cents) AS adev
      FROM daily d JOIN med m ON d.event_type = m.event_type
    ),
    mad AS (
      SELECT event_type,
             (list_sort(list(adev)))[CAST((COUNT(*)+1)//2 AS BIGINT)] AS mad_cents
      FROM dev GROUP BY 1
    )
    SELECT v.event_type, v.d, CAST(v.cents AS BIGINT) AS cents,
           CAST(v.med_cents AS BIGINT) AS med_cents,
           CAST(a.mad_cents AS BIGINT) AS mad_cents
    FROM dev v JOIN mad a ON v.event_type = a.event_type
    WHERE abs(v.cents - v.med_cents) > 3 * a.mad_cents
    """,
    doc="Robust anomaly detection per series: flag days whose absolute "
    "deviation from the median exceeds 3x the median absolute "
    "deviation. Medians are DISCRETE (lower-middle element of the "
    "sorted list) so every quantity stays an exact integer — no "
    "interpolation float to drift. Both medians run on the per-type "
    "<=days-sized aggregate, never the fact table; the day relation "
    "joins back against the broadcast per-type stats.",
    tags=("timeseries", "anomaly", "robust-stats"),
)
def daily_value_anomalies_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..caching import tracked_cache

    ev = load_table(spark, sf_dir, "events")
    # daily feeds three consumers (median stats, deviation join, MAD
    # stats) — cache so the fact-table aggregation runs once
    daily = (
        ev.select(
            "event_type",
            F.col("ts").cast("date").alias("d"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c"),
        )
        .groupBy("event_type", "d")
        .agg(F.sum("c").alias("cents"))
        .transform(tracked_cache)
    )
    med = daily.groupBy("event_type").agg(
        F.expr(
            "element_at(array_sort(collect_list(cents)),"
            " CAST((count(*)+1) div 2 AS INT))"
        ).alias("med_cents")
    )
    dev = daily.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("cents") - F.col("med_cents"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr(
            "element_at(array_sort(collect_list(adev)),"
            " CAST((count(*)+1) div 2 AS INT))"
        ).alias("mad_cents")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.abs(F.col("cents") - F.col("med_cents")) > 3 * F.col("mad_cents"))
        .select("event_type", "d", "cents", "med_cents", "mad_cents")
    )


# ---------------------------------------------------------------------------
# Window distribution functions / bit aggregates / mode & discrete median
# ---------------------------------------------------------------------------


@register(
    "price_window_distribution",
    oracle="""
    SELECT p_partkey, p_brand, p_retailprice, pct_rank, cume, quartile
    FROM (
      SELECT p_partkey, p_brand, p_retailprice,
             percent_rank() OVER w AS pct_rank,
             cume_dist() OVER w AS cume,
             CAST(ntile(4) OVER w AS INTEGER) AS quartile
      FROM part
      WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey)
    )
    WHERE p_partkey % 37 = 0
    """,
    doc="Ranking-distribution window functions (percent_rank, "
    "cume_dist, ntile) per brand over an EXPLICIT total order "
    "(price, partkey) — ntile over a tie-broken order is the only "
    "deterministic form; both outputs are single exact-integer-ratio "
    "IEEE divisions. The sampling filter runs AFTER the windows so "
    "ranks see full groups.",
    tags=("window", "distribution"),
)
def price_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy("p_retailprice", "p_partkey")
    return (
        part.select(
            "p_partkey",
            "p_brand",
            "p_retailprice",
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
            F.ntile(4).over(w).cast("int").alias("quartile"),
        )
        .filter(F.col("p_partkey") % 37 == 0)
    )


@register(
    "user_event_bitmask",
    oracle="""
    SELECT user_id,
           CAST(bit_or(CASE event_type
             WHEN 'view' THEN 1 WHEN 'click' THEN 2 WHEN 'purchase' THEN 4
             WHEN 'signup' THEN 8 WHEN 'error' THEN 16 ELSE 32 END) AS BIGINT)
             AS type_mask,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           (bit_or(CASE event_type
             WHEN 'view' THEN 1 WHEN 'click' THEN 2 WHEN 'purchase' THEN 4
             WHEN 'signup' THEN 8 WHEN 'error' THEN 16 ELSE 32 END) & 4) != 0
             AS has_purchase
    FROM events GROUP BY user_id
    """,
    doc="Bit-set aggregation: each event type maps to a bit and "
    "bit_or() folds a user's behavior into one integer — the compact "
    "segment/feature-flag encoding (8 bytes of state per user at any "
    "scale, map-side combinable). Membership tests are then bitwise "
    "ANDs, not joins.",
    tags=("agg", "bitmask"),
)
def user_event_bitmask(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bit = (
        F.when(F.col("event_type") == "view", 1)
        .when(F.col("event_type") == "click", 2)
        .when(F.col("event_type") == "purchase", 4)
        .when(F.col("event_type") == "signup", 8)
        .when(F.col("event_type") == "error", 16)
        .otherwise(32)
    )
    out = ev.groupBy("user_id").agg(
        F.bit_or(bit).cast("long").alias("type_mask"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return out.select(
        "user_id",
        "type_mask",
        "n_events",
        (F.col("type_mask").bitwiseAND(4) != 0).alias("has_purchase"),
    )


@register(
    "brand_price_mode_median",
    oracle="""
    WITH c AS (
      SELECT p_brand, p_retailprice, COUNT(*) AS cnt
      FROM part GROUP BY 1, 2
    ),
    m AS (
      SELECT p_brand, p_retailprice AS mode_price, CAST(cnt AS BIGINT) AS mode_count
      FROM (SELECT *, row_number() OVER (PARTITION BY p_brand
                    ORDER BY cnt DESC, p_retailprice) AS rn FROM c)
      WHERE rn = 1
    ),
    q AS (
      SELECT p_brand,
             (list_sort(list(p_retailprice)))[CAST((COUNT(*)+1)//2 AS BIGINT)]
               AS median_lo_price,
             CAST(COUNT(*) AS BIGINT) AS n_parts
      FROM part GROUP BY 1
    )
    SELECT q.p_brand, m.mode_price, m.mode_count, q.median_lo_price, q.n_parts
    FROM q JOIN m ON q.p_brand = m.p_brand
    """,
    doc="Deterministic mode + discrete median per group: mode via "
    "count-argmax with an explicit price tie-break (the built-in "
    "mode() has undefined tie order — unusable under a hash gate), "
    "median as the lower-middle element of the sorted value list "
    "(an actual data value, no interpolation float). Mode is two "
    "hash aggregates + a top-1 window; median collects only the "
    "per-group value list.",
    tags=("agg", "stats", "mode"),
)
def brand_price_mode_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    c = part.groupBy("p_brand", "p_retailprice").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("p_brand").orderBy(
        F.col("cnt").desc(), F.col("p_retailprice")
    )
    m = (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "p_brand",
            F.col("p_retailprice").alias("mode_price"),
            F.col("cnt").alias("mode_count"),
        )
    )
    q = part.groupBy("p_brand").agg(
        F.expr(
            "element_at(array_sort(collect_list(p_retailprice)),"
            " CAST((count(*)+1) div 2 AS INT))"
        ).alias("median_lo_price"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return q.join(m, "p_brand")


@register(
    "orders_aging_buckets",
    oracle="""
    WITH a AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS anchor FROM orders),
    b AS (
      SELECT CASE
               WHEN date_diff('day', CAST(o_orderdate AS DATE), anchor) < 30
                 THEN '0-29d'
               WHEN date_diff('day', CAST(o_orderdate AS DATE), anchor) < 90
                 THEN '30-89d'
               WHEN date_diff('day', CAST(o_orderdate AS DATE), anchor) < 180
                 THEN '90-179d'
               ELSE '180d+' END AS age_bucket,
             o_totalprice
      FROM orders, a
    )
    SELECT age_bucket, CAST(COUNT(*) AS BIGINT) AS n_orders,
           SUM(FLOOR(o_totalprice*100 + 0.5))/100.0 AS total_value
    FROM b GROUP BY 1
    """,
    doc="Receivables-style aging buckets: integer day arithmetic "
    "against a data-derived anchor (max order date, a broadcast "
    "1-row cross join). Classic warehouse date-bucket rollup — "
    "datediff/CASE in pure codegen, one grouped pass.",
    tags=("time", "buckets", "agg"),
)
def orders_aging_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    anchor = orders.agg(
        F.max(F.col("o_orderdate").cast("date")).alias("anchor")
    )
    age = F.datediff(F.col("anchor"), F.col("o_orderdate").cast("date"))
    return (
        orders.crossJoin(F.broadcast(anchor))
        .select(
            F.when(age < 30, "0-29d")
            .when(age < 90, "30-89d")
            .when(age < 180, "90-179d")
            .otherwise("180d+")
            .alias("age_bucket"),
            "o_totalprice",
        )
        .groupBy("age_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money_sum(F.col("o_totalprice"), "total_value"),
        )
    )


@register(
    "order_cube_grouping_id",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus)*2 + GROUPING(o_orderpriority)
                AS INTEGER) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {SQL_MONEY_SUM("o_totalprice", "total_value")}
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="CUBE with grouping() provenance: gid distinguishes a real "
    "NULL group key from a rolled-up one — the detail order_status_"
    "cube omits; gid = grouping(a)*2 + grouping(b) is the portable "
    "spelling (grouping_id() exists on Spark but not every engine). "
    "All four grouping sets in ONE pass through Spark's Expand.",
    tags=("agg", "cube", "grouping"),
)
def order_cube_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    gid = (
        F.grouping("o_orderstatus").cast("int") * 2
        + F.grouping("o_orderpriority").cast("int")
    ).alias("gid")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        gid,
        F.count(F.lit(1)).alias("n_orders"),
        money_sum(F.col("o_totalprice"), "total_value"),
    )


# ---------------------------------------------------------------------------
# Spark-4 surfaces: VARIANT + SQL pipe syntax
# ---------------------------------------------------------------------------


@register(
    "variant_props_extract",
    oracle="""
    SELECT event_id,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           json_extract_string(props, '$.k') IS NOT NULL AS has_k
    FROM events WHERE event_type = 'view'
    """,
    doc="Spark-4 VARIANT path for semi-structured data: parse_json() "
    "into the binary VARIANT encoding once, then typed "
    "try_variant_get() extraction — unlike get_json_object, the "
    "parse cost is paid once per row however many fields are "
    "extracted, and the encoding is columnar-shreddable. Oracle is "
    "the JSON-string equivalent. has_k is STRING-typed existence "
    "(every variant value casts to string, so it means 'k present', "
    "not 'k present AND integral'), and both engines TRY-cast k_val "
    "so a non-numeric k nulls rather than desyncing or crashing; the "
    "residual float case (Spark truncates, DuckDB rounds the string) "
    "is pinned integral-only by tests/test_round4.py.",
    tags=("nested", "variant", "spark4"),
)
def variant_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        "event_id", F.parse_json(F.col("props")).alias("v")
    )
    return v.select(
        "event_id",
        F.try_variant_get(F.col("v"), "$.k", "long").alias("k_val"),
        F.try_variant_get(F.col("v"), "$.k", "string")
        .isNotNull()
        .alias("has_k"),
    )


@register(
    "pipe_syntax_daily_orders",
    oracle="""
    SELECT CAST(o_orderdate AS DATE) AS order_day,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM orders WHERE o_orderstatus = 'F'
    GROUP BY 1
    """,
    doc="Spark-4 SQL pipe syntax (|> operators compose linearly like "
    "DataFrame chains): the same logical plan as the classic "
    "GROUP BY — Catalyst parses pipes into identical operators, so "
    "this pins that the surface is live and costs nothing. Exact "
    "integer cents keep the shared result hashable.",
    tags=("sql", "pipe", "spark4"),
)
def pipe_syntax_daily_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tpch import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        FROM orders
        |> WHERE o_orderstatus = 'F'
        |> EXTEND CAST(o_orderdate AS DATE) AS order_day
        |> EXTEND CAST(FLOOR(o_totalprice * 100 + CAST(0.5 AS DOUBLE))
                       AS BIGINT) AS cents
        |> AGGREGATE COUNT(*) AS n_orders, SUM(cents) AS total_cents
           GROUP BY order_day
        |> SELECT order_day, n_orders, total_cents
        """
    )


# ---------------------------------------------------------------------------
# Character-entropy quality signal (micronat integer accumulation)
# ---------------------------------------------------------------------------


@register(
    "doc_char_entropy",
    oracle="""
    WITH ch AS (
      SELECT doc_id, substr(text, i, 1) AS c
      FROM documents CROSS JOIN generate_series(1, 4096) AS t(i)
      WHERE i <= length(text)
    ),
    cnt AS (SELECT doc_id, c, COUNT(*) AS k FROM ch GROUP BY 1, 2),
    tot AS (SELECT doc_id, SUM(k) AS n FROM cnt GROUP BY 1),
    term AS (
      SELECT cnt.doc_id,
             k * CAST(FLOOR(-ln(CAST(k AS DOUBLE) / CAST(n AS DOUBLE)) * 10000)
                      AS BIGINT) AS t_micro
      FROM cnt JOIN tot ON cnt.doc_id = tot.doc_id
    )
    SELECT term.doc_id,
           CAST(FLOOR(CAST(SUM(t_micro) AS DOUBLE) / MAX(n)) AS BIGINT)
             AS entropy_0p1milli_nats
    FROM term JOIN tot ON term.doc_id = tot.doc_id
    GROUP BY term.doc_id
    """,
    doc="Character-distribution entropy per document — the classic "
    "gibberish/encoding-noise detector (low entropy = repeated "
    "chars/boilerplate, high = random bytes). Per-char -ln(p) terms "
    "floor at 4-dp nat resolution BEFORE the k-weighted integer sum "
    "(the bigram-LM micronat discipline), so group sums are order-"
    "independent and bit-identical across engines; the final "
    "normalization is one portable floored division. Char positions "
    "cap at 4096 on BOTH engines (one shared bound), so a regenerated "
    "corpus with longer documents cannot desync the oracle.",
    tags=("text", "quality", "entropy"),
)
def doc_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # char positions cap at 4096 on BOTH engines (the oracle's
    # generate_series bound) — longer documents contribute their first
    # 4096 chars; current corpora sit far below the cap
    ch = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, least(length(text), 4096)),"
                " i -> substr(text, i, 1))"
            )
        ).alias("c"),
    )
    cnt = ch.groupBy("doc_id", "c").agg(F.count(F.lit(1)).alias("k"))
    tot = cnt.groupBy("doc_id").agg(F.sum("k").alias("n"))
    term = cnt.join(tot, "doc_id").select(
        "doc_id",
        "n",
        (
            F.col("k")
            * F.floor(
                -F.ln(F.col("k").cast("double") / F.col("n").cast("double"))
                * 10000.0
            ).cast("long")
        ).alias("t_micro"),
    )
    return term.groupBy("doc_id").agg(
        F.expr(
            "CAST(FLOOR(CAST(SUM(t_micro) AS DOUBLE) / MAX(n)) AS BIGINT)"
        ).alias("entropy_0p1milli_nats")
    )


# ---------------------------------------------------------------------------
# Multimodal: ViT-style patch-grid planning
# ---------------------------------------------------------------------------

_PATCH = 8


@register(
    "multimodal_patch_grid",
    oracle=f"""
    WITH hh AS (
      SELECT CAST(doc_id AS BIGINT) AS media_id, sha256(text) AS hx
      FROM documents
    ),
    dims AS (
      SELECT media_id,
             16 + ((strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 16
                 + (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1)) % 64 AS w,
             16 + ((strpos('0123456789abcdef', substr(hx, 3, 1)) - 1) * 16
                 + (strpos('0123456789abcdef', substr(hx, 4, 1)) - 1)) % 64 AS h
      FROM hh
    ),
    g AS (
      SELECT media_id, w, h,
             CAST(CEIL(CAST(w AS DOUBLE)/{_PATCH}) AS BIGINT) AS cols,
             CAST(CEIL(CAST(h AS DOUBLE)/{_PATCH}) AS BIGINT) AS rws
      FROM dims
    ),
    r AS (
      SELECT media_id, w, h, cols,
             unnest(generate_series(0, rws - 1)) AS pr
      FROM g
    )
    SELECT media_id,
           CAST(pr AS INTEGER) AS patch_row,
           CAST(pc AS INTEGER) AS patch_col,
           CAST(pr * cols + pc AS INTEGER) AS patch_id,
           CAST(pc * {_PATCH} AS INTEGER) AS x0,
           CAST(pr * {_PATCH} AS INTEGER) AS y0,
           CAST(LEAST({_PATCH}, w - pc * {_PATCH}) AS INTEGER) AS pw,
           CAST(LEAST({_PATCH}, h - pr * {_PATCH}) AS INTEGER) AS ph
    FROM (SELECT r.*, unnest(generate_series(0, cols - 1)) AS pc FROM r)
    """,
    doc="ViT-style patch-grid planning: decoded image dims (the "
    "Arrow-batched stub codec, operators/multimodal.decode_media) fan "
    "out to one row per 8x8 patch with grid coordinates, byte "
    "geometry, and edge-clipped extents — the tokenization layout a "
    "vision encoder consumes. The grid fan-out itself is pure codegen "
    "(two nested sequence explodes), no shuffle; pixel extraction "
    "stays behind the codec contract. Geometry is all-integer, fully "
    "oracled via sha256 digest arithmetic.",
    tags=("multimodal", "mapInPandas", "vision"),
)
def multimodal_patch_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import attach_media_column, decode_media

    docs = load_table(spark, sf_dir, "documents")
    media = attach_media_column(docs, "doc_id", "text", mime="image/fake")
    dec = decode_media(media).select("media_id", "width", "height")
    g = dec.select(
        "media_id",
        F.col("width").alias("w"),
        F.col("height").alias("h"),
        F.ceil(F.col("width").cast("double") / _PATCH).cast("long").alias("cols"),
        F.ceil(F.col("height").cast("double") / _PATCH).cast("long").alias("rws"),
    )
    r = g.select(
        "media_id",
        "w",
        "h",
        "cols",
        F.explode(F.sequence(F.lit(0), F.col("rws") - 1)).alias("pr"),
    )
    rc = r.select(
        "media_id",
        "w",
        "h",
        "cols",
        "pr",
        F.explode(F.sequence(F.lit(0), F.col("cols") - 1)).alias("pc"),
    )
    return rc.select(
        "media_id",
        F.col("pr").cast("int").alias("patch_row"),
        F.col("pc").cast("int").alias("patch_col"),
        (F.col("pr") * F.col("cols") + F.col("pc")).cast("int").alias("patch_id"),
        (F.col("pc") * _PATCH).cast("int").alias("x0"),
        (F.col("pr") * _PATCH).cast("int").alias("y0"),
        F.least(F.lit(_PATCH), F.col("w") - F.col("pc") * _PATCH)
        .cast("int")
        .alias("pw"),
        F.least(F.lit(_PATCH), F.col("h") - F.col("pr") * _PATCH)
        .cast("int")
        .alias("ph"),
    )


@register(
    "token_budget_head_selection_distributed",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, n_chars,
             CAST(len({SQL_TOKENS}) AS BIGINT) AS n_toks
      FROM documents
    ),
    c AS (
      SELECT doc_id, n_toks,
             SUM(n_toks) OVER (ORDER BY n_chars DESC, doc_id
                               ROWS UNBOUNDED PRECEDING) AS cum_toks
      FROM d
    )
    SELECT doc_id, n_toks, CAST(cum_toks AS BIGINT) AS cum_toks
    FROM c WHERE cum_toks <= {_HEAD_BUDGET}
    """,
    doc="The SCALE form of token_budget_head_selection — identical "
    "result (same oracle), no single-task global sort: "
    "repartitionByRange on the quality order gives range-disjoint "
    "partitions; each computes a local ordered prefix sum; the "
    "per-partition totals (one row per partition) become exclusive "
    "offsets via a p-row window cumsum and join back BROADCAST on "
    "spark_partition_id — nothing is ever collected driver-side and "
    "the whole computation is one lazy plan, so the offsets can never "
    "outlive the pid assignment they were derived from (round-6: this "
    "replaces a collect()+literal-map form whose offsets were coupled "
    "to the tracked cache's lifetime). Two passes over the 2-column "
    "projection, worst task holds one partition's rows — the "
    "distributed-cumsum pattern any global-budget cut needs at "
    "100 TB. An empty corpus degrades for free: both join sides are "
    "empty.",
    tags=("text", "curation", "budget", "scale"),
)
def token_budget_head_selection_distributed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..caching import tracked_cache

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        F.size(tokens(F.col("text"))).cast("long").alias("n_toks"),
    )
    from ..sources.tpch import (
        equal_height_bounds,
        monotone_double_key,
        pid_from_bounds,
        prefix_sum_partitions,
        table_path,
    )

    n_part = prefix_sum_partitions(spark)
    # r13: pid from equal-height approx-quantile boundaries of a
    # double key monotone in (n_chars DESC, doc_id) — a deterministic
    # expression, so the range exchange, its per-execution sampling
    # job and the post-exchange pinned-layout cache all disappear; the
    # local-cumsum window's hash exchange is the only data-sized
    # shuffle left (see round6._global_row_number). The boundary pass
    # doubles as the cache fill, so the corpus tokenization still runs
    # once per execution. Stats-less layouts keep the r12 sampled
    # form: two caches, each load-bearing (below the exchange = the
    # boundary-sampling pass fills it; above = one pinned pid layout
    # so rank and offset consumers cannot land on independently-
    # sampled boundary sets).
    qkey = monotone_double_key(
        F.col("n_chars"), F.col("doc_id"), sf_dir, descending=True
    )
    bounds = None
    if qkey is not None:
        cached = tracked_cache(docs)
        bounds = equal_height_bounds(
            cached,
            qkey,
            n_part,
            memo_path=table_path(sf_dir, "documents"),
            memo_tag="token_budget_n_chars_desc",
        )
    if bounds is not None:
        with_pid = cached.withColumn("pid", pid_from_bounds(bounds, qkey))
    else:
        ranged = tracked_cache(
            tracked_cache(docs).repartitionByRange(
                n_part, F.col("n_chars").desc(), F.col("doc_id")
            )
        )
        with_pid = ranged.withColumn("pid", F.spark_partition_id())
    # local ordered prefix sum inside each range partition
    w_local = (
        Window.partitionBy("pid")
        .orderBy(F.col("n_chars").desc(), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = with_pid.withColumn("local_cum", F.sum("n_toks").over(w_local))
    # per-partition totals → exclusive prefix offsets: one row per
    # partition, cumsum'd in a p-row single-partition window (bounded
    # by the partition count, never data-sized), joined back broadcast
    # on pid. All lazy — no collect, no literal map, no coupling to
    # the cache's lifetime.
    w_off = Window.orderBy("pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        with_pid.groupBy("pid")
        .agg(F.sum("n_toks").alias("t"))
        .select(
            "pid",
            F.coalesce(F.sum("t").over(w_off), F.lit(0).cast("long")).alias(
                "__offset"
            ),
        )
    )
    return (
        local.join(F.broadcast(offsets), "pid")
        .withColumn("cum_toks", F.col("local_cum") + F.col("__offset"))
        .filter(F.col("cum_toks") <= _HEAD_BUDGET)
        .select("doc_id", "n_toks", "cum_toks")
    )


# ---------------------------------------------------------------------------
# Arrow-native grouped execution: centroids via applyInArrow
# ---------------------------------------------------------------------------


@register(
    "label_centroids_arrow",
    # exact same algebra as label_centroids => exact same oracle
    oracle=f"""
    WITH x AS (
      SELECT label, d - 1 AS pos, {_SQL_MICRO} AS micro
      FROM embeddings CROSS JOIN generate_series(1, 64) AS t(d)
    ),
    g AS (
      SELECT label, pos,
             CAST(FLOOR(CAST(SUM(micro) AS DOUBLE)/COUNT(*)) AS BIGINT) AS cm,
             COUNT(*) AS cnt
      FROM x GROUP BY 1, 2
    )
    SELECT label,
           string_agg(CAST(cm AS VARCHAR), ',' ORDER BY pos) AS centroid_micro_csv,
           CAST(MAX(cnt) AS BIGINT) AS n_vectors
    FROM g GROUP BY label
    """,
    doc="The Arrow-native fast tier of label_centroids: "
    "groupBy(label).applyInArrow hands each label's vectors to numpy "
    "as one zero-copy Arrow table (no pandas materialization, no "
    "per-dim explode/shuffle — the only exchange is the label "
    "groupBy). Identical integer micro-unit algebra — quantize, exact "
    "int64 column sums, FLOOR(sum/count) as the same single IEEE "
    "divide — so it carries the expression tier's oracle verbatim: "
    "the fast-tier/same-oracle pattern (cf. ann_topk_blockwise).",
    tags=("vectors", "centroids", "applyInArrow"),
)
def label_centroids_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pyarrow as pa

    def centroid(table: "pa.Table") -> "pa.Table":
        label = table.column("label")[0].as_py()
        # actual zero-copy: view the ListArray's flat values buffer and
        # reshape — to_pylist() would materialize 64N Python floats
        emb_col = table.column("embedding").combine_chunks()
        flat = np.asarray(emb_col.flatten(), dtype=np.float64)
        vecs = flat.reshape(len(emb_col), -1)
        micro = np.floor(vecs * 1e6 + 0.5).astype(np.int64)
        sums = micro.sum(axis=0)
        n = micro.shape[0]
        # same IEEE op as FLOOR(CAST(sum AS DOUBLE)/count) (sums < 2^53)
        cm = np.floor(sums.astype(np.float64) / n).astype(np.int64)
        return pa.table(
            {
                "label": pa.array([label], type=pa.int32()),
                "centroid_micro_csv": pa.array(
                    [",".join(str(int(v)) for v in cm)], type=pa.string()
                ),
                "n_vectors": pa.array([n], type=pa.int64()),
            }
        )

    emb = load_table(spark, sf_dir, "embeddings").select("label", "embedding")
    return emb.groupBy("label").applyInArrow(
        centroid, "label int, centroid_micro_csv string, n_vectors long"
    )


# ---------------------------------------------------------------------------
# Mergeable Datasketches HLL (Spark 3.5 hll_sketch_agg family)
# ---------------------------------------------------------------------------


@register(
    "hll_sketch_users",
    # like approx_distinct_users: raw sketch bytes are engine-specific,
    # so the oracle pins the exact counts plus the PROPERTY flags
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS estimate_within_band,
           TRUE AS union_matches_direct
    FROM events GROUP BY event_type
    """,
    doc="Apache Datasketches HLL (hll_sketch_agg / hll_union_agg / "
    "hll_sketch_estimate, Spark 3.5+) — unlike approx_count_distinct's "
    "opaque HLL++, these sketches are STORABLE and re-aggregatable: "
    "per-day sketches persist beside the data and roll up to any "
    "window without rescanning raw events (the incremental-cardinality "
    "pattern at 100 TB). Property-oracled twice: the direct estimate "
    "lands within 5% (+/-1) of exact, and the union of per-day "
    "sketches estimates EXACTLY what the direct sketch does — "
    "register-wise max is associative, so daily rollup loses nothing.",
    tags=("agg", "approx", "sketch", "mergeable"),
)
def hll_sketch_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    direct = ev.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"),
        F.count_distinct("user_id").alias("exact_users"),
    )
    daily = (
        ev.groupBy("event_type", F.col("ts").cast("date").alias("d"))
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("union_est"))
    )
    band = F.greatest(
        (F.col("exact_users").cast("double") * 0.05), F.lit(1.0)
    )
    return (
        direct.join(daily, "event_type")
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("est") - F.col("exact_users").cast("double")) <= band
            ).alias("estimate_within_band"),
            (F.col("union_est") == F.col("est")).alias("union_matches_direct"),
        )
    )


# ---------------------------------------------------------------------------
# Native pivot API + ANSI-safe try_* arithmetic
# ---------------------------------------------------------------------------

_EVENT_TYPES = ("view", "click", "purchase", "signup", "error")


@register(
    "event_type_pivot_native",
    oracle="""
    SELECT CAST(ts AS DATE) AS d,
           CAST(COALESCE(SUM(CASE WHEN event_type = 'view'
                 THEN CAST(FLOOR(value*100 + 0.5) AS BIGINT) END), 0) AS BIGINT)
             AS view,
           CAST(COALESCE(SUM(CASE WHEN event_type = 'click'
                 THEN CAST(FLOOR(value*100 + 0.5) AS BIGINT) END), 0) AS BIGINT)
             AS click,
           CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
                 THEN CAST(FLOOR(value*100 + 0.5) AS BIGINT) END), 0) AS BIGINT)
             AS purchase,
           CAST(COALESCE(SUM(CASE WHEN event_type = 'signup'
                 THEN CAST(FLOOR(value*100 + 0.5) AS BIGINT) END), 0) AS BIGINT)
             AS signup,
           CAST(COALESCE(SUM(CASE WHEN event_type = 'error'
                 THEN CAST(FLOOR(value*100 + 0.5) AS BIGINT) END), 0) AS BIGINT)
             AS error
    FROM events GROUP BY 1
    """,
    doc="The native .pivot() API with EXPLICIT values — the form that "
    "scales: declared pivot values skip the extra distinct-collection "
    "job AND make output columns deterministic (a driver-inferred "
    "column set can reorder or grow between runs). Catalyst compiles "
    "it to the same single-pass conditional aggregation as "
    "event_type_pivot's hand-built form, which is the oracle.",
    tags=("agg", "pivot"),
)
def event_type_pivot_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    out = (
        ev.select(F.col("ts").cast("date").alias("d"), "event_type", cents.alias("c"))
        .groupBy("d")
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.sum("c"))
    )
    return out.select(
        "d", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in _EVENT_TYPES]
    )


@register(
    "safe_arithmetic_ops",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_discount = 0 THEN NULL
                ELSE l_extendedprice / l_discount END AS price_per_discount,
           CASE WHEN l_orderkey > 7 THEN NULL
                ELSE 9223372036854775800 + l_orderkey END AS overflow_guarded,
           CASE WHEN l_quantity = 0 THEN NULL
                ELSE CAST(l_quantity AS BIGINT) END AS qty_nonzero
    FROM lineitem WHERE l_orderkey < 200
    """,
    doc="ANSI-mode-safe arithmetic via the try_* family: Spark 4 runs "
    "ANSI by default, where /0 and long overflow THROW mid-job — "
    "try_divide / try_add return NULL instead, turning a poison row "
    "into a null you can quarantine rather than a dead 100 TB job. "
    "Oracle spells the same semantics with CASE guards (DuckDB also "
    "errors on /0 and bigint overflow).",
    tags=("ansi", "null_safety"),
)
def safe_arithmetic_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(F.col("l_extendedprice"), F.col("l_discount")).alias(
            "price_per_discount"
        ),
        F.try_add(F.lit(9223372036854775800), F.col("l_orderkey")).alias(
            "overflow_guarded"
        ),
        F.when(F.col("l_quantity") != 0, F.col("l_quantity").cast("long")).alias(
            "qty_nonzero"
        ),
    )


# ---------------------------------------------------------------------------
# MERGE (upsert/delete) semantics as a full-outer reconciliation
# ---------------------------------------------------------------------------


@register(
    "products_merge_upsert",
    oracle="""
    WITH updates AS (
      SELECT p_partkey, p_retailprice + 1.0 AS new_price, FALSE AS is_delete
      FROM part WHERE p_partkey % 10 = 0
      UNION ALL
      SELECT p_partkey + 1000000, 9.99, FALSE
      FROM part WHERE p_partkey % 97 = 0
      UNION ALL
      SELECT p_partkey, NULL, TRUE FROM part WHERE p_partkey % 50 = 25
    )
    SELECT COALESCE(t.p_partkey, u.p_partkey) AS p_partkey,
           CASE WHEN u.p_partkey IS NULL THEN 'keep'
                WHEN u.is_delete THEN 'delete'
                WHEN t.p_partkey IS NULL THEN 'insert'
                ELSE 'update' END AS action,
           CASE WHEN u.p_partkey IS NULL THEN t.p_retailprice
                WHEN u.is_delete THEN NULL
                ELSE u.new_price END AS final_price
    FROM part t FULL OUTER JOIN updates u ON t.p_partkey = u.p_partkey
    """,
    doc="MERGE INTO semantics (matched-update, matched-delete, "
    "not-matched-insert, untouched-keep) expressed as ONE full-outer "
    "reconciliation join plus a CASE action column — the engine-level "
    "plan a Delta/Iceberg MERGE lowers to. The updates feed is "
    "deterministic (derived from part), so the result is oracled "
    "end-to-end; at scale the join shuffles on the merge key once and "
    "file rewriting is the sink's concern (cf. compact_files).",
    tags=("warehouse", "merge", "upsert"),
)
def products_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    updates = (
        part.filter(F.col("p_partkey") % 10 == 0)
        .select(
            "p_partkey",
            (F.col("p_retailprice") + 1.0).alias("new_price"),
            F.lit(False).alias("is_delete"),
        )
        .union(
            part.filter(F.col("p_partkey") % 97 == 0).select(
                (F.col("p_partkey") + 1000000).alias("p_partkey"),
                F.lit(9.99).alias("new_price"),
                F.lit(False).alias("is_delete"),
            )
        )
        .union(
            part.filter(F.col("p_partkey") % 50 == 25).select(
                "p_partkey",
                F.lit(None).cast("double").alias("new_price"),
                F.lit(True).alias("is_delete"),
            )
        )
    )
    t = part.select(F.col("p_partkey").alias("tk"), "p_retailprice")
    u = updates.select(
        F.col("p_partkey").alias("uk"), "new_price", "is_delete"
    )
    j = t.join(u, t.tk == u.uk, "full_outer")
    return j.select(
        F.coalesce("tk", "uk").alias("p_partkey"),
        F.when(F.col("uk").isNull(), "keep")
        .when(F.col("is_delete"), "delete")
        .when(F.col("tk").isNull(), "insert")
        .otherwise("update")
        .alias("action"),
        F.when(F.col("uk").isNull(), F.col("p_retailprice"))
        .when(F.col("is_delete"), F.lit(None).cast("double"))
        .otherwise(F.col("new_price"))
        .alias("final_price"),
    )


# ---------------------------------------------------------------------------
# Exact-substring duplication (cross-document shared n-token windows)
# ---------------------------------------------------------------------------

_SUBSTR_N = 8  # window length in tokens
_SUBSTR_MAX_DF = 10  # boilerplate guard: ignore grams in > this many docs
_SUBSTR_MAX_TOKENS = 4096  # window-start cap per doc (both engines)

# ONE DuckDB definition of the gram relation (toks -> windows -> 60-bit
# keys -> doc-frequency band), consumed by BOTH substring oracles so
# the pair finder and the savings report can only drift together.
# Round 6: the gram key is the first 15 hex digits of the window md5
# folded to a BIGINT (exact: digit * (1 << 4*(15-i)) — integer shifts,
# never the double-typed ** operator, which loses bits above 2^53).
# Both engines compute the SAME 60-bit key, so truncation-collision
# semantics stay bit-identical; an 8-byte shuffle key replaces the
# 32-char md5 string (measured −12% at sf10 on top of the doc-list
# restructure).
def _sql_substr_gram_ctes() -> str:
    return f"""
    toks AS (
      SELECT doc_id, {SQL_TOKENS} AS tk FROM documents
    ),
    grams AS (
      SELECT DISTINCT doc_id,
             list_sum(list_transform(generate_series(1, 15),
               h -> (strpos('0123456789abcdef',
                       substr(md5(list_aggregate(
                         list_slice(tk, i, i + {_SUBSTR_N} - 1),
                         'string_agg', ' ')), h, 1)) - 1)
                    * (CAST(1 AS BIGINT) << (4 * (15 - h))))) AS g
      FROM toks CROSS JOIN generate_series(1, {_SUBSTR_MAX_TOKENS}) AS t(i)
      WHERE i + {_SUBSTR_N} - 1 <= len(tk)
    ),
    keep AS (
      SELECT g FROM grams GROUP BY g
      HAVING COUNT(*) BETWEEN 2 AND {_SUBSTR_MAX_DF}
    )
"""


@register(
    "exact_substring_dup_pairs",
    oracle=f"""
    WITH {_sql_substr_gram_ctes()},
    pair AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.g
      FROM grams a JOIN keep USING (g) JOIN grams b USING (g)
      WHERE a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, CAST(COUNT(DISTINCT g) AS BIGINT) AS shared_windows
    FROM pair GROUP BY 1, 2
    """,
    doc="Exact-substring duplication pairs (the ExactSubstr signal of "
    "Lee et al. 2022, 'Deduplicating Training Data Makes Language "
    "Models Better', re-expressed relationally): documents sharing "
    f"any verbatim {_SUBSTR_N}-token window, found by exploding "
    "window hashes and equi-joining on the hash — candidate "
    "generation shuffles on the gram key only, never compares all "
    f"pairs. The doc-frequency band (2..{_SUBSTR_MAX_DF}) is the standard "
    "boilerplate guard: a gram in thousands of documents is template "
    "text, and dropping it also bounds the join fan-out per key at "
    "scale. Complements MinHash (set overlap) with ORDERED verbatim "
    "overlap. ROUND-6 PLAN (the 100-TB cost leader attacked): (1) the "
    "gram key is a 60-bit integer (first 15 md5 hex digits, identical "
    "fold in the oracle) so every exchange moves 8-byte keys, not "
    "32-char strings; (2) instead of the two-sided gram self-join, "
    "band survivors are grouped per gram into a sorted doc list — "
    "bounded by max_df, so no skew bomb — whose in-row pair expansion "
    "feeds a count(*) (each (pair, gram) arises exactly once, so "
    "count_distinct and its expand are gone). One full-gram exchange "
    "eliminated; the groupBy(g) after the keep join reuses the join "
    "partitioning. Interleaved A/B, rotated order: 17.1 → 10.6 s "
    "best-of-3 at sf10 (−38%), −37% at sf1; at sf0.1 the old form is "
    "~0.2 s faster (broadcast-join regime, md5 compute dominates) — "
    "the scale constant is the bill that matters. Window starts cap "
    f"at {_SUBSTR_MAX_TOKENS} tokens per document on BOTH engines "
    "(one shared constant).",
    tags=("text", "dedup", "exact-substring"),
)
def exact_substring_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..caching import tracked_cache
    from ..operators.dedup import explode_nonempty
    from ..sources.tpch import repartition_for_compute

    docs = repartition_for_compute(
        load_table(spark, sf_dir, "documents")
    ).select("doc_id", tokens(F.col("text")).alias("tk"))
    # cap matches the oracle's generate_series bound: documents beyond
    # _SUBSTR_MAX_TOKENS tokens contribute their first windows only.
    # conv() parses the 15-hex-digit prefix exactly (unsigned 64-bit
    # internally; 16^15-1 < 2^63 so the long cast never saturates).
    # window_join (r13): the window STRING construction — not the md5
    # — was the pass's cost (measured at sf1: strings 1.48 s, +md5
    # 1.49 s); element_at reads replace slice's per-window array
    # allocation for a byte-identical string, −55% on the pass.
    from ..functions.text import window_join

    windows = F.transform(
        F.sequence(
            F.lit(1),
            F.least(
                F.size("tk") - (_SUBSTR_N - 1), F.lit(_SUBSTR_MAX_TOKENS)
            ),
        ),
        lambda i: F.conv(
            F.substring(
                F.md5(window_join(F.col("tk"), i, _SUBSTR_N)), 1, 15
            ),
            16,
            10,
        ).cast("long"),
    )
    # (doc, gram) duplicates only arise WITHIN a document (the same
    # window text repeated), so array_distinct on the per-row window
    # list dedups for free — the former cross-corpus .distinct() paid
    # a full gram-relation shuffle for what one row-local pass gives
    grams = explode_nonempty(
        docs.filter(F.size("tk") >= _SUBSTR_N),
        "g",
        F.array_distinct(windows),
        "doc_id",
    ).transform(tracked_cache)
    keep = grams.groupBy("g").agg(F.count(F.lit(1)).alias("df")).filter(
        (F.col("df") >= 2) & (F.col("df") <= _SUBSTR_MAX_DF)
    )
    # band survivors -> per-gram sorted doc list (size bounded by
    # max_df: the keep join happens BEFORE collect_list, so a
    # boilerplate gram in millions of docs can never assemble a giant
    # list on one reducer) -> in-row ordered pair expansion
    doclists = (
        grams.join(keep.select("g"), "g")
        .groupBy("g")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ds"))
    )
    pairs = F.expr(
        "flatten(transform(ds, (x, i) ->"
        " transform(slice(ds, i + 2, size(ds) - i - 1),"
        "           y -> struct(x AS id_a, y AS id_b))))"
    )
    return (
        explode_nonempty(doclists, "p", pairs)
        .select("p.id_a", "p.id_b")
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared_windows"))
    )


# ---------------------------------------------------------------------------
# Tokenizer-training + dataset-card surfaces
# ---------------------------------------------------------------------------


@register(
    "bpe_top_pairs",
    oracle=f"""
    WITH toks AS (
      SELECT unnest({SQL_TOKENS}) AS tok FROM documents
    ),
    pairs AS (
      SELECT substr(tok, i, 2) AS pair
      FROM toks CROSS JOIN generate_series(1, 64) AS t(i)
      WHERE i <= length(tok) - 1
    )
    SELECT pair, CAST(COUNT(*) AS BIGINT) AS n
    FROM pairs GROUP BY pair
    ORDER BY n DESC, pair
    LIMIT 20
    """,
    doc="The first iteration of BPE tokenizer training: count adjacent "
    "symbol pairs across the corpus and take the most frequent (the "
    "pair a BPE trainer would merge next), deterministic tie-break on "
    "the pair itself. One explode + one grouped count + TakeOrdered — "
    "each further merge round is the same plan over re-segmented "
    "tokens, so the full trainer is this query iterated (cf. the "
    "unrolled-rounds pattern of supplier_pagerank). Char positions "
    "bound by token length on both engines.",
    tags=("text", "tokenizer", "bpe"),
)
def bpe_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import explode_nonempty
    from ..sources.tpch import repartition_for_compute

    docs = repartition_for_compute(load_table(spark, sf_dir, "documents"))
    toks = explode_nonempty(
        docs.select(tokens(F.col("text")).alias("tk")), "tok", F.col("tk")
    )
    pairs = explode_nonempty(
        toks.select(
            # pair positions cap at 64 on BOTH engines (the oracle's
            # generate_series bound; no real token approaches it)
            F.expr(
                "transform(sequence(1, least(greatest(length(tok) - 1, 1), 64)),"
                " i -> substr(tok, i, 2))"
            ).alias("ps"),
        ).filter(F.length(F.col("ps")[0]) == 2),
        "pair",
        F.col("ps"),
    ).filter(F.length("pair") == 2)
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "pair")
        .limit(20)
    )


@register(
    "dataset_card_stats",
    oracle=f"""
    WITH d AS (
      SELECT source, lang, n_chars,
             CAST(len({SQL_TOKENS}) AS BIGINT) AS n_toks
      FROM documents
    )
    SELECT source, lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(FLOOR(CAST(SUM(n_toks) AS DOUBLE)/COUNT(*)) AS BIGINT)
             AS mean_tokens_per_doc
    FROM d GROUP BY 1, 2
    """,
    doc="Dataset-card statistics — the per-(source, language) rollup "
    "every corpus release publishes (doc counts, token/char totals, "
    "mean document length): one grouped pass, integer sums with the "
    "portable floored mean. At 100 TB this runs as the standing "
    "metrics job whose output IS the documentation table.",
    tags=("text", "stats", "dataset-card"),
)
def dataset_card_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "source",
        "lang",
        "n_chars",
        F.size(tokens(F.col("text"))).cast("long").alias("n_toks"),
    )
    return docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
        F.expr(
            "CAST(FLOOR(CAST(SUM(n_toks) AS DOUBLE)/COUNT(*)) AS BIGINT)"
        ).alias("mean_tokens_per_doc"),
    )


# ---------------------------------------------------------------------------
# File-index consultation inside a registered query
# ---------------------------------------------------------------------------


@register(
    "pruned_range_scan_stats",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MIN(doc_id) AS BIGINT) AS min_id,
           CAST(MAX(doc_id) AS BIGINT) AS max_id
    FROM documents WHERE doc_id BETWEEN 10 AND 40
    """,
    doc="The stats file index (sources/file_index.py) exercised as a "
    "QUERY: the documents table is laid out once per session into a "
    "range-compacted scratch copy with a persisted min/max manifest "
    "(the commit-time step of a table format), and the range query is "
    "answered via read_pruned — the scan opens only the files whose "
    "footer range overlaps, planning from manifest metadata alone. "
    "Pruning is provably lossless: the result equals the plain "
    "filtered scan, which is the oracle. The layout write is the "
    "idempotent setup a real table maintains continuously via "
    "compact_files.",
    tags=("warehouse", "file-index", "pruning"),
)
def pruned_range_scan_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob as _glob
    import json as _json
    import os
    import tempfile

    from ..sources.file_index import MANIFEST_NAME, read_pruned, write_manifest
    from ..sources.scratch import content_fingerprint, ensure_scratch

    # scratch key is the shared CONTENT fingerprint (size + ns-mtime +
    # first/last 64 KiB) — a regenerated testdata file (even same-size
    # within the same mtime second) gets a fresh layout copy instead
    # of silently serving stale rows; build/validate semantics are the
    # shared stage-then-swap (sources/scratch.py, round-6 dedup of
    # three drifting copies of this pattern)
    src = os.path.join(sf_dir, "documents.parquet")
    key = content_fingerprint(src)
    scratch = os.path.join(tempfile.gettempdir(), f"csetl_file_index_{key}")

    def _intact(d: str) -> bool:
        mpath = os.path.join(d, MANIFEST_NAME)
        if not os.path.exists(mpath):
            return False
        with open(mpath) as f:
            listed = {e["file"] for e in _json.load(f)["files"]}
        on_disk = {
            os.path.basename(x)
            for x in _glob.glob(os.path.join(d, "part-*.parquet"))
        }
        return listed == on_disk  # a /tmp cleaner may remove parts

    def _build(stage: str) -> None:
        docs = load_table(spark, sf_dir, "documents")
        (
            docs.repartitionByRange(6, "doc_id")
            .sortWithinPartitions("doc_id")
            .write.mode("overwrite")
            .parquet(stage)
        )
        write_manifest(stage, "doc_id")

    ensure_scratch(scratch, _build, _intact)
    pruned = read_pruned(spark, scratch, "doc_id", 10, 40)
    return pruned.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


@register(
    "exact_substring_dup_savings",
    oracle=f"""
    WITH RECURSIVE {_sql_substr_gram_ctes()},
    pair AS (
      SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
      FROM grams a JOIN keep USING (g) JOIN grams b USING (g)
      WHERE a.doc_id < b.doc_id
    ),
    alledges AS (
      SELECT src AS a, dst AS b FROM pair
      UNION ALL SELECT dst, src FROM pair
    ),
    reach(node, comp) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.b, r.comp FROM reach r JOIN alledges e ON e.a = r.node
    ),
    labels AS (
      SELECT node AS doc_id, MIN(comp) AS cluster_id FROM reach GROUP BY node
    ),
    rep AS (
      SELECT l.cluster_id,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(d.n_chars) AS BIGINT) AS total_chars,
             CAST(SUM(CASE WHEN d.doc_id = l.cluster_id THEN d.n_chars
                           ELSE 0 END) AS BIGINT) AS survivor_chars
      FROM labels l JOIN documents d ON d.doc_id = l.doc_id
      GROUP BY 1
    ),
    cov AS (
      SELECT CAST(SUM(w) AS BIGINT) AS windows_total,
             CAST(SUM(LEAST(w, {_SUBSTR_MAX_TOKENS})) AS BIGINT)
               AS windows_considered,
             CAST(SUM(CASE WHEN w > {_SUBSTR_MAX_TOKENS} THEN 1 ELSE 0 END)
               AS BIGINT) AS docs_capped
      FROM (
        SELECT GREATEST(len({SQL_TOKENS}) - {_SUBSTR_N - 1}, 0) AS w
        FROM documents
      )
    )
    SELECT cluster_id, n_docs,
           CAST(n_docs - 1 AS BIGINT) AS n_dups,
           CAST(total_chars - survivor_chars AS BIGINT) AS chars_saved,
           windows_total, windows_considered, docs_capped
    FROM rep, cov WHERE n_docs >= 2
    """,
    doc="The dedup DECISION layer for the ordered-overlap family: "
    "exact-substring pairs closed into connected components "
    "(operators/graph min-label propagation), lowest doc_id elected "
    "survivor per cluster, and the report a curation run acts on — "
    "duplicates to drop and bytes reclaimed. Same pipeline shape as "
    "neardup_clusters over MinHash edges; the oracle rebuilds the "
    "pairs and closes them with recursive-CTE reachability. "
    "Components shuffle node-sized state only; edges come from the "
    "banded candidate join, never all pairs. The 'no silent caps' "
    "rule, applied to the per-doc window-start cap: every row carries "
    "windows_total / windows_considered / docs_capped (one broadcast "
    "1-row aggregate), so a corpus whose documents overflow "
    f"{_SUBSTR_MAX_TOKENS} window starts ANNOUNCES how much ordered-"
    "overlap coverage the cap discarded instead of silently reporting "
    "savings over the truncated window set.",
    tags=("text", "dedup", "graph", "exact-substring"),
)
def exact_substring_dup_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import component_labels

    docs = load_table(spark, sf_dir, "documents")
    pairs = exact_substring_dup_pairs(spark, sf_dir).select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    labels = component_labels(docs.select("doc_id"), pairs, "doc_id")
    rep = (
        labels.join(docs.select("doc_id", "n_chars"), "doc_id")
        .groupBy(F.col("component").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum(
                F.when(
                    F.col("doc_id") == F.col("component"), F.col("n_chars")
                ).otherwise(F.lit(0))
            ).alias("survivor_chars"),
        )
    )
    # cap-coverage columns: corpus-level constants attached via a
    # broadcast 1-row cross join (the lazy scalar-aggregate pattern)
    w = F.greatest(
        F.size(tokens(F.col("text"))) - (_SUBSTR_N - 1), F.lit(0)
    ).alias("w")
    cov = docs.select(w).agg(
        F.sum("w").alias("windows_total"),
        F.sum(F.least(F.col("w"), F.lit(_SUBSTR_MAX_TOKENS))).alias(
            "windows_considered"
        ),
        F.sum((F.col("w") > _SUBSTR_MAX_TOKENS).cast("long")).alias(
            "docs_capped"
        ),
    )
    return (
        rep.filter(F.col("n_docs") >= 2)
        .select(
            "cluster_id",
            "n_docs",
            (F.col("n_docs") - 1).cast("long").alias("n_dups"),
            (F.col("total_chars") - F.col("survivor_chars"))
            .cast("long")
            .alias("chars_saved"),
        )
        .crossJoin(F.broadcast(cov))
    )


# ---------------------------------------------------------------------------
# Triangle counting (the third classic distributed-graph primitive,
# after connected components and PageRank)
# ---------------------------------------------------------------------------


@register(
    "supplier_triangle_count",
    oracle="""
    WITH li AS (
      SELECT l_orderkey AS ok, l_suppkey AS s FROM lineitem
      WHERE l_orderkey % 100 = 0
    ),
    e AS (
      SELECT DISTINCT a.s AS u, b.s AS v
      FROM li a JOIN li b ON a.ok = b.ok AND a.s < b.s
    ),
    deg AS (
      SELECT s, COUNT(*) AS d FROM (
        SELECT u AS s FROM e UNION ALL SELECT v AS s FROM e
      ) GROUP BY s
    ),
    o AS (
      SELECT CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.u ELSE e.v END AS src,
             CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.v ELSE e.u END AS dst,
             CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN dv.d ELSE du.d END AS ddeg
      FROM e JOIN deg du ON du.s = e.u JOIN deg dv ON dv.s = e.v
    ),
    tri AS (
      SELECT 1 AS one
      FROM o e1 JOIN o e2
        ON e1.src = e2.src AND (e1.ddeg, e1.dst) < (e2.ddeg, e2.dst)
      JOIN o e3 ON e3.src = e1.dst AND e3.dst = e2.dst
    )
    SELECT CAST((SELECT COUNT(*) FROM tri) AS BIGINT) AS n_triangles,
           CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
           CAST((SELECT COUNT(DISTINCT s) FROM li) AS BIGINT) AS n_nodes
    """,
    doc="Triangle counting over the supplier co-occurrence graph "
    "(suppliers sharing an order) via the DEGREE-ORIENTED edge join "
    "(operators/graph.py orient_by_degree): edges canonicalized "
    "low-(degree, id) → high-(degree, id), wedges pair each pivot's "
    "out-neighbors, closed by one oriented edge lookup — never an "
    "unoriented 3-way self-join. With this orientation every wedge "
    "pivots on its LOWEST-degree vertex, bounding per-key fan-out by "
    "O(sqrt(m)) on a power-law graph (the standard MapReduce triangle "
    "bound); raw u<v orientation would let a hot low-id hub emit "
    "C(deg,2) wedges (tests/test_round4.py pins the hub-graph "
    "difference). The triangle COUNT is orientation-invariant, so the "
    "oracle mirrors the same (degree, id) re-orientation only to keep "
    "the plans comparable. Degree join adds two vertex-keyed "
    "map-side-combinable shuffles over the id-oriented form.",
    tags=("graph", "triangles"),
)
def supplier_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..caching import tracked_cache
    from ..operators.graph import orient_by_degree, triangle_count_oriented

    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 100 == 0)
        .select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("s"))
        .transform(tracked_cache)
    )
    a = li.select("ok", F.col("s").alias("u"))
    b = li.select("ok", F.col("s").alias("v"))
    e = (
        a.join(b, "ok")
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
        .transform(tracked_cache)
    )
    o = orient_by_degree(e, src="u", dst="v").transform(tracked_cache)
    # three single-row aggregates composed lazily (broadcast 1-row
    # cross joins) — nothing is collected driver-side
    t_agg = triangle_count_oriented(o)
    e_agg = e.agg(F.count(F.lit(1)).alias("n_edges"))
    n_agg = li.select("s").distinct().agg(F.count(F.lit(1)).alias("n_nodes"))
    return t_agg.crossJoin(F.broadcast(e_agg)).crossJoin(F.broadcast(n_agg))
