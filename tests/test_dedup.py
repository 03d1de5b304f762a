"""Dedup operator semantics: MinHash-LSH recall against exact Jaccard,
SimHash fingerprint sanity, exact-dedup survivor policy."""

from __future__ import annotations

from pyspark.sql import functions as F

from candy_store_etl_spark.functions.text import tokens, word_shingles
from candy_store_etl_spark.operators.dedup import (
    exact_dedup,
    lsh_candidate_pairs,
    minhash_dedup_pairs,
    minhash_signatures,
    simhash,
    simhash_neardup_pairs,
)


def _docs(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away"
    rows = [
        (0, base),
        (1, base),                                   # exact dup of 0
        (2, base + " tonight"),                      # near dup of 0
        (3, "completely different words about spark query engines here"),
        (4, "completely different words about spark query engines there"),
        (5, "unrelated short text"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def exact_jaccard_pairs(spark, docs, shingle_n=3):
    tok = docs.select(
        "doc_id",
        F.array_distinct(word_shingles(tokens(F.col("text")), shingle_n)).alias("sh"),
    )
    a = tok.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sa"))
    b = tok.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb"))
    union = F.size(F.array_union("sa", "sb"))
    return {
        (r.id_a, r.id_b): r.j
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", (inter / union).alias("j"))
        .collect()
    }


def test_exact_dedup_survivor_policy(spark):
    docs = _docs(spark)
    res = {r.keep_id: r.dup_count for r in
           exact_dedup(docs, "doc_id", "text").collect()}
    assert res[0] == 2          # docs 0 and 1 collapse, keep lowest id
    assert 1 not in res
    assert res[2] == 1


def test_minhash_signature_positions_differ(spark):
    """Regression: permutation seeds must vary per position (the
    two-arg-lambda bug made all 64 positions identical)."""
    sigs = minhash_signatures(_docs(spark), "doc_id", "text", num_perm=16)
    row = sigs.first()
    assert len(set(row.signature)) > 1


def test_minhash_finds_true_neardups(spark):
    docs = _docs(spark)
    truth = exact_jaccard_pairs(spark, docs)
    high = {p for p, j in truth.items() if j >= 0.5}
    got = {
        (r.id_a, r.id_b)
        for r in minhash_dedup_pairs(
            docs, "doc_id", "text", num_perm=64, bands=32, threshold=0.4
        ).collect()
    }
    # exact dup pair must always be found; near-dups with J>=0.5 should
    # be found with 32 bands of 2 rows (collision prob ≈ 1-(1-J^2)^32)
    assert (0, 1) in got
    missed = high - got
    assert not missed, f"missed true near-dup pairs: {missed}"
    # no wildly-false positives: every reported pair has true J >= 0.2
    false = {p for p in got if truth.get(p, 0.0) < 0.2}
    assert not false, f"false positives: {false}"


def test_lsh_band_count(spark):
    sigs = minhash_signatures(_docs(spark), "doc_id", "text", num_perm=16)
    cands = lsh_candidate_pairs(sigs, num_perm=16, bands=4)
    assert (0, 1) in {(r.id_a, r.id_b) for r in cands.collect()}


def test_simhash_identical_and_near_docs(spark):
    docs = _docs(spark)
    fps = {r.id: r.simhash for r in simhash(docs, "doc_id", "text").collect()}
    assert fps[0] == fps[1]                       # identical text
    assert fps[0] != fps[3]                       # different text
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_neardup_pairs(
            docs, "doc_id", "text", max_hamming=3
        ).collect()
    }
    # the chunk-band pigeonhole guarantees recall only for hamming ≤ 3:
    # identical docs and the one-suffix-token variant qualify
    assert pairs[(0, 1)] == 0
    assert (0, 2) in pairs
    # relative ordering: near-dup (3,4) is closer than unrelated (3,5)
    def ham(a, b):
        return bin(fps[a] ^ fps[b]).count("1")

    assert ham(3, 4) < ham(3, 5)


def test_minhash_bands_must_divide(spark):
    sigs = minhash_signatures(_docs(spark), "doc_id", "text", num_perm=16)
    import pytest

    with pytest.raises(ValueError, match="divide"):
        lsh_candidate_pairs(sigs, num_perm=16, bands=5)


def test_oph_signature_shape_and_determinism(spark):
    from candy_store_etl_spark.operators.dedup import minhash_signatures_oph

    docs = _docs(spark)
    s1 = {r.id: tuple(r.signature) for r in
          minhash_signatures_oph(docs, "doc_id", "text", num_perm=16).collect()}
    s2 = {r.id: tuple(r.signature) for r in
          minhash_signatures_oph(docs, "doc_id", "text", num_perm=16).collect()}
    assert s1 == s2
    for sig in s1.values():
        assert len(sig) == 16
        assert all(v is not None for v in sig)  # densification filled gaps
    # identical docs -> identical signatures; distinct docs differ
    assert s1[0] == s1[1]
    assert s1[0] != s1[3]


def test_oph_rejects_non_power_of_two(spark):
    import pytest

    from candy_store_etl_spark.operators.dedup import minhash_signatures_oph

    with pytest.raises(ValueError, match="power of two"):
        minhash_signatures_oph(_docs(spark), "doc_id", "text", num_perm=48)


def _exact_jaccard_truth(sf_correctness):
    """Exact shingle-Jaccard ≥0.4 pairs over the documents testdata,
    computed in DuckDB — shared ground truth for the signature tiers."""
    import os

    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{os.path.join(sf_correctness, 'documents.parquet')}')"
    )
    truth = {
        (a, b)
        for a, b in con.execute(
            r"""
        WITH tok AS (
          SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'),
                                     x -> x != '') AS tk
          FROM documents
        ), sh AS (
          SELECT doc_id,
                 CASE WHEN len(tk) <= 3 THEN [array_to_string(tk, ' ')]
                 ELSE list_transform(generate_series(1, len(tk)-2),
                                     i -> array_to_string(tk[i:i+2], ' '))
                 END AS shingles
          FROM tok
        ), ds AS (SELECT doc_id, list_distinct(shingles) AS s FROM sh),
        flat AS (SELECT doc_id, unnest(s) AS sg FROM ds),
        sizes AS (SELECT doc_id, len(s) AS n FROM ds),
        inter AS (
          SELECT a.doc_id da, b.doc_id db, COUNT(*) i
          FROM flat a JOIN flat b ON a.sg = b.sg AND a.doc_id < b.doc_id
          GROUP BY 1,2
        )
        SELECT da, db FROM inter
        JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
        WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.4
        """
        ).fetchall()
    }
    assert truth, "ground truth unexpectedly empty"
    return truth


def _assert_estimator_quality(spark, sf_correctness, method):
    from candy_store_etl_spark.sources.tpch import load_table

    truth = _exact_jaccard_truth(sf_correctness)
    got = {
        (r.id_a, r.id_b)
        for r in minhash_dedup_pairs(
            load_table(spark, sf_correctness, "documents"),
            "doc_id",
            "text",
            num_perm=64,
            bands=16,
            threshold=0.4,
            method=method,
        ).collect()
    }
    precision = len(got & truth) / max(len(got), 1)
    recall = len(got & truth) / len(truth)
    assert precision >= 0.8, (
        f"{method} precision {precision:.2f} ({len(got)} pairs)"
    )
    assert recall >= 0.8, f"{method} recall {recall:.2f}"


def test_minhash_precision_recall_on_testdata(spark, sf_correctness):
    """Estimator-quality pin on real testdata: MinHash pairs vs the
    exact shingle-Jaccard ground truth (computed in DuckDB). A
    correlated permutation family (e.g. sequential a + j*b) inflates
    false positives ~5x and must fail here."""
    _assert_estimator_quality(spark, sf_correctness, "perm")


def test_oph_precision_recall_on_testdata(spark, sf_correctness):
    """The one-permutation (OPH) tier must hit the same estimator
    quality bars as the classic multi-permutation signatures — the
    densification step is what makes this hold for short docs."""
    _assert_estimator_quality(spark, sf_correctness, "oph")


def testexplode_nonempty_matches_plain_explode(spark):
    """The InferFiltersFromGenerate workaround must be a pure
    optimization: identical rows to plain explode for empty, null, and
    populated arrays."""
    from pyspark.sql import functions as F

    from candy_store_etl_spark.operators.dedup import explode_nonempty

    df = spark.createDataFrame(
        [(1, ["a", "b"]), (2, []), (3, None), (4, ["c"])],
        "id int, xs array<string>",
    )
    got = explode_nonempty(df, "x", F.col("xs"), "id")
    want = df.select("id", F.explode("xs").alias("x"))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def testexplode_nonempty_drops_null_elements(spark):
    """Documented divergence from plain explode: a NULL *element* inside
    a non-empty array emits a null row under explode but is dropped by
    explode_nonempty's output filter. Pin it so a call site that needs
    null-element rows finds out here, not in production."""
    from pyspark.sql import functions as F

    from candy_store_etl_spark.operators.dedup import explode_nonempty

    df = spark.createDataFrame(
        [(1, ["a", None, "b"])], "id int, xs array<string>"
    )
    got = sorted(map(tuple, explode_nonempty(df, "x", F.col("xs"), "id").collect()))
    plain = sorted(
        map(tuple, df.select("id", F.explode("xs").alias("x")).collect()),
        key=lambda t: (t[0], t[1] is None, t[1] or ""),
    )
    assert got == [(1, "a"), (1, "b")]
    assert (1, None) in plain  # the row plain explode keeps and we drop


def test_repartition_for_compute_noop_on_split_input(spark, sf_correctness, tmp_path):
    """The guard must leave already-parallel scans untouched (no
    repartition exchange at production-scale file counts) and spread
    single-split scans to defaultParallelism."""
    from candy_store_etl_spark.sources.tpch import (
        load_table,
        repartition_for_compute,
    )

    docs = load_table(spark, sf_correctness, "documents")
    spread = repartition_for_compute(docs)
    assert (
        spread.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )

    many = str(tmp_path / "many")
    docs.repartition(16).write.parquet(many)
    already = spark.read.parquet(many)
    n_before = already.rdd.getNumPartitions()
    assert n_before >= spark.sparkContext.defaultParallelism
    out = repartition_for_compute(already)
    assert out is already  # identity — no exchange added
