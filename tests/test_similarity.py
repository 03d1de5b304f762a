"""Similarity search: blockwise numpy path must equal the expression
path exactly; LSH path must hit decent recall on the testdata."""

from __future__ import annotations

from pyspark.sql import functions as F

from candy_store_etl_spark.operators.similarity import (
    cosine_topk_blockwise,
    cosine_topk_lsh,
    hyperplane_planes,
    query_probe_buckets,
)
from candy_store_etl_spark.plans import QUERIES
from candy_store_etl_spark.plans.registry import _ensure_loaded
from candy_store_etl_spark.sources.tpch import load_table

_ensure_loaded()


def test_blockwise_matches_expression_topk(spark, sf_smoke):
    expr_rows = QUERIES["ann_topk_cosine"].fn(spark, sf_smoke).collect()
    block_rows = QUERIES["ann_topk_blockwise"].fn(spark, sf_smoke).collect()
    assert [r.vec_id for r in expr_rows] == [r.vec_id for r in block_rows]
    for e, b in zip(expr_rows, block_rows):
        assert abs(e.cosine_sim - b.cosine_sim) < 1e-6


def test_lsh_recall_on_testdata(spark, sf_smoke):
    emb = load_table(spark, sf_smoke, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    rest = emb.filter(F.col("vec_id") != 0)
    exact = {r.vec_id for r in
             cosine_topk_blockwise(rest, query, k=10).collect()}
    approx = {r.vec_id for r in
              cosine_topk_lsh(rest, query, k=10, n_planes=8).collect()}
    recall = len(exact & approx) / len(exact)
    # random gaussian embeddings are LSH-hostile; multi-probe hamming-1
    # with 8 planes still has to find a meaningful fraction
    assert recall >= 0.3, f"recall {recall}"
    assert len(approx) == 10


def test_lsh_neardup_pairs_recall_and_precision(spark, sf_smoke):
    """All-pairs LSH near-dup: every planted near-duplicate (perturbed
    copy, cosine ≈ 0.999) must be recovered, and — because candidates
    are rescored with the exact cosine — every emitted pair must truly
    clear the threshold (checked against the exact quadratic join)."""
    from candy_store_etl_spark.functions.vectors import (
        cosine_similarity,
        to_double_array,
    )
    from candy_store_etl_spark.plans.vectors import (
        _PERTURB_OFFSET,
        _with_planted_neardups,
    )

    emb = _with_planted_neardups(load_table(spark, sf_smoke, "embeddings"))
    got = {
        (r.id_a, r.id_b)
        for r in QUERIES["embedding_neardup_pairs_lsh"]
        .fn(spark, sf_smoke)
        .collect()
    }
    planted = {
        (r.vec_id, r.vec_id + _PERTURB_OFFSET)
        for r in load_table(spark, sf_smoke, "embeddings")
        .select("vec_id")
        .collect()
    }
    recall = len(got & planted) / len(planted)
    assert recall >= 0.95, f"planted-pair recall {recall:.3f}"

    # precision: exact rescoring means no emitted pair may be below
    # the threshold under the exact quadratic computation
    e = emb.select("vec_id", to_double_array("embedding").alias("v"))
    a = e.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"))
    sim = cosine_similarity(F.col("va"), F.col("vb"))
    exact = {
        (r.id_a, r.id_b)
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .filter(sim >= 0.9)
        .select("id_a", "id_b")
        .collect()
    }
    assert got <= exact, f"false positives: {sorted(got - exact)[:5]}"


def test_arrow_matches_blockwise_topk(spark, sf_smoke):
    expr_rows = QUERIES["ann_topk_blockwise"].fn(spark, sf_smoke).collect()
    arrow_rows = QUERIES["ann_topk_arrow"].fn(spark, sf_smoke).collect()
    assert [r.vec_id for r in expr_rows] == [r.vec_id for r in arrow_rows]
    for e, a in zip(expr_rows, arrow_rows):
        assert abs(e.cosine_sim - a.cosine_sim) < 1e-9


def test_ivf_recall_on_testdata(spark, sf_smoke):
    from candy_store_etl_spark.operators.similarity import cosine_topk_ivf

    emb = load_table(spark, sf_smoke, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    rest = emb.filter(F.col("vec_id") != 0)
    exact = {r.vec_id for r in cosine_topk_blockwise(rest, query, k=10).collect()}
    approx_df = cosine_topk_ivf(rest, query, k=10, n_centroids=8, n_probe=3)
    approx = {r.vec_id for r in approx_df.collect()}
    recall = len(exact & approx) / len(exact)
    # gaussian embeddings have weak cluster structure; probing 3/8
    # lists must still recover a meaningful share of the true top-10
    assert recall >= 0.3, f"recall {recall}"
    assert len(approx) == 10


def test_ivf_centroids_deterministic(spark, sf_smoke):
    from candy_store_etl_spark.operators.similarity import ivf_train

    emb = load_table(spark, sf_smoke, "embeddings")
    c1 = ivf_train(emb, 4, iterations=1)
    c2 = ivf_train(emb, 4, iterations=1)
    assert (c1 == c2).all()
    assert c1.shape[0] == 4


def test_ivf_seeds_survive_sparse_id_space(spark, sf_smoke):
    """Sparse/offset ids defeat the modulus-spaced seed selection; the
    fallback (n lowest-id vectors) must still yield a full centroid
    matrix and a working top-k."""
    from candy_store_etl_spark.operators.similarity import (
        _centroid_seeds,
        cosine_topk_ivf,
    )

    emb = load_table(spark, sf_smoke, "embeddings")
    # ids spread out by a large odd factor -> almost nothing satisfies
    # id % stride == 0 for the density-derived stride
    sparse = emb.select(
        (F.col("vec_id") * 1_000_003 + 17).alias("vec_id"), "embedding"
    )
    cents = _centroid_seeds(sparse, 8, id_col="vec_id", vec_col="embedding")
    assert cents.shape[0] == 8

    query = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    got = cosine_topk_ivf(sparse, query, k=5, n_centroids=8, n_probe=8)
    assert got.count() == 5


def test_ivf_seeds_empty_table_rejected(spark):
    import pytest

    from candy_store_etl_spark.operators.similarity import _centroid_seeds

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="empty"):
        _centroid_seeds(empty, 4, id_col="vec_id", vec_col="embedding")


def test_lsh_probe_buckets():
    planes = hyperplane_planes(64, n_planes=8, seed=42)
    probes = query_probe_buckets([1.0] * 64, planes)
    assert len(probes) == 9 and len(set(probes)) == 9
    assert all(0 <= p < 2**8 for p in probes)


def test_blockwise_zero_norm_query_rejected(spark, sf_smoke):
    import pytest

    emb = load_table(spark, sf_smoke, "embeddings")
    with pytest.raises(ValueError, match="zero norm"):
        cosine_topk_blockwise(emb, [0.0] * 64, k=5)


def test_ivf_persisted_index_prunes_partitions(spark, sf_smoke, tmp_path):
    """The persisted IVF index must (a) answer identically to the
    in-memory IVF path (same deterministic training), and (b) prove in
    the physical plan that unprobed lists are PRUNED at the scan."""
    from candy_store_etl_spark.operators.similarity import (
        cosine_topk_ivf,
        ivf_build_index,
        ivf_query_index,
    )

    emb = load_table(spark, sf_smoke, "embeddings")
    rest = emb.filter(F.col("vec_id") != 0)
    query = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    path = str(tmp_path / "ivf_index")
    ivf_build_index(rest, path, n_centroids=8, iterations=2)

    out = ivf_query_index(spark, path, query, k=10, n_probe=3)
    got = [(r.vec_id, round(r.cosine_sim, 9)) for r in out.collect()]
    mem = cosine_topk_ivf(
        rest, query, k=10, n_centroids=8, n_probe=3, iterations=2
    )
    want = [(r.vec_id, round(r.cosine_sim, 9)) for r in mem.collect()]
    assert got == want

    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan and "list_id" in plan, plan
    # the probed-list filter must prune at the SCAN: replay the same
    # pruned read (input_file_name doesn't survive the mapInPandas
    # stage, so probe the scan itself) — exactly 3 of 8 list dirs read
    import glob

    import numpy as np

    all_lists = len(glob.glob(f"{path}/vectors/list_id=*"))
    assert all_lists == 8
    cent_rows = (
        spark.read.parquet(f"{path}/centroids").orderBy("list_id").collect()
    )
    cents = np.asarray([r.centroid for r in cent_rows], dtype=np.float64)
    qv = np.asarray(query, dtype=np.float64)
    qv /= np.linalg.norm(qv)
    probes = np.argsort(-(cents @ qv), kind="stable")[:3].tolist()
    pruned = spark.read.parquet(f"{path}/vectors").filter(
        F.col("list_id").isin([int(p) for p in probes])
    )
    scanned = {
        r[0].split("list_id=")[1].split("/")[0]
        for r in pruned.select(F.input_file_name()).distinct().collect()
    }
    assert len(scanned) == 3, scanned



def test_pq_recall_and_determinism(spark, sf_smoke):
    from candy_store_etl_spark.operators.similarity import (
        cosine_topk_blockwise,
        cosine_topk_pq,
    )

    emb = load_table(spark, sf_smoke, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    rest = emb.filter(F.col("vec_id") != 0)
    exact = {r.vec_id for r in cosine_topk_blockwise(rest, query, k=10).collect()}
    rows = cosine_topk_pq(rest, query, k=10, candidates=100).collect()
    approx = {r.vec_id for r in rows}
    assert len(approx) == 10
    # 8x16 codes over a 100-candidate buffer recover most of the true
    # top-10 even on weakly-clustered gaussian embeddings
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.7, f"recall {recall}"
    # emitted similarities are EXACT (rerank recomputes on raw vectors):
    # every (id, cosine) must equal the blockwise value for that id
    exact_all = {
        r.vec_id: r.cosine_sim
        for r in cosine_topk_blockwise(rest, query, k=200).collect()
    }
    for r in rows:
        assert abs(r.cosine_sim - exact_all[r.vec_id]) < 1e-9
    assert rows == cosine_topk_pq(rest, query, k=10, candidates=100).collect()


def test_pq_codebooks_deterministic_and_shaped(spark, sf_smoke):
    from candy_store_etl_spark.operators.similarity import pq_encode, pq_train, _normalized

    emb = load_table(spark, sf_smoke, "embeddings")
    b1 = pq_train(emb, m_subspaces=8, n_codes=16, iterations=1)
    b2 = pq_train(emb, m_subspaces=8, n_codes=16, iterations=1)
    assert (b1 == b2).all()
    assert b1.shape == (8, 16, 8)
    codes = pq_encode(_normalized(emb, "vec_id", "embedding"), b1).collect()
    assert len(codes) == emb.count()
    for r in codes:
        assert len(r.codes) == 8
        assert all(0 <= c < 16 for c in r.codes)


def test_pq_rejects_nondividing_subspaces(spark, sf_smoke):
    import pytest

    from candy_store_etl_spark.operators.similarity import pq_train

    emb = load_table(spark, sf_smoke, "embeddings")
    with pytest.raises(ValueError, match="divide"):
        pq_train(emb, m_subspaces=7)


def test_random_projection_preserves_distance_structure(spark, sf_correctness):
    """JL sanity: 8-dim projected distances must correlate strongly
    with the original 64-dim distances (loose band — 8 dims carries
    real distortion; structure, not magnitudes, is the claim)."""
    import numpy as np

    from candy_store_etl_spark.plans.registry import QUERIES
    from candy_store_etl_spark.sources.tpch import load_table

    proj = (
        QUERIES["embedding_random_projection"]
        .fn(spark, sf_correctness)
        .filter(F.col("vec_id") < 40)
        .orderBy("vec_id")
        .collect()
    )
    orig = (
        load_table(spark, sf_correctness, "embeddings")
        .filter(F.col("vec_id") < 40)
        .orderBy("vec_id")
        .collect()
    )
    p = np.array([[r[f"p{k}"] for k in range(8)] for r in proj])
    o = np.array([list(r.embedding) for r in orig], dtype=np.float64)
    # (a) the Spark computation IS the matrix product: element-exact
    # against numpy up to the 6-dp output rounding
    from candy_store_etl_spark.plans.vectors import _projection_matrix

    P = _projection_matrix()
    assert np.allclose(p, o @ P.T, atol=2e-6), np.abs(p - o @ P.T).max()
    # (b) the matrix satisfies JL on ISOTROPIC data: E[||Pz||^2] =
    # k*||z||^2. (The table's embeddings are clustered — their
    # difference vectors are NOT isotropic, so the quotient there
    # legitimately reflects where the clusters sit relative to this
    # fixed P; the guarantee being claimed is about the matrix.)
    k = P.shape[0]
    z = np.random.default_rng(123).standard_normal((2000, P.shape[1]))
    ratios = np.sum((z @ P.T) ** 2, axis=1) / (k * np.sum(z**2, axis=1))
    assert abs(ratios.mean() - 1.0) < 0.1, ratios.mean()
    assert np.quantile(ratios, 0.9) < 2.5, np.quantile(ratios, 0.9)
    assert np.quantile(ratios, 0.1) > 0.2, np.quantile(ratios, 0.1)


def test_multiprobe_radius_sets_nest_and_count():
    from candy_store_etl_spark.operators.similarity import (
        query_probe_buckets_radius,
    )

    planes = hyperplane_planes(64, n_planes=6, seed=42)
    q = [0.3] * 64
    r0 = query_probe_buckets_radius(q, planes, 0)
    r1 = query_probe_buckets_radius(q, planes, 1)
    r2 = query_probe_buckets_radius(q, planes, 2)
    # exact binomial sizes, all distinct, nested by construction
    assert (len(r0), len(r1), len(r2)) == (1, 7, 22)
    assert len(set(r2)) == 22
    assert set(r0) <= set(r1) <= set(r2)
    assert all(0 <= p < 2**6 for p in r2)
    # every probe really is within Hamming distance 2 of the base
    base = r0[0]
    assert all(bin(base ^ p).count("1") <= 2 for p in r2)
    # radius 1 == the legacy helper
    assert r1 == query_probe_buckets(q, planes)
    import pytest

    with pytest.raises(ValueError, match="radius"):
        query_probe_buckets_radius(q, planes, 3)


def test_multiprobe_candidates_grow_and_contain_lower_radius(
    spark, sf_smoke
):
    """The radius knob is monotone: each step's candidate set contains
    the previous one, so recall can only improve as scan grows."""
    from candy_store_etl_spark.operators.similarity import (
        lsh_bucket_ids,
        query_probe_buckets_radius,
    )

    emb = load_table(spark, sf_smoke, "embeddings")
    qrow = emb.filter(F.col("vec_id") == 0).first()
    planes = hyperplane_planes(64, n_planes=6, seed=42)
    buckets = lsh_bucket_ids(emb.filter(F.col("vec_id") != 0), planes)
    buckets.cache()
    try:
        sets = []
        for r in (0, 1, 2):
            probes = query_probe_buckets_radius(qrow.embedding, planes, r)
            sets.append(
                {
                    x.vec_id
                    for x in buckets.filter(
                        F.col("bucket").isin(probes)
                    ).collect()
                }
            )
        assert sets[0] <= sets[1] <= sets[2]
        assert len(sets[2]) > len(sets[0])
    finally:
        buckets.unpersist()


def test_multiprobe_topk_subset_of_exact_scores(spark, sf_smoke):
    """Every multiprobe hit carries its TRUE cosine (exact rerank), so
    the tier's results are always a subset of the exact ranking —
    approximate membership, never approximate scores."""
    from candy_store_etl_spark.operators.similarity import (
        cosine_topk_lsh_multiprobe,
    )

    emb = load_table(spark, sf_smoke, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    corpus = emb.filter(F.col("vec_id") != 0)
    approx = {
        r.vec_id: round(r.cosine_sim, 6)
        for r in cosine_topk_lsh_multiprobe(
            corpus, query, k=10, n_planes=6, radius=2
        ).collect()
    }
    exact = {
        r.vec_id: round(r.cosine_sim, 6)
        for r in cosine_topk_blockwise(corpus, query, k=500).collect()
    }
    assert approx  # radius 2 at 6 planes always finds candidates here
    for vid, sim in approx.items():
        assert exact[vid] == sim


def test_query_probe_sequence_orders_by_margin_cost():
    from candy_store_etl_spark.operators.similarity import (
        query_probe_sequence,
    )

    # margins: plane 2 barely cleared (cheap flip), plane 0 wide
    margins = [900, 500, 10, 300, 700, 40]
    base = 0b101010
    seq = query_probe_sequence(margins, 6, 8, base)
    assert seq[0] == base  # cost 0 first, always
    # next cheapest: flip 2 (10), flip 5 (40), flip 2+5 (50), ...
    assert seq[1] == base ^ (1 << 2)
    assert seq[2] == base ^ (1 << 5)
    assert seq[3] == base ^ (1 << 2) ^ (1 << 5)
    assert seq[4] == base ^ (1 << 3)
    assert len(seq) == len(set(seq)) == 8
    # full enumeration is the whole Hamming<=2 ball
    full = query_probe_sequence(margins, 6, 22, base)
    assert sorted(full) == sorted(
        base ^ m
        for m in [0]
        + [1 << i for i in range(6)]
        + [(1 << i) | (1 << j) for i in range(6) for j in range(i + 1, 6)]
    )
    # deterministic tie-break by mask value on equal costs
    tied = query_probe_sequence([5, 5, 5, 5, 5, 5], 6, 7, 0)
    assert tied == [0, 1, 2, 4, 8, 16, 32]
