"""Unit/property tests for the round-4 surface (beyond the oracle
gate): builtin-equivalence, tiling invariants, maximality, and
acceptance-rate properties."""

from __future__ import annotations

from pyspark.sql import functions as F

from candy_store_etl_spark.plans.registry import QUERIES, _ensure_loaded
from candy_store_etl_spark.sources.tpch import load_table

_ensure_loaded()


def test_regression_matches_regr_builtins(spark, sf_correctness):
    """The integer-exact OLS must agree with Spark's regr_slope /
    regr_intercept / regr_r2 (double accumulators) to float tolerance —
    same math, different determinism discipline."""
    exact = {
        r["event_type"]: r
        for r in QUERIES["daily_value_regression"].fn(spark, sf_correctness).collect()
    }
    ev = load_table(spark, sf_correctness, "events")
    daily = (
        ev.select(
            "event_type",
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01"))
            .cast("double")
            .alias("x"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c"),
        )
        .groupBy("event_type", "x")
        .agg(F.sum("c").cast("double").alias("y"))
    )
    builtin = {
        r["event_type"]: r
        for r in daily.groupBy("event_type")
        .agg(
            F.regr_slope("y", "x").alias("slope"),
            F.regr_intercept("y", "x").alias("intercept"),
            F.regr_r2("y", "x").alias("r2"),
        )
        .collect()
    }
    assert set(exact) == set(builtin)
    for t, e in exact.items():
        b = builtin[t]
        assert abs(e["slope_cents_per_day"] - b["slope"]) <= 1e-6 * max(
            1.0, abs(b["slope"])
        ), t
        assert abs(e["intercept_cents"] - b["intercept"]) <= 1e-6 * max(
            1.0, abs(b["intercept"])
        ), t
        assert abs(e["r2"] - b["r2"]) <= 1e-9, t


def test_patch_grid_tiles_exactly(spark, sf_correctness):
    """Patches must tile each decoded image exactly: per media,
    sum(pw*ph) == width*height, no overlaps (patch_id dense 0..n-1)."""
    from candy_store_etl_spark.operators.multimodal import (
        attach_media_column,
        decode_media,
    )

    grid = QUERIES["multimodal_patch_grid"].fn(spark, sf_correctness)
    per_media = grid.groupBy("media_id").agg(
        F.sum(F.col("pw") * F.col("ph")).alias("area"),
        F.count(F.lit(1)).alias("n_patches"),
        F.countDistinct("patch_id").alias("n_ids"),
        (F.max("patch_id") + 1).alias("max_id1"),
    )
    docs = load_table(spark, sf_correctness, "documents")
    dims = decode_media(
        attach_media_column(docs, "doc_id", "text", mime="image/fake")
    ).select("media_id", (F.col("width") * F.col("height")).alias("wh"))
    joined = per_media.join(dims, "media_id")
    bad = joined.filter(
        (F.col("area") != F.col("wh"))
        | (F.col("n_ids") != F.col("n_patches"))
        | (F.col("max_id1") != F.col("n_patches"))
    )
    assert bad.count() == 0, bad.limit(5).collect()


def test_int8_codes_in_range_and_extremes(spark, sf_correctness):
    """Quantization codes live in [0, 255]; every dimension's min maps
    to 0 and (for non-degenerate dims) its max to 255. A Python replay
    of the formula over the raw vectors must reproduce Spark's emitted
    codes exactly — this equality is what entitles the hypothesis
    property tests below to validate the formula in pure Python."""
    import math

    out = QUERIES["embedding_quantize_int8"].fn(spark, sf_correctness)
    codes = out.select(
        F.explode(F.split("codes_csv", ",")).alias("s")
    ).select(F.col("s").cast("int").alias("code"))
    r = codes.agg(F.min("code"), F.max("code")).first()
    assert r[0] == 0 and r[1] == 255, r

    emb = {
        row["vec_id"]: row["embedding"]
        for row in load_table(spark, sf_correctness, "embeddings").collect()
    }
    micro = {
        vid: [int(math.floor(float(x) * 1e6 + 0.5)) for x in v]
        for vid, v in emb.items()
    }
    dims = len(next(iter(micro.values())))
    mn = [min(m[d] for m in micro.values()) for d in range(dims)]
    mx = [max(m[d] for m in micro.values()) for d in range(dims)]
    spark_codes = {
        row["vec_id"]: [int(x) for x in row["codes_csv"].split(",")]
        for row in out.collect()
    }
    for vid, m in micro.items():
        replay = [
            0
            if mx[d] == mn[d]
            else int(math.floor(float((m[d] - mn[d]) * 255) / (mx[d] - mn[d])))
            for d in range(dims)
        ]
        assert replay == spark_codes[vid], vid


def test_token_budget_selection_is_maximal(spark, sf_correctness):
    """The head selection must exhaust the budget: adding the next
    document in the quality order would overshoot it."""
    sel = QUERIES["token_budget_head_selection"].fn(spark, sf_correctness)
    rows = sel.collect()
    total = max(r["cum_toks"] for r in rows)
    assert total <= 20000
    docs = load_table(spark, sf_correctness, "documents")
    kept = {r["doc_id"] for r in rows}
    from candy_store_etl_spark.functions.text import tokens

    ordered = (
        docs.select(
            "doc_id", "n_chars", F.size(tokens(F.col("text"))).alias("n_toks")
        )
        .orderBy(F.col("n_chars").desc(), "doc_id")
        .collect()
    )
    first_dropped = next(r for r in ordered if r["doc_id"] not in kept)
    assert total + first_dropped["n_toks"] > 20000


def test_importance_sampling_rates_track_weights(spark, sf_correctness):
    """Per-source acceptance must track the deterministic keep_pct
    within binomial noise (3 sigma)."""
    out = QUERIES["importance_sampled_docs"].fn(spark, sf_correctness)
    docs = load_table(spark, sf_correctness, "documents")
    totals = {r["source"]: r["cnt"] for r in
              docs.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    kept = {r["source"]: (r["cnt"], r["pct"]) for r in
            out.groupBy("source").agg(
                F.count("*").alias("cnt"), F.first("keep_pct").alias("pct")
            ).collect()}
    for src, (k, pct) in kept.items():
        n = totals[src]
        p = pct / 100.0
        sigma = (n * p * (1 - p)) ** 0.5
        assert abs(k - n * p) <= 3 * sigma + 3, (src, k, n, pct)


def test_interpolation_known_days_pass_through(spark, sf_correctness):
    """Known (unmasked) days must carry the exact daily cents; every
    interpolated day must lie within [prev, next] known values."""
    out = QUERIES["interpolate_daily_gaps"].fn(spark, sf_correctness).collect()
    by_day = sorted(out, key=lambda r: r["d"])
    known = [(i, r) for i, r in enumerate(by_day) if r["is_known"]]
    assert known and len(known) < len(by_day)  # fixture has real gaps
    import math

    for i, r in enumerate(by_day):
        if r["is_known"]:
            continue
        prev = [(j, kr) for j, kr in known if j < i]
        nxt = [(j, kr) for j, kr in known if j > i]
        if prev and nxt:
            pj, pr = prev[-1]
            nj, nr = nxt[0]
            lo, hi = sorted((pr["interp_cents"], nr["interp_cents"]))
            assert lo <= r["interp_cents"] <= hi, r
            # Python replay of the registered formula must equal
            # Spark's fill exactly — ties the hypothesis property
            # tests' local re-implementation to the real query
            pc, nc = pr["interp_cents"], nr["interp_cents"]
            replay = pc + int(
                math.floor(float((nc - pc) * (i - pj)) / (nj - pj))
            )
            assert replay == r["interp_cents"], (r, replay)


# ---------------------------------------------------------------------------
# Property-based invariants (hypothesis) for the round-4 primitives —
# the algebra must hold for ARBITRARY inputs, not just the fixtures.
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(10**6), max_value=10**6),
        min_size=2,
        max_size=64,
    )
)
def test_int8_quantize_roundtrip_error_bound(micro):
    """The int8 code algebra (floor(255*(x-mn)/(mx-mn))) must always
    produce codes in [0, 255] with reconstruction error <= one
    quantization step. Pure-Python replay of the formula; its equality
    with the Spark expression is pinned on real data by
    test_int8_codes_in_range_and_extremes above."""
    mn, mx = min(micro), max(micro)
    for x in micro:
        if mx == mn:
            code = 0
        else:
            import math

            code = int(math.floor(float((x - mn) * 255) / (mx - mn)))
        assert 0 <= code <= 255
        if mx != mn:
            recon = mn + code * (mx - mn) / 255.0
            assert abs(recon - x) <= (mx - mn) / 255.0 + 1e-9


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**4),  # day index
            st.integers(min_value=-(10**8), max_value=10**8),  # cents
        ),
        min_size=2,
        max_size=40,
        unique_by=lambda t: t[0],
    )
)
def test_interpolation_formula_is_bounded_and_exact_at_knowns(points):
    """prev + floor((next-prev)*(d-pd)/(nd-pd)) must land within
    [min(prev,next), max(prev,next)] for every gap day and reproduce
    the known value at both endpoints. Pure-Python replay; equality
    with the Spark expression is pinned on real data by
    test_interpolation_known_days_pass_through above."""
    import math

    pts = sorted(points)
    for (pd_, pc), (nd, nc) in zip(pts, pts[1:]):
        for d in range(pd_, nd + 1):
            interp = pc + int(
                math.floor(float((nc - pc) * (d - pd_)) / (nd - pd_))
            )
            lo, hi = sorted((pc, nc))
            assert lo <= interp <= hi
            if d == pd_:
                assert interp == pc
            if d == nd:
                assert interp == nc


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**6),  # doc quality key
            st.integers(min_value=0, max_value=500),  # n_toks
        ),
        min_size=1,
        max_size=100,
    ),
    st.integers(min_value=0, max_value=5000),  # budget
)
def test_token_budget_prefix_is_maximal_and_ordered(docs, budget):
    """The head-selection invariant for arbitrary corpora: the kept
    set is exactly the longest prefix of the quality order whose token
    sum fits the budget."""
    ordered = sorted(enumerate(docs), key=lambda t: (-t[1][0], t[0]))
    cum, kept = 0, []
    for idx, (_, toks) in ordered:
        cum += toks
        if cum <= budget:
            kept.append(idx)
        else:
            break
    total = sum(docs[i][1] for i in kept)
    assert total <= budget
    if len(kept) < len(docs):
        nxt = ordered[len(kept)][0]
        assert total + docs[nxt][1] > budget


def test_events_props_k_is_integral(spark, sf_correctness):
    """variant_props_extract TRY-casts k on BOTH engines, so the only
    residual cross-engine divergence is a non-integral numeric k
    (Spark truncates the variant double, DuckDB rounds the extracted
    string). Pin the fixture shape the way the 4096-char caps are
    pinned: every present props.k is an integral JSON number."""
    ev = load_table(spark, sf_correctness, "events")
    k = F.get_json_object("props", "$.k")
    bad = ev.filter(k.isNotNull() & k.rlike(r"[^0-9-]")).count()
    assert bad == 0


def test_degree_orientation_bounds_hub_wedges(spark):
    """The triangle count's at-scale claim, executed: on a hub graph
    (one high-degree vertex with the LOWEST id — the adversarial case
    for id-orientation) the degree orientation turns the hub into a
    destination everywhere, so the max per-pivot wedge count collapses
    from C(deg_hub, 2) to 1, while the triangle count itself is
    orientation-invariant."""
    from candy_store_etl_spark.operators.graph import (
        orient_by_degree,
        triangle_count_oriented,
    )

    hub_edges = [(0, i) for i in range(1, 41)]
    chain_edges = [(i, i + 1) for i in range(1, 40, 2)]
    df = spark.createDataFrame(
        hub_edges + chain_edges, "src long, dst long"
    )

    def max_wedges(oriented):
        out = oriented.groupBy("src").agg(F.count(F.lit(1)).alias("k"))
        row = out.agg(
            F.max(F.expr("k * (k - 1) div 2")).alias("w"),
            F.max("k").alias("d"),
        ).first()
        return row["w"], row["d"]

    # raw id orientation: hub (id 0) is the source of all 40 edges
    id_oriented = df.select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    ).distinct()
    id_w, id_d = max_wedges(id_oriented)
    assert id_w == 780 and id_d == 40  # C(40, 2) wedges pivot the hub

    deg_oriented = orient_by_degree(df)
    deg_w, deg_d = max_wedges(deg_oriented)
    assert deg_d <= 2 and deg_w <= 1  # every pivot is a degree-2 leaf

    # triangles {0, i, i+1} for each chain edge — 20, either orientation
    n = triangle_count_oriented(deg_oriented).first()["n_triangles"]
    assert n == 20


def test_pruned_scan_scratch_self_heals_after_corruption(
    spark, sf_correctness
):
    """A /tmp cleaner removing one part file from the range-layout
    scratch must trigger a rebuild on the next call — the
    stage-then-swap path replaces a corrupt survivor instead of
    failing forever (round-5 review finding)."""
    import glob
    import os
    import tempfile

    fn = QUERIES["pruned_range_scan_stats"].fn
    before = fn(spark, sf_correctness).collect()
    dirs = sorted(
        glob.glob(os.path.join(tempfile.gettempdir(), "csetl_file_index_*")),
        key=os.path.getmtime,
    )
    assert dirs, "query must have created a scratch layout"
    parts = glob.glob(os.path.join(dirs[-1], "part-*.parquet"))
    os.remove(parts[0])  # simulate the cleaner
    after = fn(spark, sf_correctness).collect()
    assert after == before
