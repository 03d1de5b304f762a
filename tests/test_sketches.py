"""Misra-Gries heavy hitters: the retention guarantee under real
pruning pressure (a Zipf vocabulary much larger than k), candidate
bounds, and partition invariance — the evidence the documents-fixture
gate row (31-token vocabulary, sketch never prunes) cannot provide."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from candy_store_etl_spark.operators.sketches import (
    heavy_hitters_exact,
    misra_gries_candidates,
)


def _zipf_rows(n_items: int = 2000, total: int = 60_000):
    """Deterministic Zipf-ish stream: item i gets ~C/(i+1) rows, so a
    handful of items are heavy and the long tail dwarfs any k."""
    weights = [1.0 / (i + 1) for i in range(n_items)]
    scale = total / sum(weights)
    rows = []
    for i, w in enumerate(weights):
        rows.extend([f"item_{i:05d}"] * max(1, int(w * scale)))
    # deterministic interleave so heavy items are SPREAD, not clumped —
    # the adversarial arrival order for a pruning sketch
    rows.sort(key=lambda s: hash((s, len(rows))) % 7919)
    return rows


@pytest.fixture(scope="module")
def zipf_df(spark_sketch):
    rows = _zipf_rows()
    return (
        spark_sketch.createDataFrame([(r,) for r in rows], "tok string"),
        rows,
    )


@pytest.fixture(scope="module")
def spark_sketch(spark):
    return spark


K = 64
T = 50  # report items with count > n/50 (t <= k)


def test_candidates_bounded_and_superset(zipf_df):
    df, rows = zipf_df
    n = len(rows)
    df8 = df.repartition(8)
    cands = {
        r["tok"] for r in misra_gries_candidates(df8, "tok", K).collect()
    }
    assert len(cands) <= 8 * K  # ≤ k per partition
    # vocabulary (2000) is much larger than what survives — the sketch
    # actually pruned
    assert len(cands) < 2000
    # retention: every item above n/(K+1) must be a candidate
    from collections import Counter

    exact = Counter(rows)
    must_survive = {t for t, c in exact.items() if c > n / (K + 1)}
    assert must_survive, "fixture must contain genuinely heavy items"
    assert must_survive <= cands


def test_heavy_hitters_match_brute_force_and_partitioning(zipf_df):
    df, rows = zipf_df
    from collections import Counter

    n = len(rows)
    exact = Counter(rows)
    truth = {
        t: (c, c * 1_000_000 // n)
        for t, c in exact.items()
        if c * T > n
    }
    assert truth, "fixture must produce a non-empty heavy set"
    for parts in (3, 16):
        got = {
            r["tok"]: (r["cnt"], r["share_ppm"])
            for r in heavy_hitters_exact(
                df.repartition(parts), "tok", t=T, k=K
            ).collect()
        }
        assert got == truth, f"partitions={parts}"


def test_threshold_over_k_rejected(zipf_df):
    df, _ = zipf_df
    with pytest.raises(ValueError):
        heavy_hitters_exact(df, "tok", t=K + 1, k=K)


def test_non_string_keys_keep_native_dtype_and_exactness(spark_sketch):
    """Round-5 advisory: the candidate output must carry the SOURCE
    column's type — a hardcoded string output made the exact-verify
    join compare string-vs-int and could silently drop candidates.
    Zipf-ish int64 keys, k smaller than the vocabulary, verified
    against brute force."""
    rows = [(i,) for i in range(500) for _ in range(max(1, 2000 // (i + 1)))]
    df = spark_sketch.createDataFrame(rows, "uid long").repartition(8)

    cands = misra_gries_candidates(df, "uid", k=32)
    assert dict(cands.schema["uid"].jsonValue().items())["type"] == "long"

    got = {
        r["uid"]: r["cnt"]
        for r in heavy_hitters_exact(df, "uid", t=25, k=32).collect()
    }
    from collections import Counter

    exact = Counter(r[0] for r in rows)
    n = len(rows)
    want = {u: c for u, c in exact.items() if c * 25 > n}
    assert got == want and got  # non-empty and exactly the true set


def test_null_keys_excluded_and_big_int64_keys_survive(spark_sketch):
    """Round-6 review: null-bearing int64 batches coerce to float64 in
    pandas, corrupting keys above 2^53 and silently dropping them from
    the exact-verify join. Nulls are now filtered at the source (one
    universe for candidates AND the denominator), so keys far above
    2^53 must survive bit-exact alongside nulls."""
    big = (1 << 60) + 12345  # would corrupt through float64
    rows = [(big,)] * 500 + [(None,)] * 300 + [
        (i,) for i in range(200) for _ in range(3)
    ]
    df = spark_sketch.createDataFrame(rows, "uid long").repartition(6)
    got = {
        r["uid"]: (r["cnt"], r["share_ppm"])
        for r in heavy_hitters_exact(df, "uid", t=4, k=32).collect()
    }
    # universe excludes nulls: n = 500 + 600 = 1100; big has 500/1100
    assert got == {big: (500, 500 * 1_000_000 // 1100)}


def test_char_ngram_partial_counts_unicode_and_cap(spark_sketch):
    """The numpy trigram counter must agree with Python character
    slicing — including non-ASCII (code points are counted, not
    bytes) — and respect the start-position cap."""
    from collections import Counter

    from candy_store_etl_spark.operators.sketches import (
        char_ngram_partial_counts,
    )

    texts = [
        "hello world",
        "héllo wörld 你好吗 abc",
        "ab",  # shorter than n -> contributes nothing
        "aaaaaa",
        None,
        "x" * 50,  # cap binds: only first 10 start positions count
    ]
    cap = 10
    df = spark_sketch.createDataFrame(
        [(t,) for t in texts], "text string"
    ).repartition(3)
    got = Counter()
    for r in char_ngram_partial_counts(
        df, "text", n=3, max_pos=cap
    ).collect():
        got[r.ngram] += r.cnt
    want = Counter()
    for t in texts:
        if t is None:
            continue
        s = t[: cap + 2]
        for i in range(len(s) - 2):
            want[s[i : i + 3]] += 1
    assert got == want


def test_weighted_partials_equal_unweighted_heavy_hitters(
    spark_sketch, zipf_df
):
    """heavy_hitters_from_partials over pre-aggregated (tok, cnt)
    partials == heavy_hitters_exact over the raw occurrence stream —
    the equivalence the 16x direct trigram tier rests on."""
    from candy_store_etl_spark.operators.sketches import (
        heavy_hitters_from_partials,
    )

    df, _rows = zipf_df
    want = sorted(
        tuple(r) for r in heavy_hitters_exact(df, "tok", t=48, k=64).collect()
    )
    # partials: per-partition pre-counts (several partials per token)
    partials = (
        df.repartition(8)
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .drop("pid")
    )
    got = sorted(
        tuple(r)
        for r in heavy_hitters_from_partials(
            partials, "tok", "cnt", t=48, k=64
        ).collect()
    )
    assert got == want and got


def test_ngram_width_beyond_int64_packing_rejected(spark_sketch):
    """n >= 4 would overflow the 21-bit-per-codepoint int64 packing
    (silent collisions, garbage decodes) — must fail loudly instead."""
    from candy_store_etl_spark.operators.sketches import (
        char_ngram_partial_counts,
    )

    docs = spark_sketch.createDataFrame([("abcdef",)], "text string")
    with pytest.raises(ValueError, match="packable"):
        char_ngram_partial_counts(docs, "text", n=4)
    with pytest.raises(ValueError, match="packable"):
        char_ngram_partial_counts(docs, "text", n=0)
