"""Round-10 surface: the five round-8-ADVICE hardenings of the
bucketed-layout planner — version-pinned plans, checkpoint-bounded
layout resolution, key-type validation, empty-result serving lookups,
and loud failure on untyped probe hashing."""

from __future__ import annotations

import os

import pytest

from candy_store_etl_spark.operators import colocated as co
from candy_store_etl_spark.sources import table_log as tl


def _facts(spark, n=200, offset=0):
    return spark.createDataFrame(
        [(i + offset, i * 3) for i in range(n)], "k long, a long"
    )


def _dims(spark, n=200):
    return spark.createDataFrame(
        [(i, f"d{i}") for i in range(0, n, 2)], "k long, d string"
    )


def test_key_type_mismatch_refused(spark, tmp_path):
    """Same bucket count, different key TYPES: xxhash64 is
    type-sensitive, so equal key values hash to different buckets and
    the join would be silently incomplete — the planner must refuse,
    not return partial results."""
    left, right = str(tmp_path / "l"), str(tmp_path / "r")
    co.write_bucketed(_facts(spark), left, key_col="k", n_buckets=4)
    dims_int = spark.createDataFrame(
        [(i, f"d{i}") for i in range(0, 200, 2)], "k int, d string"
    )
    co.write_bucketed(dims_int, right, key_col="k", n_buckets=4)
    with pytest.raises(ValueError, match="key types differ"):
        co.colocated_plan(left, right)
    with pytest.raises(ValueError, match="key types differ"):
        co.colocated_bucket_join(spark, left, right)
    with pytest.raises(ValueError, match="key types differ"):
        co.colocated_multi_join(spark, [left, right])


def test_keyset_lookup_all_miss_returns_empty(spark, tmp_path):
    """Probing only keys that hash into empty buckets is a legitimate
    all-miss for a serving lookup: an EMPTY result under the committed
    schema, not an exception the caller must catch."""
    d = str(tmp_path / "t")
    # two populated keys out of 64 buckets: most buckets are empty
    co.write_bucketed(
        spark.createDataFrame([(1, 10), (2, 20)], "k long, a long"),
        d,
        key_col="k",
        n_buckets=64,
    )
    populated = set(co.buckets_of_values(spark, d, [1, 2]))
    # find probe keys landing in EMPTY buckets
    probes = [
        v
        for v, b in zip(
            range(100, 400), co.buckets_of_values(spark, d, list(range(100, 400)))
        )
        if b not in populated
    ][:5]
    assert probes, "fixture needs at least one empty-bucket probe"
    got = co.keyset_lookup(spark, d, probes)
    assert got.count() == 0
    assert [f.name for f in got.schema.fields] == ["k", "a"]
    miss = co.point_lookup(spark, d, probes)
    assert miss.count() == 0
    assert [f.name for f in miss.schema.fields] == ["k", "a", "probe_files"]


def test_buckets_of_values_without_schema_raises(spark, tmp_path):
    """A bucket spec with NO committed schema means the stored key
    type is unknown; the old 'bigint' guess made a string-keyed probe
    hash xxhash64(null) — a deterministic silent miss. Loud failure
    instead."""
    d = str(tmp_path / "t")
    (tmp_path / "t").mkdir()
    tl.commit(d, add=[], op="raw", meta={"bucket": {"key": "k", "n": 4}})
    with pytest.raises(ValueError, match="no committed schema"):
        co.buckets_of_values(spark, d, ["x"])


def test_layout_resolution_is_checkpoint_bounded(spark, tmp_path, monkeypatch):
    """After many spec-less commits (the CDC-warehouse shape: the one
    spec-carrying commit followed by thousands of cdc-batch commits),
    resolving the spec / grouping / batch ledger must stop at the
    newest checkpoint — not replay the log from version zero on every
    plan."""
    d = str(tmp_path / "t")
    co.write_bucketed(_facts(spark, 50), d, key_col="k", n_buckets=4)
    # 12 spec-less bucket-named commits -> auto-checkpoint rides v10
    for i in range(12):
        tl.commit(d, add=[], op=f"cdc-batch-{i}")
    ckpt = tl._read_checkpoint_if_any(d, 10)
    assert ckpt is not None
    assert ckpt["bucket_spec"] == {"key": "k", "n": 4}
    assert ckpt["buckets_per_file"] == 1
    assert ckpt["applied_batches"] == list(range(10))

    reads = []
    orig = tl._read_entry
    monkeypatch.setattr(
        tl, "_read_entry", lambda td, v: (reads.append(v), orig(td, v))[1]
    )
    assert tl.committed_bucket_spec(d) == {"key": "k", "n": 4}
    assert tl.layout_buckets_per_file(d) == 1
    assert tl.applied_batch_ids(d) == set(range(12))
    # every walk stopped at the v10 checkpoint: only the tail (v11,
    # v12) is ever read, never versions 0..9
    assert reads and min(reads) >= 11


def test_colocated_plan_version_pinned(spark, tmp_path):
    """left_version pins the plan's spec, grouping, AND file list to
    one snapshot: a plan at version 0 never sees files a later append
    committed — the mid-plan-commit race the unpinned reads had."""
    left, right = str(tmp_path / "l"), str(tmp_path / "r")
    co.write_bucketed(_facts(spark, 100), left, key_col="k", n_buckets=4)
    co.write_bucketed(_dims(spark, 100), right, key_col="k", n_buckets=4)
    v0_files = {f for _, lf, _ in co.colocated_plan(left, right) for f in lf}
    co.write_bucketed(
        _facts(spark, 100, offset=100),
        left,
        key_col="k",
        n_buckets=4,
        mode="append",
    )
    pinned = {
        f
        for _, lf, _ in co.colocated_plan(left, right, left_version=0)
        for f in lf
    }
    assert pinned == v0_files
    unpinned = {
        f for _, lf, _ in co.colocated_plan(left, right) for f in lf
    }
    assert unpinned > v0_files


def test_serve_routes_by_layout_and_file_count(spark, tmp_path):
    """The front door picks the measured winner per regime: pushdown
    scan for unbucketed tables and below the file-count crossover,
    keyset above it — and every route returns the same rows."""
    import candy_store_etl_spark.operators.colocated as co2

    wide, small, plain = (
        str(tmp_path / "wide"),
        str(tmp_path / "small"),
        str(tmp_path / "plain"),
    )
    df = _facts(spark, 500)
    co2.write_bucketed(df, wide, key_col="k", n_buckets=128)
    co2.write_bucketed(df, small, key_col="k", n_buckets=8)
    tl.append(df, plain)
    keys = [1, 7, 250, 499, 9999]
    expect = sorted((r.k, r.a) for r in df.filter(df.k.isin(keys)).collect())
    for d, kw, route, pruned in (
        (wide, {}, "keyset", True),
        (small, {}, "scan-small-table", False),
        (plain, {"key_col": "k"}, "scan-unbucketed", False),
    ):
        hit, info = co2.serve(spark, d, keys, **kw)
        assert info["route"] == route, (d, info)
        assert (info["files_scanned"] < info["files_total"]) == pruned
        assert sorted((r.k, r.a) for r in hit.collect()) == expect


def test_serve_off_key_probe_falls_back_to_scan(spark, tmp_path):
    """Probing a column that is NOT the bucket key: the layout cannot
    prune, so the router must not pretend it can."""
    d = str(tmp_path / "t")
    co.write_bucketed(_facts(spark, 100), d, key_col="k", n_buckets=128)
    hit, info = co.serve(spark, d, [3, 30], key_col="a")
    assert info["route"] == "scan-off-key"
    assert sorted(r.k for r in hit.collect()) == [1, 10]


def test_serve_large_probe_uses_semi_join_and_matches(spark, tmp_path):
    """Above the 64-key literal limit the probe rides the broadcast
    semi-join residual on both the scan and keyset routes."""
    d = str(tmp_path / "t")
    df = _facts(spark, 400)
    co.write_bucketed(df, d, key_col="k", n_buckets=128)
    keys = list(range(0, 400, 3))  # 134 probes
    hit, info = co.serve(spark, d, keys)
    assert info["route"] == "keyset"
    assert sorted(r.k for r in hit.collect()) == sorted(
        set(keys) & set(range(400))
    )


def test_colocated_aggregate_join_matches_plain_plan(spark, tmp_path):
    """The fused rollup+join equals groupBy().agg().join() for inner
    and left, including left keys with no dim row (null-filled)."""
    left, right = str(tmp_path / "l"), str(tmp_path / "r")
    facts = spark.createDataFrame(
        [(i % 50, i, float(i) / 4) for i in range(600)],
        "k long, v long, x double",
    )
    dims = _dims(spark, 100)  # even keys only: odd keys unmatched
    co.write_bucketed(facts, left, key_col="k", n_buckets=8)
    co.write_bucketed(dims, right, key_col="k", n_buckets=8)
    import pyspark.sql.functions as F

    want_base = facts.groupBy("k").agg(
        F.sum("v").alias("sv"),
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
    )
    aggs = [("v", "sum", "sv"), ("k", "count", "n"), ("x", "sum", "sx")]
    for how in ("inner", "left"):
        got = co.colocated_aggregate_join(spark, left, right, aggs, how=how)
        want = want_base.join(dims, "k", how)
        gr = sorted(
            (r.k, r.sv, r.n, round(r.sx, 6), r.d) for r in got.collect()
        )
        wr = sorted(
            (r.k, r.sv, r.n, round(r.sx, 6), r.d) for r in want.collect()
        )
        assert gr == wr, how


def test_colocated_aggregate_join_refuses_name_overlap(spark, tmp_path):
    left, right = str(tmp_path / "l"), str(tmp_path / "r")
    co.write_bucketed(_facts(spark, 50), left, key_col="k", n_buckets=4)
    co.write_bucketed(
        spark.createDataFrame([(0, 5)], "k long, sv long"),
        right,
        key_col="k",
        n_buckets=4,
    )
    with pytest.raises(ValueError, match="overlap"):
        co.colocated_aggregate_join(
            spark, left, right, [("a", "sum", "sv")]
        )


def test_bpf_resets_on_layout_replacing_commits(spark, tmp_path):
    """A cdc-compact-bpf{n} grouping must not survive a commit that
    REPLACED every file (overwrite / bucketed-write): a stale grouping
    makes every lookup probe group=bucket//n against per-bucket file
    names — a silent serving miss."""
    d = str(tmp_path / "t")
    df = _facts(spark, 300)
    co.write_bucketed(df, d, key_col="k", n_buckets=16)
    from candy_store_etl_spark.streaming.cdc import compact_warehouse

    compact_warehouse(spark, d, key_col="k", n_buckets=16, buckets_per_file=8)
    assert tl.layout_buckets_per_file(d) == 8
    # rebuild one-file-per-bucket: grouping must reset with the layout
    co.write_bucketed(df, d, key_col="k", n_buckets=16)
    assert tl.layout_buckets_per_file(d) == 1
    hit = co.keyset_lookup(spark, d, [5, 17])
    assert sorted(r.k for r in hit.collect()) == [5, 17]
    # and the fold into later checkpoints carries the RESET value
    for i in range(11):
        tl.commit(d, add=[], op=f"cdc-batch-{i}")
    ckpt_v = max(
        int(v)
        for v in [10]
        if tl._read_checkpoint_if_any(d, v) is not None
    )
    assert tl._read_checkpoint_if_any(d, ckpt_v)["buckets_per_file"] == 1


def test_bucketed_append_onto_coarsened_layout(spark, tmp_path):
    """The LIBRARY append is group-aware: on a compaction-coarsened
    table it names new files by GROUP id (the CDC sink's rule), so
    maintenance never turns appends away and lookups/joins keep
    routing correctly. The NATIVE writer (whose carrier column is
    per-bucket) refuses instead of mis-routing."""
    d = str(tmp_path / "t")
    df = _facts(spark, 200)
    co.write_bucketed(df, d, key_col="k", n_buckets=8)
    from candy_store_etl_spark.streaming.cdc import compact_warehouse

    compact_warehouse(spark, d, key_col="k", n_buckets=8, buckets_per_file=4)
    co.write_bucketed(
        _facts(spark, 50, offset=500), d, key_col="k",
        n_buckets=8, mode="append",
    )
    assert tl.layout_buckets_per_file(d) == 4
    # every file (old coarse + new appended) is named by GROUP id
    from candy_store_etl_spark.streaming.cdc import _group_of_name

    assert all(
        _group_of_name(p) < 2 for p in tl.snapshot_files(d)
    )  # 8 buckets / 4 per file = groups {0, 1}
    # appended keys serve correctly through the grouped lookups
    got = co.keyset_lookup(spark, d, [3, 505, 549])
    assert sorted(r.k for r in got.collect()) == [3, 505, 549]
    hit = co.point_lookup(spark, d, [510])
    assert [r.k for r in hit.collect()] == [510]
    with pytest.raises(Exception, match="coarsened"):
        co.write_bucketed_native(
            _facts(spark, 10, offset=900), d, key_col="k",
            n_buckets=8, mode="append",
        )


def test_serve_empty_snapshot_returns_empty(spark, tmp_path):
    """An empty snapshot is a legitimate all-miss: serve() returns an
    empty schema-true result, not an exception (the same contract the
    lookups carry)."""
    d = str(tmp_path / "t")
    df = _facts(spark, 20)
    tl.append(df, d)
    old = [os.path.basename(p) for p in tl.snapshot_files(d)]
    tl.commit(d, add=[], remove=old, op="truncate")
    hit, info = co.serve(spark, d, [1, 2], key_col="k")
    assert hit.count() == 0
    assert [f.name for f in hit.schema.fields] == ["k", "a"]
    assert info["files_scanned"] == 0 and info["files_total"] == 0


def test_serve_aggregate_routes_and_matches(spark, tmp_path):
    """Grouping BY the bucket key routes exchange-free; off-key (or
    unbucketed) routes to the shuffle aggregate — identical values
    either way (the vocabulary is route-invariant)."""
    d = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i % 20, i, float(i) / 8) for i in range(400)],
        "k long, v long, x double",
    )
    co.write_bucketed(df, d, key_col="k", n_buckets=8)
    import pyspark.sql.functions as F

    aggs = [("v", "sum", "sv"), ("v", "count", "n"), ("x", "mean", "mx")]
    want = sorted(
        (r.k, r.sv, r.n, round(r.mx, 9))
        for r in df.groupBy("k")
        .agg(
            F.sum("v").alias("sv"),
            F.count("v").alias("n"),
            F.avg("x").alias("mx"),
        )
        .collect()
    )
    got, info = co.serve_aggregate(spark, d, "k", aggs)
    assert info["route"] == "bucketed-local"
    assert sorted((r.k, r.sv, r.n, round(r.mx, 9)) for r in got.collect()) == want
    # off-key grouping on the same table: shuffle route, same shape
    got2, info2 = co.serve_aggregate(
        spark, d, "v", [("x", "sum", "sx")]
    )
    assert info2["route"] == "shuffle-agg"
    assert got2.count() == 400
    with pytest.raises(ValueError, match="route-invariant"):
        co.serve_aggregate(spark, d, "k", [("x", "stddev", "s")])


def test_serve_aggregate_empty_snapshot(spark, tmp_path):
    d = str(tmp_path / "t")
    df = _facts(spark, 10)
    tl.append(df, d)
    old = [os.path.basename(p) for p in tl.snapshot_files(d)]
    tl.commit(d, add=[], remove=old, op="truncate")
    got, info = co.serve_aggregate(spark, d, "k", [("a", "sum", "sa")])
    assert info["route"] == "shuffle-agg"
    assert got.count() == 0
    assert [f.name for f in got.schema.fields] == ["k", "sa"]
