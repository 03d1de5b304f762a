"""Round-9 surface: the engine-native bucketed write path
(df.write.format("table_log") + bucketBy/nBuckets) and the
streamed-CDC-warehouse co-located join fixture."""

from __future__ import annotations

import os

import pytest

import pyspark.sql.functions as F

from candy_store_etl_spark.operators import colocated as co
from candy_store_etl_spark.sources import table_log as tl
from candy_store_etl_spark.sources import table_log_source
from candy_store_etl_spark.streaming import cdc


def _facts(spark, n=400):
    return spark.createDataFrame(
        [(i, i * 3, float(i) / 2) for i in range(n)],
        "k long, a long, b double",
    )


def _dims(spark, n=400):
    return spark.createDataFrame(
        [(i, f"d{i}") for i in range(0, n + 100, 2)], "k long, d string"
    )


def test_native_write_layout_spec_and_roundtrip(spark, tmp_path):
    """One file per populated bucket, bucket id in the name, spec +
    schema in the commit; contents round-trip; the carrier column is
    NOT stored in the data."""
    d = str(tmp_path / "t")
    co.write_bucketed_native(_facts(spark), d, key_col="k", n_buckets=8)
    assert co.bucket_spec(d) == {"key": "k", "n": 8}
    schema = tl.snapshot_schema(d)
    assert [f.name for f in schema.fields] == ["k", "a", "b"]
    files = tl.snapshot_files(d)
    groups = [cdc._group_of_name(p) for p in files]
    assert len(groups) == len(set(groups))  # one file per bucket
    assert set(groups) <= set(range(8))
    got = sorted((r.k, r.a, r.b) for r in tl.read_snapshot(spark, d).collect())
    assert got == sorted((i, i * 3, float(i) / 2) for i in range(400))


def test_native_written_pair_joins_colocated(spark, tmp_path):
    """Both sides written through the engine writer plan and execute
    the SPJ exactly like library-written tables: identical results to
    the plain join, zero JVM parquet scans."""
    left, right = str(tmp_path / "l"), str(tmp_path / "r")
    co.write_bucketed_native(_facts(spark), left, key_col="k", n_buckets=8)
    co.write_bucketed_native(_dims(spark), right, key_col="k", n_buckets=8)
    j = co.colocated_bucket_join(spark, left, right)
    got = sorted((r.k, r.a, r.b, r.d) for r in j.collect())
    assert got == sorted(
        (i, i * 3, float(i) / 2, f"d{i}") for i in range(0, 400, 2)
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" not in plan and "FileScan" not in plan


def test_native_append_widens_groups_not_breaks_them(spark, tmp_path):
    """A matching-spec append adds files to existing groups; the
    planner reads file LISTS per group, so the join result stays
    exact over the widened layout."""
    left, right = str(tmp_path / "l"), str(tmp_path / "r")
    co.write_bucketed_native(
        _facts(spark, 200), left, key_col="k", n_buckets=8
    )
    extra = spark.createDataFrame(
        [(i, i * 3, float(i) / 2) for i in range(200, 400)],
        "k long, a long, b double",
    )
    co.write_bucketed_native(
        extra, left, key_col="k", n_buckets=8, mode="append"
    )
    co.write_bucketed_native(_dims(spark), right, key_col="k", n_buckets=8)
    assert tl.current_version(left) == 1
    j = co.colocated_bucket_join(spark, left, right)
    got = sorted((r.k, r.a, r.b, r.d) for r in j.collect())
    assert got == sorted(
        (i, i * 3, float(i) / 2, f"d{i}") for i in range(0, 400, 2)
    )


def test_native_append_mismatched_spec_refused(spark, tmp_path):
    d = str(tmp_path / "t")
    co.write_bucketed_native(_facts(spark), d, key_col="k", n_buckets=8)
    with pytest.raises(Exception, match="layouts must match"):
        co.write_bucketed_native(
            _facts(spark), d, key_col="k", n_buckets=4, mode="append"
        )


def test_native_write_without_carrier_column_refused(spark, tmp_path):
    """Writing with bucketBy but no engine-computed carrier column
    must fail loudly, pointing at the helper — a caller-supplied
    bucket id could disagree with the JVM hash silently."""
    table_log_source.register(spark)
    with pytest.raises(Exception, match="write_bucketed_native"):
        (
            _facts(spark)
            .write.format("table_log")
            .option("path", str(tmp_path / "t"))
            .option("bucketBy", "k")
            .option("nBuckets", "8")
            .mode("overwrite")
            .save()
        )


def test_native_write_out_of_range_bucket_refused(spark, tmp_path):
    table_log_source.register(spark)
    bad = _facts(spark).withColumn(
        table_log_source.BUCKET_COL, F.lit(99).cast("int")
    )
    with pytest.raises(Exception, match="outside"):
        (
            bad.write.format("table_log")
            .option("path", str(tmp_path / "t"))
            .option("bucketBy", "k")
            .option("nBuckets", "8")
            .mode("overwrite")
            .save()
        )


def test_plain_overwrite_resets_committed_spec(spark, tmp_path):
    """An overwrite that carries no spec replaced the layout: the old
    spec must NOT survive it (a stale spec would mis-plan joins and
    point lookups over non-bucketed files)."""
    d = str(tmp_path / "t")
    co.write_bucketed_native(_facts(spark), d, key_col="k", n_buckets=8)
    assert co.bucket_spec(d) is not None
    tl.overwrite(_facts(spark), d)
    assert co.bucket_spec(d) is None
    # and a fresh bucketed overwrite re-establishes it
    co.write_bucketed_native(_facts(spark), d, key_col="k", n_buckets=4)
    assert co.bucket_spec(d) == {"key": "k", "n": 4}


def test_cdc_warehouse_fixture_shape(spark, sf_smoke):
    """The streamed fixture really is micro-batched: exactly
    _FEED_FILES data-carrying merge commits, sink-published spec +
    schema, and an idempotent rebuild (intact -> no-op)."""
    from candy_store_etl_spark.plans.round9 import (
        _CDC_BUCKETS,
        _FEED_FILES,
        _ensure_cdc_warehouse,
    )

    root = _ensure_cdc_warehouse(spark, sf_smoke)
    wh = os.path.join(root, "warehouse")
    data_batches = [
        e
        for e in tl.log_entries(wh)
        if e["op"].startswith("cdc-batch-") and e["add"]
    ]
    assert len(data_batches) == _FEED_FILES
    assert co.bucket_spec(wh) == {"key": "user_id", "n": _CDC_BUCKETS}
    assert tl.snapshot_schema(wh) is not None
    mtimes = {p: os.path.getmtime(p) for p in tl.snapshot_files(wh)}
    _ensure_cdc_warehouse(spark, sf_smoke)  # intact -> untouched
    assert mtimes == {p: os.path.getmtime(p) for p in tl.snapshot_files(wh)}
