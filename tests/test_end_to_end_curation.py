"""End-to-end training-data pipeline: quality-filter -> exact dedup ->
split assignment -> token-window chunking -> sharded JSONL export.

Each stage is an already-tested operator; this test pins their
COMPOSITION — the schemas line up, counts are conserved where they
must be and shrink where they should, and the export read-back agrees
with the final relation. This is the workload the engine exists for,
run as one lazily-planned chain (no intermediate actions until the
stage-count assertions force them).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from candy_store_etl_spark.functions.text import distinct_ratio, tokens
from candy_store_etl_spark.operators.dedup import exact_dedup
from candy_store_etl_spark.sources.sinks import write_jsonl
from candy_store_etl_spark.sources.tpch import load_table


def test_curate_chunk_export_pipeline(spark, sf_correctness, tmp_path):
    docs = load_table(spark, sf_correctness, "documents")
    n_raw = docs.count()

    # 1. quality gate: lexical diversity (same feature the registered
    #    doc_quality query scores)
    staged = docs.select("doc_id", "text", tokens(F.col("text")).alias("toks"))
    kept = staged.filter(distinct_ratio(F.col("toks")) >= 0.5)
    n_kept = kept.count()
    assert 0 < n_kept <= n_raw

    # 2. exact dedup: survivors only
    survivors = exact_dedup(kept, "doc_id", "text").select(
        F.col("keep_id").alias("doc_id")
    )
    deduped = kept.join(survivors, "doc_id")
    n_dedup = deduped.count()
    assert 0 < n_dedup <= n_kept

    # 3. stable split assignment (md5-derived, no RNG)
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10)
        .cast("long")
        % 100
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    labeled = deduped.select("doc_id", "toks", split.alias("split"))
    by_split = {r.split: r.n for r in labeled.groupBy("split").agg(
        F.count("*").alias("n")).collect()}
    assert sum(by_split.values()) == n_dedup
    assert by_split.get("train", 0) > by_split.get("test", 0)

    # 4. chunking (32-token windows, 8 overlap — prep.doc_chunks params)
    stride, chunk_len = 24, 32
    n_chunks_col = F.greatest(
        F.lit(1), F.ceil((F.size("toks") - 8) * 1.0 / stride).cast("int")
    )
    chunked = labeled.select(
        "doc_id",
        "split",
        F.explode(F.sequence(F.lit(0), n_chunks_col - 1)).alias("chunk_idx"),
        "toks",
    ).select(
        "doc_id",
        "split",
        "chunk_idx",
        F.concat_ws(
            " ", F.slice("toks", F.col("chunk_idx") * stride + 1, chunk_len)
        ).alias("chunk_text"),
    )
    n_chunks = chunked.count()
    assert n_chunks >= n_dedup  # every doc yields at least one chunk

    # 5. export: gzip JSONL sharded by split
    out = str(tmp_path / "corpus")
    write_jsonl(chunked, out, partition_by=["split"])
    dirs = {d for d in os.listdir(out) if d.startswith("split=")}
    assert dirs == {f"split={s}" for s in by_split}
    back = spark.read.json(out)
    assert back.count() == n_chunks
    # spot-check content fidelity through the gzip JSONL round trip
    a = {(r.doc_id, r.chunk_idx, r.chunk_text) for r in chunked.collect()}
    b = {(r.doc_id, r.chunk_idx, r.chunk_text) for r in back.collect()}
    assert a == b
