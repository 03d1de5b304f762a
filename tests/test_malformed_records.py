"""Poison-row handling at the SOURCE layer: a 100 TB ingest always
contains malformed records, and the three Spark parse modes are the
contract — PERMISSIVE quarantines them into a corrupt-record column,
DROPMALFORMED silently drops, FAILFAST kills the job. Pin all three so
an ingest pipeline can choose its failure mode deliberately."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)


@pytest.fixture()
def jsonl_with_poison(tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"id": 1, "name": "ok-one"}\n'
        "{this is not json}\n"
        '{"id": 3, "name": "ok-three"}\n'
        '{"id": "not-a-number", "name": "bad-type"}\n'
    )
    return str(p)


_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("_corrupt_record", StringType()),
    ]
)


def test_permissive_quarantines_corrupt_rows(spark, jsonl_with_poison):
    df = (
        spark.read.schema(_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(jsonl_with_poison)
    )
    rows = df.collect()
    assert len(rows) == 4
    good = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert {r["id"] for r in good} == {1, 3}
    # both the syntax error and the type error are quarantined with
    # their raw text preserved for a dead-letter sink
    assert len(bad) == 2
    assert any("not json" in r["_corrupt_record"] for r in bad)
    assert any("not-a-number" in r["_corrupt_record"] for r in bad)
    # the dead-letter split: good rows onward, bad rows to quarantine.
    # Spark refuses a query that references ONLY the corrupt-record
    # column over a raw scan (column pruning would skip the very parse
    # that fills it) — cache the parsed result first, as the error
    # message itself instructs.
    cached = df.cache()
    try:
        quarantine = cached.filter(F.col("_corrupt_record").isNotNull())
        assert quarantine.count() == 2
    finally:
        cached.unpersist()


def test_dropmalformed_keeps_only_parseable(spark, jsonl_with_poison):
    df = (
        spark.read.schema(StructType(_SCHEMA.fields[:2]))
        .option("mode", "DROPMALFORMED")
        .json(jsonl_with_poison)
    )
    assert sorted(r["id"] for r in df.collect()) == [1, 3]


def test_failfast_raises_on_poison(spark, jsonl_with_poison):
    df = (
        spark.read.schema(StructType(_SCHEMA.fields[:2]))
        .option("mode", "FAILFAST")
        .json(jsonl_with_poison)
    )
    with pytest.raises(Exception, match="(?i)malformed|FAILFAST"):
        df.collect()


def test_csv_permissive_and_dropmalformed(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("id,qty\n1,10\n2,notanumber\n3,30\n")
    schema = "id long, qty long, _corrupt_record string"
    df = (
        spark.read.schema(schema)
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(str(p))
    )
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["qty"] == 10 and rows[1]["_corrupt_record"] is None
    assert rows[2]["qty"] is None and "notanumber" in rows[2]["_corrupt_record"]
    dropped = (
        spark.read.schema("id long, qty long")
        .option("header", True)
        .option("mode", "DROPMALFORMED")
        .csv(str(p))
    )
    assert sorted(r["id"] for r in dropped.collect()) == [1, 3]
