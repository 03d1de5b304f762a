"""The constraint checks must CATCH planted violations — an audit that
only ever sees clean data proves nothing about its own sensitivity."""

from __future__ import annotations

from candy_store_etl_spark.quality import (
    check_accepted_values,
    check_expression,
    check_foreign_key,
    check_not_null,
    check_unique,
)


def test_unique_catches_duplicates(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, "c"), (3, "d"), (3, "e")], "k long, v string"
    )
    bad = check_unique(df, ["k"]).collect()
    assert {(r.k, r.n_rows) for r in bad} == {(2, 2), (3, 2)}


def test_not_null_catches_any_null_column(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.0), (None, "b", 2.0), (3, None, 3.0), (4, "d", None)],
        "k long, v string, w double",
    )
    assert {r.k for r in check_not_null(df, ["k", "v"]).collect()} == {None, 3}
    assert len(check_not_null(df, ["w"]).collect()) == 1


def test_foreign_key_catches_orphans(spark):
    child = spark.createDataFrame([(1, 10), (2, 20), (3, 99)], "id long, fk long")
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    orphans = check_foreign_key(child, "fk", parent, "pk").collect()
    assert [r.id for r in orphans] == [3]


def test_accepted_values_catches_unknown_and_null(spark):
    df = spark.createDataFrame(
        [(1, "view"), (2, "bogus"), (3, None)], "id long, t string"
    )
    bad = {r.id for r in check_accepted_values(df, "t", ["view", "click"]).collect()}
    assert bad == {2, 3}


def test_expression_catches_row_level_violation(spark):
    df = spark.createDataFrame([(1, 5, 5), (2, 5, 6)], "id long, a long, b long")
    bad = check_expression(df, "a = b").collect()
    assert [r.id for r in bad] == [2]
