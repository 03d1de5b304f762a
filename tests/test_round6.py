"""Round-6 behavior pins: advisory guards (zero-token corpus through
the mixture planner) and the restructured exact-substring plan."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from candy_store_etl_spark.plans import QUERIES, query_map

query_map()  # trigger registry load


@pytest.fixture(scope="module")
def empty_text_sf(spark, tmp_path_factory):
    """An sf_dir whose documents all tokenize to ZERO tokens — the
    corpus that drove bw (sum of isqrt token weights) to 0 and made
    the unguarded mixture planner raise DIVIDE_BY_ZERO under ANSI."""
    d = tmp_path_factory.mktemp("sf_empty_text")
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["", "   ", "\t \n"],
            "lang": ["en", "en", "de"],
            "source": ["web", "web", "books"],
            "n_chars": [0, 3, 4],
        }
    )
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        str(d / "documents.parquet")
    )
    return str(d)


def test_source_mixture_plan_survives_zero_token_corpus(spark, empty_text_sf):
    """bw = 0 (every source has zero tokens) must yield the all-zero
    plan, not DIVIDE_BY_ZERO — on BOTH engines (round-5 advisory:
    the ad divisor was guarded, the bw divisor was not)."""
    spec = QUERIES["source_mixture_plan"]
    got = (
        spec.fn(spark, empty_text_sf)
        .toPandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    assert set(got["source"]) == {"web", "books"}
    for c in (
        "tokens_available",
        "target_tokens",
        "epochs_micro",
        "epochs_capped_micro",
        "realized_tokens",
    ):
        assert (got[c] == 0).all(), c

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{empty_text_sf}/documents.parquet/*.parquet')"
    )
    ora = con.execute(spec.oracle).df().sort_values("source").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype(str), ora.astype(str), obj="source_mixture_plan empty corpus"
    )
