"""Streaming corpus refresh: landing -> curated through the table-log
change feed (streaming/refresh.py) — the medallion composition of the
change feed, the shared funnel primitives, and atomic refresh commits
whose op tags are the idempotence ledger."""

from __future__ import annotations

from candy_store_etl_spark.sources import table_log as tl
from candy_store_etl_spark.streaming.refresh import (
    refreshed_batches,
    run_landing_to_curated,
)

GOOD1 = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
GOOD2 = "kilo lima mike november oscar papa quebec romeo sierra tango"
GOOD2_REORDERED = "tango sierra romeo quebec papa oscar november mike lima kilo"
GOOD3 = "uniform victor whiskey xray yankee zulu one two three four"
GOOD4 = "red orange yellow green blue indigo violet cyan magenta white"
BAD = "a a a a a"  # all-filler, 5 tokens: quality 0.1375 << 0.6


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "s1", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )


def _curated_ids(spark, curated):
    return sorted(r.doc_id for r in tl.read_snapshot(spark, curated).collect())


def test_refresh_follows_feed_with_cross_batch_dedup(spark, tmp_path):
    landing = str(tmp_path / "landing")
    curated = str(tmp_path / "curated")
    ckpt = str(tmp_path / "ckpt")

    tl.append(_docs(spark, [(1, GOOD1), (2, BAD), (3, GOOD2)]), landing)
    run_landing_to_curated(spark, landing, curated, ckpt)
    assert _curated_ids(spark, curated) == [1, 3]  # BAD fails quality

    # second wave across TWO landing commits: an exact dup of curated
    # doc 1, a bag-of-words reorder of curated doc 3, a brand-new doc,
    # then a second commit with one new doc and an exact dup of the
    # FIRST wave-2 doc (cross-commit dedup)
    tl.append(
        _docs(spark, [(10, GOOD1), (11, GOOD2_REORDERED), (12, GOOD3)]),
        landing,
    )
    tl.append(_docs(spark, [(13, GOOD4), (14, GOOD3)]), landing)
    n_before = len(refreshed_batches(curated))
    run_landing_to_curated(spark, landing, curated, ckpt)
    # 10 dies on the exact-fingerprint anti-join, 11 on the BOW one,
    # 14 on whichever side of the batch boundary it lands (in-batch
    # first-doc_id-wins or the curated anti-join — same answer)
    assert _curated_ids(spark, curated) == [1, 3, 12, 13]
    assert len(refreshed_batches(curated)) > n_before
    # curated stores the fingerprints it deduped with
    cols = set(tl.read_snapshot(spark, curated).columns)
    assert {"fp", "bowfp"} <= cols


def test_within_batch_bow_neardup_first_wins(spark, tmp_path):
    """Two bag-of-words near-duplicates arriving in the SAME
    micro-batch: only the first doc_id enters the curated table (the
    anti-joins see only the pre-batch snapshot, so the in-batch
    window must catch this — post-review fix)."""
    landing = str(tmp_path / "landing")
    curated = str(tmp_path / "curated")
    ckpt = str(tmp_path / "ckpt")
    tl.append(
        _docs(spark, [(1, GOOD2), (2, GOOD2_REORDERED), (3, GOOD1)]),
        landing,
    )
    run_landing_to_curated(spark, landing, curated, ckpt)
    assert _curated_ids(spark, curated) == [1, 3]


def test_rerun_without_new_commits_is_a_noop(spark, tmp_path):
    landing = str(tmp_path / "landing")
    curated = str(tmp_path / "curated")
    ckpt = str(tmp_path / "ckpt")
    tl.append(_docs(spark, [(1, GOOD1)]), landing)
    run_landing_to_curated(spark, landing, curated, ckpt)
    v = tl.current_version(curated)
    run_landing_to_curated(spark, landing, curated, ckpt)
    assert tl.current_version(curated) == v  # no new batches, no commits
    assert _curated_ids(spark, curated) == [1]


def test_all_filtered_batch_still_commits_its_marker(spark, tmp_path):
    """An increment whose every row fails curation still advances the
    curated log (zero-row commit) — at-least-once delivery must not
    re-curate it after a restart."""
    landing = str(tmp_path / "landing")
    curated = str(tmp_path / "curated")
    ckpt = str(tmp_path / "ckpt")
    tl.append(_docs(spark, [(1, GOOD1)]), landing)
    run_landing_to_curated(spark, landing, curated, ckpt)
    tl.append(_docs(spark, [(2, BAD)]), landing)
    n_before = len(refreshed_batches(curated))
    run_landing_to_curated(spark, landing, curated, ckpt)
    # the resumed stream delivers only the BAD commit; every row fails
    # curation, yet the batch still commits a zero-row marker
    assert _curated_ids(spark, curated) == [1]
    assert len(refreshed_batches(curated)) > n_before


def test_retried_epoch_is_a_noop(spark, tmp_path):
    """Direct sink retry with the same batch id: the committed op IS
    the marker (same discipline as the CDC sink)."""
    from candy_store_etl_spark.streaming.refresh import make_refresh_sink

    landing = str(tmp_path / "landing")
    curated = str(tmp_path / "curated")
    tl.append(_docs(spark, [(1, GOOD1), (2, GOOD2)]), landing)
    feed_like = tl.read_snapshot(spark, landing).selectExpr(
        "*", "'insert' AS _change_type", "CAST(0 AS BIGINT) AS _commit_version"
    )
    sink = make_refresh_sink(curated)
    sink(feed_like, 0)
    v = tl.current_version(curated)
    sink(feed_like, 0)  # redelivery
    assert tl.current_version(curated) == v
    assert _curated_ids(spark, curated) == [1, 2]
