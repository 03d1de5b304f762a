"""Round-11 surface: the round-9-ADVICE hardenings (typed isin
probes, the scan-off-key route label, commit tmp-file reclamation)
plus this round's regime routers — the coverage-routed CDC sink and
serve_join."""

from __future__ import annotations

import os
import time

import pytest

from candy_store_etl_spark.operators import colocated as co
from candy_store_etl_spark.sources import table_log as tl


def _facts(spark, n=200, offset=0):
    return spark.createDataFrame(
        [(i + offset, i * 3) for i in range(n)], "k long, a long"
    )


def test_serve_small_isin_probe_casts_to_stored_type(spark, tmp_path):
    """The <=64-probe isin path must cast literals to the STORED key
    type, exactly like the >64 semi-join path and keyset_lookup do —
    on a string key, an uncast int probe would resolve under a
    different implicit cast than the keyset route for the same keys,
    breaking serve()'s route-is-invisible contract."""
    d = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(str(i), i * 3) for i in range(100)], "k string, a long"
    )
    co.write_bucketed(df, d, key_col="k", n_buckets=8)
    # int probes against a string key: the cast makes both routes
    # compare string-to-string
    hit, info = co.serve(spark, d, [3, 30, 999])
    assert info["route"] == "scan-small-table"
    assert sorted(r.k for r in hit.collect()) == ["3", "30"]
    # the same probes through the keyset route (force it by lowering
    # the crossover) return the same rows
    hit2, info2 = co.serve(spark, d, [3, 30, 999], scan_file_threshold=0)
    assert info2["route"] == "keyset"
    assert sorted(r.k for r in hit2.collect()) == ["3", "30"]


def test_vacuum_sweeps_stale_commit_tmp_files(spark, tmp_path):
    """A writer that dies between writing NNNNNNNN.json.tmp.* and
    linking it leaks the tmp into _txn_log; vacuum reclaims strays
    older than the grace window and leaves fresh ones alone."""
    d = str(tmp_path / "t")
    tl.append(_facts(spark, 50), d)
    log_dir = os.path.join(d, "_txn_log")
    stale = os.path.join(log_dir, "00000009.json.tmp.999.deadbeef")
    fresh = os.path.join(log_dir, "00000009.json.tmp.999.cafebabe")
    for p in (stale, fresh):
        with open(p, "w") as f:
            f.write("{")  # a partial write, as a dying writer leaves
    old = time.time() - 7 * 24 * 3600
    os.utime(stale, (old, old))
    deleted = tl.vacuum(d)
    assert os.path.basename(stale) in deleted
    assert not os.path.exists(stale)
    assert os.path.exists(fresh)  # inside the grace window: in-flight
    # the log itself is untouched and readable
    assert tl.current_version(d) == 0
