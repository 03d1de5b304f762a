"""SparkSession factory with scale-appropriate defaults.

The settings below are the ones that matter at 100 TB and cost nothing
locally:

- AQE on (runtime shuffle-partition coalescing, skew-join splitting,
  broadcast demotion) — ``spark.sql.adaptive.*``;
- Arrow for every pandas-UDF boundary (allocation, forecasting,
  similarity operators are Arrow-batched, never row-at-a-time);
- UTC session timezone so results are reproducible and comparable
  against external engines (DuckDB oracle, downstream warehouses);
- shuffle partitions sized to the local core count — on a real
  cluster AQE coalesces from a deliberately high initial number.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def build_session(
    app_name: str = "candy-store-etl-spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a local SparkSession tuned for this engine.

    On a cluster, drop the ``.master`` call and submit with
    ``spark-submit``; every other setting carries over unchanged.
    """
    n = cpus or DEFAULT_CPUS
    # Python-worker path hygiene (r13, measured): pyspark's worker runs
    # importlib.invalidate_caches() per TASK, and with $SPARK_HOME's
    # pyspark.zip/py4j.zip on the worker path each call eagerly
    # re-parses both archives' central directories (~60% of worker
    # main(), ~156 ms cpu per task — the single largest per-task
    # constant behind the 8-cores-beats-32 sf0.1 scaling block). The
    # shipped sitecustomize prunes the zips at worker startup ONLY
    # when an unpacked pyspark of the identical version resolves
    # without them (see workerenv/sitecustomize.py); the env var
    # below disables it. Cluster-valid: any deployment whose workers
    # carry both a zip and an unpacked install pays the same per-task
    # tax at any scale.
    worker_site = os.path.join(os.path.dirname(__file__), "workerenv")
    worker_pythonpath = os.pathsep.join(
        p for p in (worker_site, os.environ.get("PYTHONPATH")) if p
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{n}]")
        .config("spark.executorEnv.PYTHONPATH", worker_pythonpath)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        # PySpark 4's DataFrame debugging wraps EVERY DataFrame/Column
        # API call with a conf read + PySparkCurrentOrigin.set/clear
        # (3 extra py4j round trips) plus a Python stack walk, purely
        # to decorate error messages with the user call site. Measured
        # r12: 46-59% of plan-CONSTRUCTION time on expression-heavy
        # queries (minhash build 1.58 s -> 0.86 s, bloom decontaminate
        # 0.88 s -> 0.36 s). A resident engine building thousands of
        # plans pays this on every one; errors still raise with full
        # JVM context, only the pretty call-site line is lost — and an
        # interactive/debug consumer can recover it without editing
        # source: SPARK_GRAFT_DF_DEBUG=true (r12 advice).
        .config(
            "spark.python.sql.dataFrameDebugging.enabled",
            os.environ.get("SPARK_GRAFT_DF_DEBUG", "false"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
