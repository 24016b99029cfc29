"""SparkSession factory (SURVEY.md §7).

Local-mode sessions tuned for the sandbox (single JVM, N threads) but with
the cluster-relevant knobs set the way a 1000-executor deployment would
want them: AQE on (runtime re-plan + skew-join splitting), Arrow enabled
for every pandas-UDF exchange, shuffle partitions sized to parallelism
(never the 200 default), UTC session timezone so results are comparable
against the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "kg",
    parallelism: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    parallelism: local[N] thread count; defaults to $SPARK_GRAFT_CPUS or 32.
    shuffle_partitions: defaults to parallelism (local rule of thumb —
    on a real cluster this would be ~2-3x total cores, or left to AQE
    coalescing which is enabled here).
    """
    if parallelism is None:
        parallelism = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(parallelism, 8)

    # Make the kg package importable on Python workers regardless of the
    # driver script's cwd (cluster deployments ship it via --py-files;
    # local workers inherit this PYTHONPATH).
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    worker_pythonpath = f"{pkg_root}:{existing}" if existing else pkg_root

    builder = (
        SparkSession.builder.master(f"local[{parallelism}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.executorEnv.PYTHONPATH", worker_pythonpath)
        # scan parallelism: local corpora arrive as a handful of big parquet
        # files; the 128 MB default yields 2-3 scan tasks and serializes the
        # scan → shuffle-write side of the first exchange.  32 MB keeps all
        # cores busy; at cluster scale inputs are many files and this only
        # affects the per-task footprint.
        .config("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    """Stop the active session (needed between parallelism levels in bench)."""
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    # Spark caches the JVM gateway; a fresh builder after stop() works in
    # the same process because local mode re-launches executors in-JVM.
