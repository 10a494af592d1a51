"""SparkSession factory with the engine's standard configuration.

Arrow transfer on (all Python work is pandas/Arrow-vectorized), AQE on
(runtime re-plan + skew-join splitting), shuffle partitions sized to the
parallelism level so local[8] vs local[32] scaling runs are apples-to-apples.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    master: str | None = None,
    app_name: str = "skipmap_processor_spark",
    shuffle_partitions: int | None = None,
    driver_memory: str = "8g",
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32).
    ``shuffle_partitions`` defaults to the core count so a 4x-parallelism run
    also gets 4x shuffle partitions (the two-cluster-size scaling protocol in
    BASELINE.md).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # parse core count out of local[N]; fall back to cpus
        try:
            inner = master.split("[", 1)[1].rstrip("]")
            shuffle_partitions = cpus if inner == "*" else int(inner)
        except (IndexError, ValueError):
            shuffle_partitions = cpus

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.driver.memory", driver_memory)
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow: the only Python<->JVM channel we allow for row data.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # AQE: runtime coalescing + skew-join splitting (SURVEY.md §4).
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Keep partition sizes bounded for the 100 TB design point.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "127.0.0.1")
        # single-JVM batch engine: ParallelGC beats G1 on throughput here
        # (measured: 838k vs 781k events/s steady on the CDC replay bench)
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
