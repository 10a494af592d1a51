"""SparkSession factory with the engine's standard configuration.

Arrow transfer on (all Python work is pandas/Arrow-vectorized), AQE on
(runtime re-plan + skew-join splitting), shuffle partitions sized to the
parallelism level so local[8] vs local[32] scaling runs are apples-to-apples.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _gc_flags(cpus: int, driver_memory: str) -> str:
    """Collector policy by heap size (both sides measured on the CDC replay
    bench):

    - small heap (<= 16g): ParallelGC wins on raw throughput — 838k vs 781k
      events/s steady at an 8-16g heap where full GCs are cheap.
    - big heap (> 16g): ParallelGC full-GC'd a 64g heap repeatedly at
      local[32] — 4-13x CPU burn with escalating per-epoch times; G1 with
      thread counts bounded to the modeled core count keeps throughput
      without the full-GC bomb.

    Bounded GC/JIT threads either way: a local[8] JVM on a 32-core host
    otherwise runs ~23 GC threads, free-riding on cores a real 8-core
    executor would not have."""
    import re

    # parse any JVM-style size ('8g', '64G', '16384m', '900000k', '512gb');
    # a bare rstrip('gb') misread '16384m' as 8 GB default and picked
    # ParallelGC on what is really a 16 GB heap (ADVICE r3)
    m = re.fullmatch(r"\s*(\d+(?:\.\d+)?)\s*([kmg]?)b?\s*",
                     driver_memory.lower())
    if m:
        scale = {"k": 1 / (1024 * 1024), "m": 1 / 1024, "g": 1.0, "": 1.0}
        heap_gb = float(m.group(1)) * scale[m.group(2)]
        if m.group(2) == "":  # bare number = bytes per JVM convention
            heap_gb = float(m.group(1)) / (1024 ** 3)
    else:
        heap_gb = 8.0
    cci = f" -XX:CICompilerCount={max(2, min(cpus, 4))}"
    if heap_gb <= 16:
        return f"-XX:+UseParallelGC -XX:ParallelGCThreads={cpus}" + cci
    return (f"-XX:+UseG1GC -XX:ParallelGCThreads={cpus}"
            f" -XX:ConcGCThreads={max(1, cpus // 4)}" + cci)


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
    # core count of THIS session's master (GC/JIT threads are bounded to it)
    try:
        inner = master.split("[", 1)[1].rstrip("]")
        cpus = cpus if inner == "*" else int(inner)
    except (IndexError, ValueError):
        pass
    if shuffle_partitions is None:
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
        .config("spark.driver.extraJavaOptions", _gc_flags(cpus, driver_memory))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
