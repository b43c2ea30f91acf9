"""SparkSession factory tuned for the local[32] harness.

On a real cluster the same settings apply except master/memory; AQE does the
runtime re-planning (partition coalescing, skew-join splitting) that keeps
the plans healthy at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "storage_spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or os.cpu_count() or 4
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # shuffle partitions sized to cores for local mode; a cluster run would
        # set this to ~2-3x total cores and let AQE coalesce.
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        # Whole-stage codegen emits one compiled class per stage; a long
        # session (bench suite, test run) overflows the default 256m JVM
        # code cache, after which the JIT stops compiling and hot loops run
        # interpreted (measured 10-100x slowdowns late in a suite). 1g keeps
        # every stage compiled.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:+UseG1GC",
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    # Shuffle/spill files on tmpfs when available: this harness runs on a VM
    # whose block device serves writes with pathological kernel-time stalls
    # (observed 80% sys-time and 10-100x query-time swings during shuffle
    # writes). RAM-backed local dirs remove the block device from the path;
    # on a real cluster local dirs are instance SSDs and this is moot.
    if os.path.isdir("/dev/shm"):
        shm = "/dev/shm/spark-local"
        os.makedirs(shm, exist_ok=True)
        builder = builder.config("spark.local.dir", shm)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
