"""SparkSession factory tuned for both local testing and cluster scale.

Local mode is a single JVM with N executor threads; on a real cluster the
same configs apply per-executor. AQE is enabled so shuffle partition
counts and skew joins re-plan at runtime — at 100 TB this is what keeps
a static ``spark.sql.shuffle.partitions`` choice from being a bottleneck.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "quake_vector_search_spark",
              cpus: int | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (default 32).
    Shuffle partitions default to the core count locally; on a cluster
    AQE coalescing makes the exact number non-critical.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder
        .master(os.environ.get("SPARK_MASTER", f"local[{cpus}]"))
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # partition discovery: past 32 dirs Spark launches a LISTING JOB
        # per refresh (~170 ms of scheduling to enumerate a local
        # directory tree). The IVF index re-lists after every DML
        # publish, so raise the driver-side listing cutoff; on a real
        # cluster against an object store with thousands of partitions
        # the distributed listing kicks in past this threshold exactly
        # as before.
        .config("spark.sql.sources.parallelPartitionDiscovery.threshold",
                "512")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
