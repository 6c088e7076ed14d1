"""SparkSession construction with the engine's standard configs.

Single-JVM local mode in this sandbox; the configs are chosen for the
multi-executor design point (AQE on, Arrow on, sane shuffle parallelism).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "dcse-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra: dict | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime coalescing + skew-join splitting
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # serving-latency floor: the default 1MB minPartitionSize
        # coalesces a single query's term-pruned postings shuffle
        # (~2-3MB of varint blocks) into 2 partitions, serializing the
        # shard-scoring pandas stage onto 2 workers (measured 0.98s ->
        # 0.35s at 64KB with 23 tasks). Large shuffles are unaffected —
        # parallelismFirst already targets default parallelism
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64KB")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for all pandas UDF / applyInPandas exchanges
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("SPARK_GRAFT_ARROW_BATCH", "10000"),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        # shuffle/spill scratch space; point at tmpfs (SPARK_LOCAL_DIRS=
        # /dev/shm/...) on hosts with throttled disk — a cluster brings
        # local NVMe per executor, a sandbox VM does not
        .config("spark.local.dir", os.environ.get("SPARK_LOCAL_DIRS", "/tmp"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
