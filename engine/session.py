"""SparkSession factory with the engine's scale-oriented defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(master: str | None = None, app_name: str = "fulltext-engine",
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build a SparkSession.

    Defaults: local[$SPARK_GRAFT_CPUS or *], AQE on (skew-join + coalesce),
    Arrow enabled for pandas UDF transfer. On a real cluster these same
    settings apply; only `master` changes (spark-submit provides it).
    """
    master = master or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]"
    if shuffle_partitions is None:
        # match parallelism in local mode; on a cluster AQE coalesces
        n = master[master.find("[") + 1:master.find("]")] if "[" in master else "32"
        shuffle_partitions = 32 if n == "*" else max(8, int(n))
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # smaller splits: the Arrow/pandas map stages do substantial CPU work
        # per byte, so 16MB tasks keep all cores busy (128MB default gives a
        # handful of tasks for a mid-size corpus and idles the cluster)
        .config("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        # tmpfs shuffle dir: on a real cluster this is the node-local NVMe
        # scratch; on this sandbox /tmp is a slow virtio disk that serializes
        # concurrent shuffle writers (measured 10x stage slowdown)
        .config("spark.local.dir",
                os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local")
                if os.path.isdir("/dev/shm") else "/tmp")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    return builder.getOrCreate()
