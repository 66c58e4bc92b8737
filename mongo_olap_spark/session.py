"""SparkSession factory tuned for this engine.

Local-mode testing runs on ``local[$SPARK_GRAFT_CPUS]``. The default
is 16 task threads, NOT the VM's 32 vCPUs: a local-mode JVM also runs
GC threads, the driver, shuffle IO, and (for the Arrow stages) a
Python worker per task slot — at 32 task threads on 32 vCPUs the box
oversubscribes and measured throughput *degrades run-over-run*
(minhash: 13 s → 42 s across three consecutive runs at local[32];
steady ~5 s at local[16]). Leaving headroom is the same sizing rule a
real cluster uses (executor cores < machine cores). Driver heap
defaults to 32g (``SPARK_GRAFT_DRIVER_MEM``) — GC churn at 16g was
measurably slower on the aggregate-heavy queries.

The remaining settings are what we would ship to a 1000-executor
cluster: AQE on (runtime coalescing, skew-join splitting), UTC session
time zone (oracle comparability and sane cross-region semantics),
Arrow enabled for the few pandas-UDF paths.

Only ``spark.sql.shuffle.partitions`` is environment-sensitive: ~cores
locally; on a real cluster leave it high (or rely on AQE coalescing,
which makes the static number mostly moot).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "mongo_olap_spark", *, shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cpus) if cpus.isdigit() else 16, 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.spill.compress", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
