"""SparkSession factory tuned for this engine.

Local-mode testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32,
the VM's vCPU count). An earlier round sized this down to 16 after
observing run-over-run degradation at 32 (minhash 13 s → 42 s across
consecutive runs); the actual root cause was CROSS-QUERY STATE, not
thread oversubscription — long bench sessions accumulated cached
DataFrames, checkpoint blocks, and GC debt, and whichever query ran
next absorbed the pauses. With per-query cache hygiene in bench.py
(clearCache + periodic collector nudge) local[32] is stable and
1.5-2× faster on the shuffle-heavy dedup suite than local[16]
(measured: 86 queries 100 s vs 169 s at sf0.1). Driver heap defaults
to 32g (``SPARK_GRAFT_DRIVER_MEM``) — GC churn at 16g was measurably
slower on the aggregate-heavy queries.

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
import sys

from pyspark.sql import SparkSession


def _pin_worker_python() -> None:
    """Worker python MUST be the driver's interpreter. Spark resolves
    workers from $PYSPARK_PYTHON or bare ``python3`` on PATH; this box
    carries several interpreters and PATH order has flipped between
    rounds, which surfaces as PYTHON_VERSION_MISMATCH in any RDD /
    pandas-UDF stage (this box even ships PYSPARK_PYTHON=python, a
    relative name whose resolution moved between rounds — so we
    OVERRIDE, not setdefault). Pinning to sys.executable is correct in
    local mode by construction (same host, same env)."""
    os.environ["PYSPARK_PYTHON"] = sys.executable
    os.environ["PYSPARK_DRIVER_PYTHON"] = sys.executable


def get_spark(app_name: str = "mongo_olap_spark", *, shuffle_partitions: int | None = None) -> SparkSession:
    _pin_worker_python()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cpus) if cpus.isdigit() else 32, 8)
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
    try:
        spark.sparkContext.setLogLevel("WARN")
    except Exception:
        pass  # Spark Connect session: no SparkContext; use server conf
    return spark
