"""SparkSession factory with scale-appropriate defaults.

Defaults are chosen for the 100 TB posture (AQE on, skew handling on,
partition coalescing on) while remaining correct on local[*] test runs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "pgferry_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for the engine.

    * AQE enabled: runtime coalescing of shuffle partitions, skew-join
      splitting, and dynamic join-strategy switching — this is what makes a
      statically-planned 100 TB job survive real data distributions.
    * Arrow enabled for the few pandas-UDF operators (multimodal decode,
      byte-surgery transforms).
    * Session timezone pinned to UTC: the reference forces ``loc=UTC`` on its
      source connections (reference source_mysql.go:52-70); we mirror that so
      timestamp semantics are location-independent.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        # stdout hygiene: the round driver parses the bench's final JSON
        # line out of a 2000-byte combined-output tail capture; stage
        # progress bars (\r-rewritten lines) share that buffer and have
        # cost parses before (BENCH_r03/r05). No perf effect.
        .config("spark.ui.showConsoleProgress", "false")
    )
    return builder.getOrCreate()
