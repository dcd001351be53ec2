"""Tuned SparkSession factory for tests and bench.

The driver passes its own SparkSession to ``entry``/``queries`` — every
operator must work with a vanilla session — so tuning lives here, not in
the operators. Settings are chosen for local[32] at sf<=0.1 but the
*shape* (AQE on, Arrow on, modest shuffle parallelism) is what we would
ship on a 1000-executor cluster; only the numbers change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "sparkflow", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        # local mode: ~1x cores; at cluster scale this would be
        # ~2-3x total executor cores (or left to AQE coalescing).
        shuffle_partitions = int(cpus)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # AQE: runtime broadcast conversion, partition coalescing, skew-join split.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for any pandas UDF / toPandas path.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # keep local-mode overhead down; harmless on a cluster
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    return builder.getOrCreate()
