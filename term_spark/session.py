"""SparkSession factory with scale-appropriate defaults.

Local testing runs ``local[N]``; the same conf block is what we'd ship
on a 1000-executor cluster (AQE on, skew handling, Arrow for any
pandas-UDF paths, sane shuffle partitioning).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "term_spark", shuffle_partitions: int = None,
              master: str = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle = str(shuffle_partitions or os.environ.get(
        "TERM_SPARK_SHUFFLE_PARTITIONS", cpus))
    return (
        SparkSession.builder
        .appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", shuffle)
        # start shuffles wide and let AQE coalesce down — the setting
        # that survives a 1000-executor scale-up unchanged
        .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
                str(max(int(shuffle) * 4, 64)))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("TERM_SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
