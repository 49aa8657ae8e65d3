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
        # r16 (guide §3.1/§9): let the planner pick shuffled-hash join
        # when its per-partition size conditions hold instead of
        # defaulting to sort-merge — the size gating (build side must
        # fit partition-local memory) is what keeps this scale-safe,
        # and it is data-relative, not tuned to local[32].  Measured
        # interleaved at sf10: waiting_suppliers 16.8 -> 13.1 s (the
        # 60M-row SMJ sort disappears), every other join query neutral
        # or slightly better, zero regressions.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("TERM_SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def local_df(spark: SparkSession, rows, schema):
    """Driver-local rows as a ONE-partition DataFrame.

    ``spark.createDataFrame(list, schema)`` spreads the rows over
    ``sc.defaultParallelism`` pickled partitions (32 on this host), and
    every downstream evaluation — a collect, a broadcast-relation
    build, a ``coalesce(1)`` metadata write — then pays one
    Python-worker roundtrip PER partition; a coalesced single task
    walks all of them sequentially (measured r15: ~6 s to write a
    16-row centroid table, ~0.35 s with one partition).  Small
    driver-side tables are tiny by construction, so one partition is
    always the right shape; row order and values are identical to the
    default path (same element conversion, same schema machinery —
    only the slice count changes).
    """
    return spark.createDataFrame(
        spark.sparkContext.parallelize(list(rows), 1), schema)
