"""Structured Streaming extension (additive — the reference has no
streaming runtime; SURVEY §2.9/§7.2-9 marks this as the optional
``foreachBatch`` wrapper plus watermark-aware freshness checks).

- StreamingSuiteRunner: run a batch ValidationSuite per micro-batch via
  ``foreachBatch``; results flow into a MetricsRepository keyed by
  batch id, so anomaly detection works across micro-batches.
- windowed_metrics: watermarked tumbling/sliding-window aggregation of
  the same scalar metric expressions the batch engine uses.
- freshness_check: watermark-aware data-freshness metric.
- stateful_dedup_stream: exact streaming dedup via dropDuplicates
  within watermark (state-store backed).
"""

from __future__ import annotations

import time
from typing import Callable, Dict, List, Optional

import pyspark.sql.functions as F


class StreamingSuiteRunner:
    """foreachBatch adapter: validates every micro-batch with the batch
    engine (one fused agg per batch — the per-batch cost is the same
    1-2 jobs as the batch path)."""

    def __init__(self, suite, repository=None, on_result: Optional[Callable] = None,
                 fail_on_error: bool = False):
        self.suite = suite
        self.repository = repository
        self.on_result = on_result
        self.fail_on_error = fail_on_error
        self.results: List = []  # bounded: last 100

    def foreach_batch(self, batch_df, batch_id: int) -> None:
        spark = batch_df.sparkSession
        result = self.suite.run(spark, batch_df)
        self.results.append((batch_id, result))
        del self.results[:-100]
        if self.repository is not None:
            from ..analyzers.base import MetricValue
            from ..repository import ResultKey
            key = ResultKey.of(time.time(), batch_id=str(batch_id),
                               suite=self.suite.name)
            self.repository.save(key, {
                k: MetricValue.double(v) for k, v in result.metrics.items()
                if isinstance(v, (int, float))})
        if self.on_result is not None:
            self.on_result(batch_id, result)
        if self.fail_on_error and not result.passed:
            raise RuntimeError(
                f"validation failed for micro-batch {batch_id}: "
                f"{[i.message for i in result.report.issues][:5]}")

    def attach(self, stream_writer):
        """writer.foreachBatch hookup: runner.attach(df.writeStream)"""
        return stream_writer.foreachBatch(self.foreach_batch)


def _with_event_time(stream_df, ts_col: str):
    """Watermarks require TIMESTAMP (LTZ); naive parquet timestamps load
    as TIMESTAMP_NTZ, which Spark rejects as an event-time column. Coerce
    in place — in a UTC session the instants are identical."""
    if dict(stream_df.dtypes).get(ts_col) == "timestamp_ntz":
        return stream_df.withColumn(ts_col, F.col(ts_col).cast("timestamp_ltz"))
    return stream_df


def windowed_metrics(stream_df, ts_col: str, metric_exprs: Dict[str, "F.Column"],
                     window: str = "1 minute", slide: Optional[str] = None,
                     watermark: str = "10 minutes"):
    """Watermarked windowed aggregation of scalar metric expressions.

    Late rows beyond the watermark are dropped by Spark's state
    eviction — the streaming analogue of the batch engine's shared
    single-pass agg.
    """
    stream_df = _with_event_time(stream_df, ts_col)
    win = (F.window(F.col(ts_col), window, slide) if slide
           else F.window(F.col(ts_col), window))
    return (stream_df
            .withWatermark(ts_col, watermark)
            .groupBy(win.alias("window"))
            .agg(*[c.alias(a) for a, c in metric_exprs.items()]))


def freshness_check(stream_df, ts_col: str, watermark: str = "10 minutes",
                    window: str = "1 minute"):
    """Per-window max event-time lag vs processing time — a freshness
    metric stream (watermark-aware; SURVEY §7.2-9)."""
    stream_df = _with_event_time(stream_df, ts_col)
    return (stream_df
            .withWatermark(ts_col, watermark)
            .groupBy(F.window(F.col(ts_col), window).alias("window"))
            .agg(F.max(F.col(ts_col)).alias("max_event_time"),
                 F.count(F.lit(1)).alias("n_events"))
            .withColumn("observed_at", F.current_timestamp())
            .withColumn("freshness_lag_seconds",
                        F.col("observed_at").cast("double") -
                        F.col("max_event_time").cast("double")))


def stateful_dedup_stream(stream_df, key_cols: List[str], ts_col: str,
                          watermark: str = "1 hour"):
    """Streaming exact dedup: state-store-backed dropDuplicates within
    the watermark horizon (unbounded dedup is unrunnable at scale —
    the watermark bounds state size)."""
    stream_df = _with_event_time(stream_df, ts_col)
    return (stream_df
            .withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(key_cols))


def running_stats_stream(stream_df, key_col: str, value_col: str):
    """Custom stateful operator: per-key running (n, sum, sum²) state
    maintained across micro-batches via ``applyInPandasWithState`` —
    the streaming form of the batch engine's mergeable analyzer state
    (analyzers/base.py state algebra; same n/Σx/Σx² triple).

    Emits one row per key per batch with the cumulative n, mean, and
    sample stddev. State is a 3-number tuple per key — bounded by key
    cardinality, not stream length, so this holds at cluster scale.
    Arrow-batched (no row-at-a-time Python).
    """
    import math

    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        if state.exists:
            n, s, s2 = state.get
        else:
            n, s, s2 = 0, 0.0, 0.0
        for pdf in pdfs:
            v = pdf[value_col].dropna()
            n += int(v.size)
            s += float(v.sum())
            s2 += float((v * v).sum())
        state.update((n, s, s2))
        mean = s / n if n else None
        var = (s2 - s * s / n) / (n - 1) if n > 1 else None
        std = math.sqrt(var) if var is not None and var > 0 else (
            0.0 if var is not None else None)
        yield pd.DataFrame([{key_col: key[0], "n": n, "mean": mean,
                             "stddev": std}])

    from pyspark.sql.types import (LongType, StructField, StructType,
                                   DoubleType)

    # the key keeps its incoming type (string user ids are as common as
    # bigints) — hardcoding bigint here failed at runtime for any other key
    key_field = stream_df.schema[key_col]
    out_schema = StructType([
        StructField(key_col, key_field.dataType, True),
        StructField("n", LongType(), True),
        StructField("mean", DoubleType(), True),
        StructField("stddev", DoubleType(), True)])
    state_schema = "n bigint, s double, s2 double"
    return (stream_df.groupBy(key_col)
            .applyInPandasWithState(update, out_schema, state_schema,
                                    "update", GroupStateTimeout.NoTimeout))


def session_metrics(stream_df, ts_col: str, key_col: str,
                    gap: str = "30 minutes", watermark: str = "1 hour",
                    metric_exprs: Optional[Dict[str, "F.Column"]] = None):
    """Streaming sessionization via Spark's native session_window:
    per-(key, session) aggregates where a session closes after ``gap``
    inactivity — the streaming counterpart of the batch
    q_sessionize_events LAG idiom, with state eviction driven by the
    watermark instead of a full-history window."""
    exprs = metric_exprs or {"n_events": F.count(F.lit(1))}
    stream_df = _with_event_time(stream_df, ts_col)
    return (stream_df
            .withWatermark(ts_col, watermark)
            .groupBy(F.session_window(F.col(ts_col), gap).alias("session"),
                     F.col(key_col))
            .agg(*[c.alias(a) for a, c in exprs.items()]))
