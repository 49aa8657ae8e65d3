"""TIMESTAMP_NTZ regression coverage.

Naive parquet timestamps (pyarrow ``timestamp[us]`` with no tz metadata)
load as TIMESTAMP_NTZ under Spark 4's default
``spark.sql.parquet.inferTimestampNTZ.enabled=true``, and NTZ forbids a
direct ``CAST(ts AS DOUBLE)`` — which silently worked for the LTZ frames
``createDataFrame`` produces and broke only on real parquet input
(round-3 driver failures: max_time_gap, sessionize, asof). Every test
here goes through the driver-shaped parquet tables, not createDataFrame.
"""

import os

import pyspark.sql.functions as F
import pytest

SF_DIR = os.environ.get("TERM_SPARK_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def events(spark):
    df = spark.read.parquet(f"{SF_DIR}/events.parquet")
    # Guard the premise: if this ever reads as LTZ again the other tests
    # still pass, but we want to know the NTZ path is the one exercised.
    assert dict(df.dtypes)["ts"] == "timestamp_ntz", dict(df.dtypes)["ts"]
    return df


def test_epoch_seconds_on_ntz(events):
    from term_spark.functions import epoch_seconds

    row = events.agg(F.min(epoch_seconds("ts")).alias("mn"),
                     F.max(epoch_seconds("ts")).alias("mx")).collect()[0]
    # testdata events are generated in 2024 — naive-UTC epoch range.
    assert 1.7e9 < row["mn"] < row["mx"] < 1.8e9


def test_max_time_gap_query_on_ntz(spark):
    from term_spark.queries import QUERIES

    row = QUERIES["max_time_gap_events"](spark, SF_DIR).collect()[0]
    assert row["total_gaps"] > 0 and row["max_gap_seconds"] > 0


def test_sessionize_query_on_ntz(spark):
    from term_spark.queries import QUERIES

    rows = QUERIES["sessionize_events"](spark, SF_DIR).collect()
    assert len(rows) > 0
    assert all(r["n_sessions"] >= 1 for r in rows)


def test_asof_query_on_ntz(spark):
    from term_spark.queries import QUERIES

    rows = QUERIES["asof_click_error"](spark, SF_DIR).collect()
    assert len(rows) > 0
    matched = [r for r in rows if r["error_id"] is not None]
    assert matched, "as-of join matched no click to a prior error"
    assert all(r["gap_seconds"] >= 0 for r in matched)


def test_max_time_gap_constraint_on_ntz(spark, events):
    from term_spark.core.constraint import EngineContext
    from term_spark.operators.temporal import MaxTimeGapConstraint

    c = MaxTimeGapConstraint("ts", max_gap_seconds=1.0, group_by="user_id")
    res = c.evaluate(EngineContext(spark, {"data": events}))
    # 1-second max gap over synthetic event streams must find violations;
    # the point is the NTZ window-lag path analyzes and runs.
    assert res.metric is not None and res.metric > 0


def test_asof_join_operator_on_ntz(events):
    from term_spark.operators.temporal import asof_join

    clicks = (events.filter(F.col("event_type") == "click")
              .select("event_id", "user_id", "ts").limit(200))
    errors = (events.filter(F.col("event_type") == "error")
              .select("user_id", "ts", F.col("event_id").alias("error_id")))
    j = asof_join(clicks, errors, on="user_id")
    assert j.count() == clicks.count()  # left-preserving


def test_date_range_constraint_on_ntz(spark, events):
    from term_spark.operators.temporal import DateRangeConstraint

    c = DateRangeConstraint("ts", min_date="2024-01-01", max_date="2024-12-31")
    metrics = events.agg(*[col.alias(a) for a, col
                           in c.scalar_metrics(events).items()]).collect()[0]
    res = c.result_from_metrics(metrics.asDict())
    assert res.metric == 0.0  # all testdata events are in 2024


def test_profiler_temporal_ranges_on_ntz(spark, events):
    from term_spark.analyzers.profiler import ColumnProfiler

    prof = ColumnProfiler().profile(events.select("ts", "value"))
    ts = prof.columns["ts"]
    assert ts.spark_type == "timestamp_ntz"
    assert isinstance(ts.min, str) and ts.min.startswith("2024-")
    assert ts.max > ts.min  # ISO strings order lexicographically
    assert prof.columns["value"].mean is not None  # numeric pass intact


def test_suggestions_date_range_for_ntz(spark, events):
    from term_spark.analyzers.profiler import ColumnProfiler
    from term_spark.analyzers.suggestions import SuggestionEngine

    prof = ColumnProfiler().profile(events.select("ts"))
    sugg = [s for s in SuggestionEngine().suggest(prof)
            if s.constraint == "within_date_range"]
    assert sugg and sugg[0].args["min_date"].startswith("2024-")

    # the suggestion materializes into a runnable Check
    from term_spark.core.check import Check
    check = sugg[0].apply_to(Check("t"))
    assert any(c.name == "date_range" for c in check.constraints)


def test_has_min_max_on_ntz_timestamp(spark, events):
    from term_spark import Assertion, Check, Level, ValidationSuite

    # 2024 epoch range: min/max/mean enter the fused agg as epoch seconds
    suite = ValidationSuite.builder("ts_stats").with_check(
        Check("ts", Level.ERROR)
        .has_min("ts", Assertion.between(1.70e9, 1.72e9))
        .has_max("ts", Assertion.between(1.70e9, 1.72e9))
        .has_mean("ts", Assertion.between(1.70e9, 1.72e9)))
    result = suite.run(spark, events)
    assert result.passed, [i.message for i in result.report.issues]
