"""Funnel + cohort retention (round 11): sequential gating semantics
on planted event sequences."""

import pytest

from term_spark.operators.temporal import funnel, retention_cohorts


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string") \
        .selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts", "event_type")


def test_funnel_requires_order(spark):
    rows = [
        # u1 converts fully in order
        (1, "2024-01-01 10:00:00", "view"),
        (1, "2024-01-01 10:01:00", "click"),
        (1, "2024-01-01 10:02:00", "purchase"),
        # u2 clicks BEFORE viewing — click must not convert
        (2, "2024-01-01 09:00:00", "click"),
        (2, "2024-01-01 10:00:00", "view"),
        # u3 views only
        (3, "2024-01-01 08:00:00", "view"),
        # u4 purchases with no view at all — not even in the funnel
        (4, "2024-01-01 08:00:00", "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_type string") \
        .selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts", "event_type")
    got = {r["step"]: r for r in funnel(
        df, ["view", "click", "purchase"]).collect()}
    assert got["view"]["n_users"] == 3
    assert got["click"]["n_users"] == 1      # only u1; u2's click was early
    assert got["purchase"]["n_users"] == 1
    assert got["click"]["conversion_overall"] == pytest.approx(1 / 3)
    assert got["purchase"]["conversion_from_prev"] == 1.0

    with pytest.raises(ValueError, match="distinct"):
        funnel(df, ["view", "view"])


def test_funnel_materializes_each_step(spark, monkeypatch):
    """Round-12 scan-count pin: a depth-d funnel must localCheckpoint
    each step's completion table exactly once (d checkpoints), so each
    count and the next step's join read the materialized |users| table
    instead of re-executing steps 1..i-1 — d scans of events for depth
    d, not O(d²)."""
    # Spark 4: concrete sessions build pyspark.sql.classic DataFrames;
    # patching the abstract pyspark.sql.DataFrame would miss them
    from pyspark.sql.classic.dataframe import DataFrame

    calls = []
    orig = DataFrame.localCheckpoint

    def spy(self, *a, **kw):
        calls.append(1)
        return orig(self, *a, **kw)

    monkeypatch.setattr(DataFrame, "localCheckpoint", spy)
    rows = [
        (1, "2024-01-01 10:00:00", "view"),
        (1, "2024-01-01 10:01:00", "click"),
        (1, "2024-01-01 10:02:00", "purchase"),
        (2, "2024-01-01 10:00:00", "view"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_type string") \
        .selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts", "event_type")
    got = {r["step"]: r["n_users"] for r in funnel(
        df, ["view", "click", "purchase"]).collect()}
    assert got == {"view": 2, "click": 1, "purchase": 1}
    assert len(calls) == 3


def test_retention_cohorts_offsets_and_rates(spark):
    day = 86400
    rows = [
        # u1 signs up week 0, active weeks 0 and 2
        (1, "1970-01-01 00:00:10", "signup"),
        (1, "1970-01-16 00:00:00", "view"),       # day 15 -> week 2
        # u2 signs up week 0, never returns
        (2, "1970-01-02 00:00:00", "signup"),
        # u3 signs up week 1, active week 2 (offset 1)
        (3, "1970-01-08 00:00:00", "signup"),
        (3, "1970-01-15 00:00:00", "click"),
        # u3 also has an event BEFORE signing up — excluded (negative)
        (3, "1970-01-01 00:00:00", "view"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_type string") \
        .selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts", "event_type")
    got = {(r["cohort_epoch"], r["period_offset"]): r
           for r in retention_cohorts(df, "signup").collect()}
    # week-0 cohort: 2 members, both active at offset 0 (their signup)
    assert got[(0, 0)]["n_active"] == 2
    assert got[(0, 0)]["retention_rate"] == 1.0
    # only u1 returns at offset 2
    assert got[(0, 2)]["n_active"] == 1
    assert got[(0, 2)]["retention_rate"] == pytest.approx(0.5)
    # week-1 cohort of u3: active offsets 0 and 1; pre-signup view gone
    assert got[(7 * day, 0)]["n_active"] == 1
    assert got[(7 * day, 1)]["n_active"] == 1
    assert (0, -1) not in got and (7 * day, -1) not in got


def test_event_transitions_counts_and_probabilities(spark):
    rows = [
        (1, "2024-01-01 10:00:00", "view"),
        (1, "2024-01-01 10:01:00", "click"),
        (1, "2024-01-01 10:02:00", "view"),
        (1, "2024-01-01 10:03:00", "click"),
        (2, "2024-01-01 10:00:00", "view"),
        (2, "2024-01-01 10:05:00", "error"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_type string") \
        .selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts", "event_type")
    from term_spark.operators.temporal import event_transitions
    got = {(r["from_type"], r["to_type"]): r
           for r in event_transitions(df).collect()}
    assert got[("view", "click")]["n"] == 2
    assert got[("view", "error")]["n"] == 1
    assert got[("view", "click")]["p_next"] == pytest.approx(2 / 3)
    assert got[("click", "view")]["n"] == 1      # within u1's stream
    # cross-user boundaries never produce a transition
    assert ("error", "view") not in got

    import pytest as _pt
    with _pt.raises(ValueError, match="min_count"):
        event_transitions(df, min_count=0)
