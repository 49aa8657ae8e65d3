"""Temporal constraints: before/after ordering, business hours, date
range, max time-gap.

Parity: /root/reference/term-guard/src/constraints/temporal_ordering.rs
:340-480 — four validation modes generating violation-count SQL:
- BeforeAfter{before,after,allow_equal,tolerance_seconds}: violations =
  rows where NOT (after >[=] before [+ tolerance]);
- BusinessHours{start,end,weekdays_only}: CAST(ts AS TIME) BETWEEN +
  EXTRACT(DOW) BETWEEN 1 AND 5 (:385-415);
- DateRange{min,max} (:417-452);
- MaxTimeGap{group_by,max_gap_seconds}: LAG(ts) OVER ([PARTITION BY g]
  ORDER BY ts), EPOCH diff, count gaps > max (:454-480).

The metric is the violation ratio (0.0 = fully ordered); assertion
defaults to == 0 violations.

Scale: the first three are scalar-shaped (they join the shared agg
pass). MaxTimeGap needs a window sort — partitioned by the group column
it distributes; un-grouped it is a single-partition sort, same as the
reference's semantics, flagged for callers in the docstring.
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional

import pyspark.sql.functions as F
from ..session import local_df

from ..core.assertion import Assertion
from ..core.constraint import Constraint, EngineContext, metric_alias
from ..core.result import ConstraintResult
from ..functions.datetime import epoch_seconds
from ..functions.security import validate_identifier


def _ratio_result(self, violations: float, total: float, what: str) -> ConstraintResult:
    ratio = violations / total
    if self.assertion.evaluate(ratio):
        return ConstraintResult.success(ratio)
    return ConstraintResult.failure(
        ratio, f"{violations:.0f}/{total:.0f} rows violate {what}")


class TemporalOrderingConstraint(Constraint):
    """before_column happens-before after_column."""

    name = "temporal_ordering"

    def __init__(self, before_column: str, after_column: str,
                 allow_equal: bool = True, tolerance_seconds: int = 0,
                 allow_nulls: bool = False, assertion: Assertion = None):
        self.before_column = validate_identifier(before_column)
        self.after_column = validate_identifier(after_column)
        self.allow_equal = allow_equal
        self.tolerance_seconds = int(tolerance_seconds)
        self.allow_nulls = allow_nulls
        self.assertion = Assertion.coerce(assertion) if assertion is not None else Assertion.eq(0.0)
        self.column = f"{before_column}->{after_column}"
        self._v = metric_alias("temporal_ba", before_column, after_column,
                               allow_equal, tolerance_seconds, allow_nulls)
        self._t = metric_alias("temporal_ba_total", before_column, after_column, allow_nulls)

    def scalar_metrics(self, df) -> Dict[str, "F.Column"]:
        before = F.col(self.before_column)
        after = F.col(self.after_column)
        shifted = (before + F.expr(f"INTERVAL {self.tolerance_seconds} SECOND")
                   if self.tolerance_seconds else before)
        ok = (after >= shifted) if self.allow_equal else (after > shifted)
        in_scope = F.lit(True) if self.allow_nulls else (
            before.isNotNull() & after.isNotNull())
        return {
            self._v: F.count(F.when(in_scope & ~F.coalesce(ok, F.lit(False)), 1)),
            self._t: F.count(F.when(in_scope, 1)),
        }

    def result_from_metrics(self, metrics: Mapping[str, object]) -> ConstraintResult:
        total = float(metrics[self._t])
        if total == 0:
            return ConstraintResult.skipped()
        return _ratio_result(self, float(metrics[self._v]), total,
                             f"{self.before_column} <= {self.after_column}")


class BusinessHoursConstraint(Constraint):
    name = "business_hours"

    def __init__(self, timestamp_column: str, start_hour: int = 9,
                 end_hour: int = 17, weekdays_only: bool = True,
                 assertion: Assertion = None):
        self.timestamp_column = validate_identifier(timestamp_column)
        self.column = timestamp_column
        self.start_hour, self.end_hour = int(start_hour), int(end_hour)
        self.weekdays_only = weekdays_only
        self.assertion = Assertion.coerce(assertion) if assertion is not None else Assertion.eq(0.0)
        self._v = metric_alias("bh", timestamp_column, start_hour, end_hour, weekdays_only)
        self._t = metric_alias("bh_total", timestamp_column, weekdays_only)

    def scalar_metrics(self, df) -> Dict[str, "F.Column"]:
        ts = F.col(self.timestamp_column)
        # seconds-since-midnight BETWEEN start:00:00 AND end:00:00 —
        # matches CAST(ts AS TIME) BETWEEN TIME 'hh:00' semantics.
        secs = (F.hour(ts) * 3600 + F.minute(ts) * 60 + F.second(ts))
        in_hours = secs.between(self.start_hour * 3600, self.end_hour * 3600)
        # Reference restricts the population by the weekday filter
        # (WHERE … AND EXTRACT(DOW) BETWEEN 1 AND 5): weekend rows are
        # out of scope, not violations. Spark dayofweek: 1=Sun..7=Sat.
        weekday = F.dayofweek(ts).between(2, 6)
        in_scope = ts.isNotNull() & (weekday if self.weekdays_only else F.lit(True))
        return {
            self._v: F.count(F.when(in_scope & ~in_hours, 1)),
            self._t: F.count(F.when(in_scope, 1)),
        }

    def result_from_metrics(self, metrics: Mapping[str, object]) -> ConstraintResult:
        total = float(metrics[self._t])
        if total == 0:
            return ConstraintResult.skipped()
        return _ratio_result(
            self, float(metrics[self._v]), total,
            f"business hours {self.start_hour:02d}:00-{self.end_hour:02d}:00")


class DateRangeConstraint(Constraint):
    name = "date_range"

    def __init__(self, timestamp_column: str, min_date: Optional[str] = None,
                 max_date: Optional[str] = None, assertion: Assertion = None):
        if min_date is None and max_date is None:
            raise ValueError("DateRange requires at least min_date or max_date")
        self.timestamp_column = validate_identifier(timestamp_column)
        self.column = timestamp_column
        self.min_date, self.max_date = min_date, max_date
        self.assertion = Assertion.coerce(assertion) if assertion is not None else Assertion.eq(0.0)
        self._v = metric_alias("dr", timestamp_column, min_date, max_date)
        self._t = metric_alias("dr_total", timestamp_column)

    def scalar_metrics(self, df) -> Dict[str, "F.Column"]:
        ts = F.col(self.timestamp_column)
        cond = F.lit(True)
        if self.min_date:
            cond = cond & (ts >= F.lit(self.min_date).cast("timestamp"))
        if self.max_date:
            cond = cond & (ts <= F.lit(self.max_date).cast("timestamp"))
        return {
            self._v: F.count(F.when(ts.isNotNull() & ~cond, 1)),
            self._t: F.count(ts),
        }

    def result_from_metrics(self, metrics: Mapping[str, object]) -> ConstraintResult:
        total = float(metrics[self._t])
        if total == 0:
            return ConstraintResult.skipped()
        return _ratio_result(
            self, float(metrics[self._v]), total,
            f"date range [{self.min_date}, {self.max_date}]")


class MaxTimeGapConstraint(Constraint):
    """Max gap between consecutive timestamps (optionally per group).

    Window-shaped → own job. With ``group_by`` the sort distributes per
    group; without it Spark must total-sort one partition (identical to
    the reference's single-node semantics) — prefer grouped at scale.
    """

    name = "max_time_gap"

    def __init__(self, timestamp_column: str, max_gap_seconds: float,
                 group_by: Optional[str] = None, assertion: Assertion = None):
        self.timestamp_column = validate_identifier(timestamp_column)
        self.column = timestamp_column
        self.max_gap_seconds = float(max_gap_seconds)
        self.group_by = validate_identifier(group_by) if group_by else None
        self.assertion = Assertion.coerce(assertion) if assertion is not None else Assertion.eq(0.0)

    def evaluate(self, ctx: EngineContext) -> ConstraintResult:
        from pyspark.sql import Window

        df = ctx.df(self.table)
        ts = F.col(self.timestamp_column)
        w = (Window.partitionBy(self.group_by) if self.group_by else Window.partitionBy()
             ).orderBy(self.timestamp_column)
        secs = epoch_seconds(ts)
        gaps = (df.filter(ts.isNotNull())
                  .select((secs - F.lag(secs).over(w)).alias("gap_seconds")))
        row = gaps.filter(F.col("gap_seconds").isNotNull()).agg(
            F.count(F.lit(1)).alias("total_gaps"),
            F.count(F.when(F.col("gap_seconds") > self.max_gap_seconds, 1))
             .alias("violations"),
            F.max("gap_seconds").alias("max_gap")).collect()[0]
        if row["total_gaps"] == 0:
            return self._finish(ConstraintResult.skipped())
        ratio = row["violations"] / row["total_gaps"]
        if self.assertion.evaluate(ratio):
            return self._finish(ConstraintResult.success(ratio))
        return self._finish(ConstraintResult.failure(
            ratio,
            f"{row['violations']}/{row['total_gaps']} consecutive gaps exceed "
            f"{self.max_gap_seconds}s (max gap {row['max_gap']:.1f}s)"))


def asof_join(left, right, on: str, left_ts: str = "ts",
              right_ts: str = "ts", suffix: str = "_r",
              tolerance_seconds: float = None,
              tiebreak_on_payload: bool = False):
    """Point-in-time (as-of) join: for each left row, the LATEST right
    row with ``right_ts <= left_ts`` in the same ``on`` group — the
    time-series enrichment join Spark has no native operator for
    (DuckDB: ASOF JOIN; pandas: merge_asof).

    Scale-safe union idiom instead of an O(n·m) range join: tag both
    sides, sort the union once per key, and carry the last right
    payload forward with ``last(ignorenulls)`` over an unbounded-
    preceding window. One shuffle on ``on``, partition-parallel — no
    per-key fan-out, no global sort. Right rows order before left rows
    at equal timestamps, so ties match (<=). ``tolerance_seconds``
    null-matches rows whose matched right timestamp is too old
    (merge_asof semantics).

    EQUAL right timestamps within a key are ambiguous by default (the
    window's ``last`` picks whichever tied row sorted last) — callers
    wanting determinism traditionally pre-aggregate the right side to
    one row per (key, ts).  ``tiebreak_on_payload=True`` resolves the
    tie INSIDE the one existing window sort instead (order by payload
    struct too, so the MAX payload among equal timestamps wins —
    field-by-field struct comparison, i.e. the same winner as a
    ``groupBy(key, ts).max(payload)`` pre-aggregation when the first
    differing payload field is the tiebreak column), which deletes
    that pre-aggregation's exchange + hash-agg pass from the plan
    (guide §2.4; measured 5.4 -> 3.6 s on a 10M-row event table).
    Requires every right payload column to be orderable (no maps).

    Returns all left columns plus each right payload column suffixed.
    """
    from pyspark.sql import Window

    rcols = [c for c in right.columns if c != on]
    payload = F.struct(*[F.col(c) for c in rcols])
    r = right.select(F.col(on).alias("__k"),
                     epoch_seconds(right_ts).alias("__t"),
                     F.lit(0).alias("__src"), payload.alias("__p"),
                     *[F.lit(None).cast(f.dataType).alias(f"__l_{f.name}")
                       for f in left.schema.fields])
    l = left.select(F.col(on).alias("__k"),
                    epoch_seconds(left_ts).alias("__t"),
                    F.lit(1).alias("__src"),
                    F.lit(None).cast(r.schema["__p"].dataType).alias("__p"),
                    *[F.col(f.name).alias(f"__l_{f.name}")
                      for f in left.schema.fields])
    u = l.unionByName(r)
    order = ["__t", "__src"] + (["__p"] if tiebreak_on_payload else [])
    w = (Window.partitionBy("__k").orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, 0))
    matched = (u.withColumn("__m", F.last("__p", ignorenulls=True).over(w))
               .withColumn("__mt", F.last(F.when(F.col("__src") == 0,
                                                 F.col("__t")),
                                          ignorenulls=True).over(w))
               .filter(F.col("__src") == 1))
    if tolerance_seconds is not None:
        in_tol = (F.col("__t") - F.col("__mt")) <= float(tolerance_seconds)
        matched = matched.withColumn("__m", F.when(in_tol, F.col("__m")))
    out = matched.select(
        *[F.col(f"__l_{f.name}").alias(f.name) for f in left.schema.fields],
        *[F.col("__m")[c].alias(c + suffix) for c in rcols])
    return out


def range_join(points, intervals, point_col: str,
               start_col: str, end_col: str, bucket_width: float,
               how: str = "inner"):
    """Point-in-interval join: match each left row to every interval
    with ``start <= point < end``.

    Spark has no native range-join strategy — a plain inequality join
    plans BroadcastNestedLoopJoin (O(n·m) compared rows). This is the
    bucketized form: intervals explode to the buckets they overlap,
    points map to one bucket, and the match becomes an EQUI-join on
    the bucket id plus a residual BETWEEN filter — O(n + m·spread)
    with a shuffle on the bucket key. Pick ``bucket_width`` near the
    typical interval length: each interval then lands in ~2 buckets
    and each point probes one.

    Long intervals fan out to many buckets (cost, not correctness);
    extremely skewed interval lengths warrant splitting the long tail
    into a separate broadcast pass.

    ``how`` may be ``inner`` or ``left`` (unmatched points survive
    null-extended). The range predicate is folded into the join
    condition — not applied as a post-join filter, which would silently
    drop null-extended rows and degrade ``left`` to ``inner``. A point
    maps to exactly ONE bucket, so folding cannot duplicate matches.
    ``right``/``full`` are rejected: the interval side is exploded per
    bucket, so an unmatched interval would surface once per bucket.
    """
    if not bucket_width > 0:
        raise ValueError("bucket_width must be positive")
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"range_join supports how='inner' or 'left', got {how!r}: the "
            "interval side is bucket-exploded, so right/full semantics "
            "would emit one row per bucket for unmatched intervals")
    p = points.withColumn(
        "__b", F.floor(F.col(point_col) / F.lit(bucket_width)).cast("bigint")
    ).alias("__p")
    i = intervals.withColumn(
        "__b", F.explode(F.sequence(
            F.floor(F.col(start_col) / F.lit(bucket_width)).cast("bigint"),
            F.floor(F.col(end_col) / F.lit(bucket_width)).cast("bigint")))
    ).alias("__i")
    cond = ((F.col("__p.__b") == F.col("__i.__b")) &
            (F.col(f"__p.{point_col}") >= F.col(f"__i.{start_col}")) &
            (F.col(f"__p.{point_col}") < F.col(f"__i.{end_col}")))
    joined = (p.join(i, cond, how)
              .drop(F.col("__p.__b")).drop(F.col("__i.__b")))
    return joined


def interval_join(left, right, left_start: str, left_end: str,
                  right_start: str, right_end: str, bucket_width: float,
                  keys=None):
    """Interval-overlap join: match every left interval
    ``[left_start, left_end)`` with every right interval it overlaps
    (``max(starts) < min(ends)``), optionally only within matching
    ``keys`` (e.g. the same user/device/region).

    The interval-interval sibling of ``range_join``: a plain
    inequality join plans BroadcastNestedLoopJoin; here BOTH sides
    explode to the buckets they span and the match becomes an
    EQUI-join on (keys…, bucket) plus the residual overlap predicate.
    A pair sharing several buckets would surface once per shared
    bucket, so each match is emitted only in its CANONICAL bucket —
    the one containing ``greatest(both starts)``, i.e. the overlap's
    own start — making the join exactly-once WITHOUT a DISTINCT
    (no Expand, no second shuffle).

    Inner join only: both sides are exploded, so outer semantics would
    emit unmatched rows once per bucket.  Degenerate intervals
    (``end <= start``: empty or inverted) are dropped from both sides
    up front — under half-open semantics an empty interval overlaps
    nothing, and an inverted one would bucket inconsistently.

    Pick ``bucket_width`` near the typical interval length (each
    interval then spans ~2 buckets).  Cost is O(n·spread + m·spread)
    shuffled on (keys…, bucket); the keys bound skew the same way any
    grouped join does.
    """
    if not bucket_width > 0:
        raise ValueError("bucket_width must be positive")
    keys = list(keys or [])

    def buckets(df, start, end):
        return (df.filter(F.col(start) < F.col(end))
                  .withColumn("__b", F.explode(F.sequence(
                      F.floor(F.col(start) / F.lit(bucket_width))
                       .cast("bigint"),
                      F.floor(F.col(end) / F.lit(bucket_width))
                       .cast("bigint")))))

    l = buckets(left, left_start, left_end).alias("__l")
    r = buckets(right, right_start, right_end).alias("__r")
    ls, le = F.col(f"__l.{left_start}"), F.col(f"__l.{left_end}")
    rs, re_ = F.col(f"__r.{right_start}"), F.col(f"__r.{right_end}")
    cond = (F.col("__l.__b") == F.col("__r.__b"))
    for k in keys:
        cond = cond & (F.col(f"__l.{k}") == F.col(f"__r.{k}"))
    # residual overlap + canonical-bucket dedup (emit where the
    # overlap STARTS, exactly one bucket per matching pair)
    cond = (cond
            & (ls < re_) & (rs < le)
            & (F.col("__l.__b")
               == F.floor(F.greatest(ls, rs) / F.lit(bucket_width))
                   .cast("bigint")))
    out = l.join(r, cond, "inner").drop(F.col("__l.__b")).drop(F.col("__r.__b"))
    for k in keys:
        out = out.drop(F.col(f"__r.{k}"))
    return out


def funnel(df, steps, user_col: str = "user_id", ts_col: str = "ts",
           type_col: str = "event_type"):
    """Ordered funnel analysis (round 11 — the product-analytics
    staple the reference's event tooling stops short of): for the step
    sequence ``steps``, a user completes step i+1 only with an event
    of that type AT OR AFTER their step-i completion time, so
    out-of-order events never count (the mistake naive
    min-per-type pivots make: a click BEFORE the first view is not a
    converted click).

    Returns one row per step: (step, step_index, n_users,
    conversion_overall, conversion_from_prev) — rates rounded 6.

    Scale shape: step i+1 is ONE conditional aggregation of the events
    table against the per-user step-i completion times (a user-keyed
    join — the completion table is |users|, far below |events|, and
    AQE broadcasts it when it fits).  Each step's completion table is
    localCheckpoint-ed before its count, so counting step i and
    building step i+1 both start from the materialized |users|-sized
    table instead of re-executing steps 1..i-1's filters and joins —
    funnel depth = number of passes over events, exactly d scans for
    depth d (without the checkpoint the chained lineage re-runs,
    O(d²) scans).  Each pass is map-side combined on user_id; no
    windows, no per-user event sorting, no event-list collection.
    """
    if not steps or len(set(steps)) != len(steps):
        raise ValueError(f"steps must be non-empty and distinct: {steps}")
    uid = validate_identifier(user_col)
    tsc = validate_identifier(ts_col)
    tyc = validate_identifier(type_col)
    spark = df.sparkSession

    ev = df.select(F.col(uid).alias("__u"), F.col(tsc).alias("__ts"),
                   F.col(tyc).alias("__ty")).filter(F.col("__ts").isNotNull())
    # completion times per user, sequentially gated; each step's
    # |users|-sized completion table is materialized (localCheckpoint)
    # so its count AND the next step's join read it instead of
    # re-executing the whole chain — d scans of events for depth d
    completed = (ev.filter(F.col("__ty") == steps[0])
                 .groupBy("__u").agg(F.min("__ts").alias("__t"))
                 .localCheckpoint())
    counts = [completed.count()]
    for step in steps[1:]:
        completed = (ev.filter(F.col("__ty") == step)
                     .join(completed, "__u")
                     .filter(F.col("__ts") >= F.col("__t"))
                     .groupBy("__u").agg(F.min("__ts").alias("__t"))
                     .localCheckpoint())
        counts.append(completed.count())
    first = counts[0]
    rows = []
    for i, (step, n) in enumerate(zip(steps, counts)):
        prev = counts[i - 1] if i else n
        rows.append((step, i,  n,
                     round(n / first, 6) if first else None,
                     round(n / prev, 6) if prev else None))
    return local_df(
        spark, rows, "step string, step_index int, n_users bigint, "
              "conversion_overall double, conversion_from_prev double")


def retention_cohorts(df, cohort_type: str = "signup",
                      user_col: str = "user_id", ts_col: str = "ts",
                      type_col: str = "event_type",
                      period_days: int = 7):
    """Cohort retention (round 11, funnel's sibling): users cohort by
    the period of their FIRST ``cohort_type`` event; a cohort member
    is retained in offset k when they have ANY event in the k-th
    period after their cohort period.  Returns (cohort_epoch,
    period_offset, n_active, cohort_size, retention_rate) — the
    triangle a growth dashboard plots.

    Periods are fixed-width windows of ``period_days`` anchored at the
    epoch (floor(epoch_seconds/period)), so cohort identity is a pure
    per-row function — no calendar UDF, everything codegen.  Two
    aggregations + one user-keyed join: first-event per user (map-side
    combined), then distinct (cohort, offset, user) activity counts;
    negative offsets (activity before the cohort event) are excluded.
    """
    if period_days < 1:
        raise ValueError(f"period_days must be >= 1, got {period_days}")
    uid = validate_identifier(user_col)
    tsc = validate_identifier(ts_col)
    tyc = validate_identifier(type_col)
    width = float(period_days * 86400)

    period = lambda c: F.floor(epoch_seconds(c) / F.lit(width))  # noqa: E731
    ev = df.select(F.col(uid).alias("__u"), F.col(tsc).alias("__ts"),
                   F.col(tyc).alias("__ty")).filter(F.col("__ts").isNotNull())
    cohort = (ev.filter(F.col("__ty") == cohort_type)
              .groupBy("__u")
              .agg(F.min(period(F.col("__ts"))).alias("__cp")))
    sizes = cohort.groupBy("__cp").agg(
        F.count(F.lit(1)).alias("cohort_size"))
    activity = (ev.join(cohort, "__u")
                .withColumn("__off",
                            (period(F.col("__ts")) - F.col("__cp"))
                            .cast("bigint"))
                .filter(F.col("__off") >= 0)
                .groupBy("__cp", "__off")
                .agg(F.count_distinct("__u").alias("n_active")))
    return (activity.join(sizes, "__cp")
            .select((F.col("__cp").cast("bigint") * F.lit(int(width))
                     .cast("bigint")).alias("cohort_epoch"),
                    F.col("__off").alias("period_offset"),
                    "n_active",
                    "cohort_size",
                    F.round(F.col("n_active") / F.col("cohort_size"), 6)
                    .alias("retention_rate"))
            .orderBy("cohort_epoch", "period_offset"))


def event_transitions(df, user_col: str = "user_id", ts_col: str = "ts",
                      type_col: str = "event_type",
                      min_count: int = 1):
    """First-order Markov transition report over per-user event
    streams (funnel's exploratory sibling — funnel checks ONE ordered
    path, this surfaces ALL of them): for each observed (from_type,
    to_type) of CONSECUTIVE events within a user's timeline, the
    transition count and P(to | from).  The output is what picks the
    funnel steps worth gating, and a sudden new high-mass transition
    (view→error) is an incident signature.

    One LAG window per user (partitioned by user — Spark's windowed
    shuffle keys on user_id, so no global sort) + one (from, to)
    groupBy; ties at identical timestamps order by event id when
    present, else by type, so the report is deterministic.
    ``min_count`` drops the long tail of one-off transitions.
    """
    from pyspark.sql import Window

    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    uid = validate_identifier(user_col)
    tsc = validate_identifier(ts_col)
    tyc = validate_identifier(type_col)
    tie = "event_id" if "event_id" in df.columns else tyc
    ev = df.select(F.col(uid).alias("__u"), F.col(tsc).alias("__ts"),
                   F.col(tyc).alias("__ty"), F.col(tie).alias("__tie")) \
           .filter(F.col("__ts").isNotNull())
    w = Window.partitionBy("__u").orderBy("__ts", "__tie")
    pairs = (ev.withColumn("__next", F.lead("__ty").over(w))
             .filter(F.col("__next").isNotNull())
             .groupBy(F.col("__ty").alias("from_type"),
                      F.col("__next").alias("to_type"))
             .agg(F.count(F.lit(1)).alias("n")))
    wfrom = Window.partitionBy("from_type")
    return (pairs.withColumn("p_next",
                             F.round(F.col("n") / F.sum("n").over(wfrom), 6))
            .filter(F.col("n") >= int(min_count))
            .orderBy("from_type", F.desc("n"), "to_type"))
