"""GroupBy-shaped and join-shaped operators: histogram, entropy, MI,
Spearman, grouped completeness, FK, join coverage, cross-table sum,
max time gap."""

import math

import pytest

from term_spark import Assertion, Check, Level, Status, ValidationSuite
from term_spark.operators.entropy import (entropy_value,
                                          mutual_information_value,
                                          spearman_value)
from term_spark.operators.histogram import compute_histogram


def run(spark, tables, check):
    return ValidationSuite.builder("t").with_check(check).run(spark, tables)


def test_histogram_api(spark, dupes_df):
    hist = compute_histogram(dupes_df, "status")
    assert hist.total_count == 6
    assert hist.ratio_of("ok") == pytest.approx(4 / 6)
    assert hist.bucket_count() == 2
    r = run(spark, {"data": dupes_df}, Check("h", Level.ERROR)
            .has_histogram("status", lambda h: h.most_common_ratio() <= 0.7))
    assert r.passed


def test_entropy_exact(spark):
    # 4×a, 2×b → H = -(2/3 ln 2/3 + 1/3 ln 1/3)
    df = spark.createDataFrame([("a",)] * 4 + [("b",)] * 2, "v string")
    expected = -(2 / 3 * math.log(2 / 3) + 1 / 3 * math.log(1 / 3))
    assert entropy_value(df, "v") == pytest.approx(expected, abs=1e-9)


def test_mutual_information_identical_columns(spark):
    # MI(X;X) == H(X) for categorical passthrough
    df = spark.createDataFrame([("a", "a")] * 3 + [("b", "b")] * 3, "x string, y string")
    mi = mutual_information_value(df, "x", "y")
    assert mi == pytest.approx(math.log(2), abs=1e-9)


def test_spearman_monotonic(spark):
    df = spark.createDataFrame(
        [(float(i), float(i * i)) for i in range(1, 20)], "x double, y double")
    assert spearman_value(df, "x", "y") == pytest.approx(1.0, abs=1e-9)


def test_grouped_completeness(spark):
    rows = [("g1", "v")] * 4 + [("g1", None)] + [("g2", "v")] * 5
    df = spark.createDataFrame(rows, "g string, c string")
    # worst group completeness = 0.8
    r = run(spark, {"data": df}, Check("gc", Level.ERROR)
            .grouped_completeness("c", "g", Assertion.ge(0.8)))
    assert r.passed, r.report.to_json(2)
    r = run(spark, {"data": df}, Check("gc2", Level.ERROR)
            .grouped_completeness("c", "g", Assertion.ge(0.9)))
    assert not r.passed


def test_foreign_key_orphans(spark):
    products = spark.createDataFrame([(1,), (2,), (3,)], "product_id long")
    orders = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 99), (13, 99), (14, None)],
        "order_id long, product_id long")
    tables = {"orders": orders, "products": products}
    r = run(spark, tables, Check("fk", Level.ERROR)
            .foreign_key("orders", "product_id", "products", "product_id"))
    o = r.report.outcomes[0].result
    assert o.status == Status.FAILURE
    assert "2 rows (1 distinct" in o.message
    # clean FK passes
    clean = spark.createDataFrame([(10, 1), (11, 2)], "order_id long, product_id long")
    r = run(spark, {"orders": clean, "products": products},
            Check("fk2", Level.ERROR).foreign_key("orders", "product_id",
                                                  "products", "product_id"))
    assert r.passed


def test_join_coverage_directions(spark):
    left = spark.createDataFrame([(1,), (2,), (3,), (4,)], "k long")
    right = spark.createDataFrame([(3,), (4,), (5,)], "j long")
    tables = {"l": left, "r": right}
    r = run(spark, tables, Check("jc", Level.ERROR)
            .join_coverage("l", "k", "r", "j", Assertion.eq(0.5), "left"))
    assert r.passed, r.report.to_json(2)
    r = run(spark, tables, Check("jc2", Level.ERROR)
            .join_coverage("l", "k", "r", "j", Assertion.eq(2 / 3), "right"))
    assert r.passed
    r = run(spark, tables, Check("jc3", Level.ERROR)
            .join_coverage("l", "k", "r", "j", Assertion.eq(0.5), "bidirectional"))
    assert r.passed


def test_join_coverage_same_column_name(spark):
    """Regression: left and right key columns sharing a name must not
    raise AMBIGUOUS_REFERENCE (keys are aliased per side)."""
    left = spark.createDataFrame([(1,), (2,), (3,), (4,)], "id long")
    right = spark.createDataFrame([(3,), (4,), (5,)], "id long")
    tables = {"l": left, "r": right}
    r = run(spark, tables, Check("jc", Level.ERROR)
            .join_coverage("l", "id", "r", "id", Assertion.eq(0.5), "left"))
    assert r.passed, r.report.to_json(2)
    # failure path exercises the aliased violation-examples join too
    r = run(spark, tables, Check("jc2", Level.ERROR)
            .join_coverage("l", "id", "r", "id", Assertion.eq(1.0), "left"))
    o = r.report.outcomes[0].result
    assert o.status == Status.FAILURE
    assert "unmatched examples" in o.message
    assert "1" in o.message and "2" in o.message


def test_foreign_key_same_column_name(spark):
    """FK with identically-named child/parent key columns."""
    parent = spark.createDataFrame([(1,), (2,)], "id long")
    child = spark.createDataFrame([(1,), (2,), (9,)], "id long")
    r = run(spark, {"c": child, "p": parent},
            Check("fk", Level.ERROR).foreign_key("c", "id", "p", "id"))
    o = r.report.outcomes[0].result
    assert o.status == Status.FAILURE
    assert "1 rows (1 distinct" in o.message


def test_cross_table_sum(spark):
    a = spark.createDataFrame([(1, 10.0), (1, 5.0), (2, 7.0)], "k long, v double")
    b = spark.createDataFrame([(1, 15.0), (2, 7.5)], "k long, v double")
    tables = {"a": a, "b": b}
    # ungrouped: 22 vs 22.5 → diff 0.5
    r = run(spark, tables, Check("s", Level.ERROR)
            .cross_table_sum("a", "v", "b", "v", tolerance=1.0))
    assert r.passed
    r = run(spark, tables, Check("s2", Level.ERROR)
            .cross_table_sum("a", "v", "b", "v", tolerance=0.1))
    assert not r.passed
    # grouped: group 1 matches, group 2 differs by 0.5
    r = run(spark, tables, Check("s3", Level.ERROR)
            .cross_table_sum("a", "v", "b", "v", tolerance=0.1, group_by=("k", "k")))
    o = r.report.outcomes[0].result
    assert o.status == Status.FAILURE and o.metric == 1.0


def test_cross_table_sum_null_keys_one_group_both_plans(spark):
    """NULL-key semantic is pinned to SQL GROUP BY (NULL is ONE group)
    on BOTH plans: the union-tag fast path (matching key types) and the
    null-safe full-outer-join fallback (mismatched key types) must
    return the same verdict on the same data — NULL sums compare
    against each other, never against 0."""
    from term_spark.core.constraint import EngineContext
    from term_spark.operators.multitable import CrossTableSumConstraint

    rows_a = [(1, 10.0), (None, 5.0), (None, 3.0)]
    rows_b = [(1, 10.0), (None, 8.0)]
    # same key types -> union-tag fast path
    a = spark.createDataFrame(rows_a, "k long, v double")
    b = spark.createDataFrame(rows_b, "k long, v double")
    fast = CrossTableSumConstraint("a", "v", "b", "v", tolerance=0.1,
                                   group_by=("k", "k")).evaluate(
        EngineContext(spark, {"a": a, "b": b}, "a"))
    # mismatched key types (long vs int) -> join fallback
    b_int = spark.createDataFrame(rows_b, "k int, v double")
    slow = CrossTableSumConstraint("a", "v", "b", "v", tolerance=0.1,
                                   group_by=("k", "k")).evaluate(
        EngineContext(spark, {"a": a, "b": b_int}, "a"))
    # NULL group: 5+3=8 vs 8 -> match; group 1: 10 vs 10 -> match
    assert fast.status == Status.SUCCESS
    assert slow.status == fast.status and slow.metric == fast.metric

    # and when the NULL groups DISAGREE, both plans flag exactly one
    # violating group (the NULL one), not two phantom vs-zero rows
    b2 = [(1, 10.0), (None, 99.0)]
    for schema in ("k long, v double", "k int, v double"):
        c = CrossTableSumConstraint("a", "v", "b", "v", tolerance=0.1,
                                    group_by=("k", "k"))
        res = c.evaluate(EngineContext(
            spark, {"a": a, "b": spark.createDataFrame(b2, schema)}, "a"))
        assert res.status == Status.FAILURE and res.metric == 1.0
        assert len(c.violating_groups) == 1
        assert c.violating_groups[0]["grp"] is None


def test_cross_table_sum_and_bidirectional_coverage_single_action(
        spark, monkeypatch):
    """Success path = ONE driver action (the reference computes both
    scalar sums in a single statement, cross_table_sum.rs:202-213, and
    both coverage directions in one query). Counts DataFrame.collect
    calls — one collect == one query submission; AQE may split it into
    several Spark jobs internally, which is fine."""
    from term_spark.core.constraint import EngineContext
    from term_spark.operators.multitable import (CrossTableSumConstraint,
                                                 JoinCoverageConstraint)

    a = spark.createDataFrame([(1, 10.0), (1, 5.0), (2, 7.0)], "k long, v double")
    b = spark.createDataFrame([(1, 15.0), (2, 7.5)], "k long, v double")
    ctx = EngineContext(spark, {"a": a, "b": b}, "a")

    calls = []
    # patch the CONCRETE class (pyspark 4's runtime DataFrame subclasses
    # the public pyspark.sql.DataFrame and overrides collect)
    cls = type(a)
    orig = cls.collect
    monkeypatch.setattr(cls, "collect",
                        lambda self: calls.append(1) or orig(self))

    res = CrossTableSumConstraint("a", "v", "b", "v", tolerance=1.0).evaluate(ctx)
    assert res.status == Status.SUCCESS and len(calls) == 1

    calls.clear()
    res = JoinCoverageConstraint("a", "k", "b", "k", Assertion.eq(1.0),
                                 "bidirectional").evaluate(ctx)
    assert res.status == Status.SUCCESS and len(calls) == 1


def test_join_coverage_empty_side(spark):
    """A direction with zero source rows yields no group in the
    single-query agg — treated as rate 1.0; both sides empty skips."""
    left = spark.createDataFrame([(1,), (2,)], "k long")
    empty = spark.createDataFrame([], "j long")
    tables = {"l": left, "r": empty}
    # right direction: empty source → vacuous 1.0; left: 0 matched
    r = run(spark, tables, Check("jc", Level.ERROR)
            .join_coverage("l", "k", "r", "j", Assertion.eq(0.0), "left"))
    assert r.passed, r.report.to_json(2)
    r = run(spark, tables, Check("jc2", Level.ERROR)
            .join_coverage("l", "k", "r", "j", Assertion.eq(0.0), "bidirectional"))
    assert r.passed, r.report.to_json(2)
    r = run(spark, {"l": empty.selectExpr("j as k"), "r": empty},
            Check("jc3", Level.ERROR)
            .join_coverage("l", "k", "r", "j", Assertion.eq(1.0), "left"))
    assert r.report.outcomes[0].result.status == Status.SKIPPED


def test_max_time_gap(spark):
    rows = [("d1", "2024-01-01 00:00:00"), ("d1", "2024-01-01 00:01:00"),
            ("d1", "2024-01-01 02:00:00"),  # 119-minute gap
            ("d2", "2024-01-01 00:00:00"), ("d2", "2024-01-01 00:00:30")]
    df = spark.createDataFrame(rows, "dev string, ts string") \
        .selectExpr("dev", "cast(ts as timestamp) ts")
    r = run(spark, {"data": df}, Check("g", Level.ERROR)
            .has_max_time_gap("ts", 3600, group_by="dev",
                              assertion=Assertion.eq(1 / 3)))
    assert r.passed, r.report.to_json(2)


def test_tpch_referential_integrity(spark, tpch):
    suite = (ValidationSuite.builder("ri")
             .with_check(Check("fk", Level.ERROR)
                         .foreign_key("orders", "o_custkey", "customer", "c_custkey")
                         .foreign_key("lineitem", "l_orderkey", "orders", "o_orderkey")
                         .foreign_key("nation", "n_regionkey", "region", "r_regionkey")
                         .join_coverage("lineitem", "l_orderkey", "orders",
                                        "o_orderkey", Assertion.eq(1.0), "left")))
    r = suite.run(spark, tpch)
    assert r.passed, r.report.to_json(2)


def test_asof_join_backward_with_ties_and_tolerance(spark):
    from term_spark.operators.temporal import asof_join

    trades = spark.createDataFrame(
        [(1, 10.0, "buy"), (1, 20.0, "sell"), (1, 35.0, "buy"), (2, 5.0, "buy")],
        "uid long, t double, side string")
    quotes = spark.createDataFrame(
        [(1, 9.0, 100.0), (1, 20.0, 105.0), (1, 30.0, 110.0), (2, 9.0, 50.0)],
        "uid long, t double, px double")

    out = {(r["uid"], r["t"]): (r["t_r"], r["px_r"])
           for r in asof_join(trades, quotes, on="uid",
                              left_ts="t", right_ts="t").collect()}
    assert out[(1, 10.0)] == (9.0, 100.0)
    assert out[(1, 20.0)] == (20.0, 105.0)   # tie matches (<=)
    assert out[(1, 35.0)] == (30.0, 110.0)
    assert out[(2, 5.0)] == (None, None)     # left-outer: no prior quote

    tol = {(r["uid"], r["t"]): r["px_r"]
           for r in asof_join(trades, quotes, on="uid", left_ts="t",
                              right_ts="t", tolerance_seconds=2.0).collect()}
    assert tol[(1, 10.0)] == 100.0
    assert tol[(1, 35.0)] is None            # 5s gap > 2s tolerance


def test_asof_join_payload_tiebreak_matches_preagg(spark):
    """tiebreak_on_payload resolves equal right timestamps to the MAX
    payload struct — the same winner a groupBy(key, ts).max(payload)
    pre-aggregation picks — so dropping the pre-agg (the r15 asof
    optimization) cannot change any matched row."""
    import pyspark.sql.functions as F

    from term_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(100, 1, 10.0), (101, 1, 20.0), (102, 2, 7.0)],
        "event_id long, uid long, t double")
    # planted ties: uid=1 has THREE right rows at t=10.0 (ids 3,9,5)
    # and two at t=5.0; uid=2 one tie pair at t=7.0
    right = spark.createDataFrame(
        [(1, 5.0, 1), (1, 5.0, 2), (1, 10.0, 3), (1, 10.0, 9),
         (1, 10.0, 5), (2, 7.0, 4), (2, 7.0, 8)],
        "uid long, t double, rid long")

    tie = {r["event_id"]: (r["t_r"], r["rid_r"])
           for r in asof_join(left, right, on="uid", left_ts="t",
                              right_ts="t",
                              tiebreak_on_payload=True).collect()}
    pre = right.groupBy("uid", "t").agg(F.max("rid").alias("rid"))
    agg = {r["event_id"]: (r["t_r"], r["rid_r"])
           for r in asof_join(left, pre, on="uid", left_ts="t",
                              right_ts="t").collect()}
    assert tie == agg
    assert tie[100] == (10.0, 9)   # max rid among the t=10.0 ties
    assert tie[102] == (7.0, 8)


def test_asof_join_keeps_left_row_count(spark, tpch):
    """As-of join is 1:1 with the left side by construction — no
    fan-out, unlike a naive range join."""
    from term_spark.operators.temporal import asof_join
    e = tpch["events"]
    clicks = e.filter("event_type = 'click'").select("event_id", "user_id", "ts")
    errors = e.filter("event_type = 'error'").select("user_id", "ts", "value")
    joined = asof_join(clicks, errors, on="user_id")
    assert joined.count() == clicks.count()


def test_range_join_matches_nested_loop_and_avoids_nlj(spark):
    from term_spark.operators.temporal import range_join
    from term_spark.plans.audit import plan_text

    points = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "pid long, v double")
    # overlapping bands of differing widths, plus an empty one
    intervals = spark.createDataFrame(
        [(0, 0.0, 30.0), (1, 20.0, 45.0), (2, 40.0, 41.0), (3, 200.0, 250.0)],
        "band long, lo double, hi double")

    got = sorted((r["pid"], r["band"]) for r in
                 range_join(points, intervals, "v", "lo", "hi", 10.0).collect())
    naive = sorted((r["pid"], r["band"]) for r in
                   points.join(intervals, (points["v"] >= intervals["lo"]) &
                               (points["v"] < intervals["hi"])).collect())
    assert got == naive and got

    text = plan_text(range_join(points, intervals, "v", "lo", "hi", 10.0))
    assert "BroadcastNestedLoopJoin" not in text   # equi-join on bucket
    assert "CartesianProduct" not in text
    naive_text = plan_text(points.join(
        intervals, (points["v"] >= intervals["lo"]) &
        (points["v"] < intervals["hi"])))
    # what we avoided: Spark plans a pure inequality join as an
    # all-pairs strategy
    assert ("BroadcastNestedLoopJoin" in naive_text
            or "CartesianProduct" in naive_text)


def test_range_join_left_keeps_unmatched_points(spark):
    """how='left' must null-extend unmatched points — including points
    whose bucket collides with an interval but fail the range predicate
    (the case a post-join filter silently drops)."""
    import pytest
    from term_spark.operators.temporal import range_join

    points = spark.createDataFrame(
        [(0, 5.0),    # inside band 0
         (1, 9.5),    # same bucket as band 0's tail, but >= hi -> unmatched
         (2, 500.0)], # no interval anywhere near
        "pid long, v double")
    intervals = spark.createDataFrame(
        [(0, 0.0, 9.0)], "band long, lo double, hi double")

    rows = {r["pid"]: r for r in
            range_join(points, intervals, "v", "lo", "hi", 10.0,
                       how="left").collect()}
    assert set(rows) == {0, 1, 2}
    assert rows[0]["band"] == 0
    assert rows[1]["band"] is None and rows[2]["band"] is None

    # inner mode unchanged
    inner = range_join(points, intervals, "v", "lo", "hi", 10.0).collect()
    assert [(r["pid"], r["band"]) for r in inner] == [(0, 0)]

    # exploded-interval side cannot express right/full semantics
    with pytest.raises(ValueError, match="right/full"):
        range_join(points, intervals, "v", "lo", "hi", 10.0, how="full")


def test_interval_join_matches_nested_loop_exactly_once(spark):
    """interval_join must equal the brute-force inequality join —
    including pairs spanning MANY shared buckets (the canonical-bucket
    rule must emit each exactly once) — and must not plan an
    all-pairs strategy."""
    from term_spark.operators.temporal import interval_join
    from term_spark.plans.audit import plan_text

    left = spark.createDataFrame(
        [(0, 0.0, 100.0),     # long: spans 10 buckets
         (1, 5.0, 7.0),       # short, inside bucket 0
         (2, 95.0, 105.0),    # straddles
         (3, 300.0, 301.0),   # isolated
         (4, 50.0, 50.0),     # empty: dropped
         (5, 60.0, 40.0)],    # inverted: dropped
        "lid long, ls double, le double")
    right = spark.createDataFrame(
        [(0, 90.0, 200.0),    # overlaps lid 0 and 2 across many buckets
         (1, 6.0, 6.5),       # inside lid 1
         (2, 100.0, 100.5),   # touches lid 0's end: half-open, no match
         (3, 299.0, 300.5)],
        "rid long, rs double, re double")

    got = sorted((r["lid"], r["rid"]) for r in interval_join(
        left, right, "ls", "le", "rs", "re", bucket_width=10.0).collect())
    naive = sorted((r["lid"], r["rid"]) for r in
                   left.filter("ls < le").join(
                       right.filter("rs < re"),
                       (left["ls"] < right["re"]) &
                       (right["rs"] < left["le"])).collect())
    assert got == naive and got
    assert got == sorted(set(got))            # exactly-once, no bucket dups
    assert (0, 0) in got and (2, 0) in got    # the many-bucket pairs
    assert (0, 2) not in got                  # half-open boundary

    text = plan_text(interval_join(left, right, "ls", "le", "rs", "re",
                                   bucket_width=10.0))
    assert "BroadcastNestedLoopJoin" not in text
    assert "CartesianProduct" not in text


def test_interval_join_keys_scope_the_match(spark):
    from term_spark.operators.temporal import interval_join
    left = spark.createDataFrame(
        [("u1", 0, 0.0, 10.0), ("u2", 1, 0.0, 10.0)],
        "user string, lid long, ls double, le double")
    right = spark.createDataFrame(
        [("u1", 0, 5.0, 15.0), ("u3", 1, 5.0, 15.0)],
        "user string, rid long, rs double, re double")
    got = [(r["user"], r["lid"], r["rid"]) for r in interval_join(
        left, right, "ls", "le", "rs", "re", 10.0, keys=["user"]).collect()]
    assert got == [("u1", 0, 0)]              # same-key overlap only
    import pytest as _pt
    with _pt.raises(ValueError):
        interval_join(left, right, "ls", "le", "rs", "re", 0.0)


def test_functional_dependency_constraint_and_check(spark):
    from term_spark import Assertion, Check, Level, ValidationSuite
    from term_spark.operators.uniqueness import functional_dependency_summary
    rows = [("94110", "CA"), ("94110", "CA"), ("10001", "NY"),
            ("10001", "NY"), ("60601", "IL"),
            ("73301", "TX"), ("73301", None),      # NULL dep conforms
            (None, "WA"),                           # NULL det excluded
            ("30301", "GA"), ("30301", "FL")]       # genuine violation
    df = spark.createDataFrame(rows, "zip string, state string")
    row = functional_dependency_summary(df, ["zip"], "state").collect()[0]
    assert row["n_groups"] == 5 and row["n_violating"] == 1
    assert row["conformance"] == 0.8

    ok = ValidationSuite.builder("fd").with_check(
        Check("fd", Level.ERROR).has_functional_dependency(
            ["zip"], "state", Assertion.ge(0.8))).run(spark, df)
    assert ok.passed
    bad = ValidationSuite.builder("fd").with_check(
        Check("fd", Level.ERROR).has_functional_dependency(
            ["zip"], "state")).run(spark, df)   # default: must hold exactly
    assert not bad.passed
    assert "1 of 5 determinant groups" in \
        [x.message for x in bad.report.issues][0]

    # empty determinant set -> skipped, not a crash
    from term_spark.core.result import Status
    empty = spark.createDataFrame([(None, "x")], "zip string, state string")
    sk = ValidationSuite.builder("fd").with_check(
        Check("fd", Level.ERROR).has_functional_dependency(
            ["zip"], "state")).run(spark, empty)
    assert Status.SKIPPED in [o.result.status for o in sk.report.outcomes]


def test_dataset_diff_counts_and_null_safety(spark):
    from term_spark.operators.multitable import dataset_diff
    left = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, None, 3.0), (4, "d", 4.0),
         (4, "d", 4.0)],                         # duplicate key in left
        "k long, s string, v double")
    right = spark.createDataFrame(
        [(1, "a", 1.0),            # identical
         (2, "b", 99.0),           # changed value
         (3, "", 3.0),             # NULL -> empty string IS a change
         (5, "e", 5.0)],           # added; key 4 removed
        "k long, s string, v double")
    row = dataset_diff(left, right, "k").collect()[0]
    assert row["n_left"] == 5 and row["n_right"] == 4
    assert row["n_common"] == 3
    assert row["n_added"] == 1 and row["n_removed"] == 1
    assert row["n_changed"] == 2          # value change + null-vs-empty
    assert row["n_identical"] == 1
    # duplicate-key drift is visible: n_left != n_common + n_removed
    assert row["n_left"] != row["n_common"] + row["n_removed"]

    import pytest as _pt
    with _pt.raises(ValueError, match="no columns"):
        dataset_diff(left.select("k"), right.select("k"), "k")


def test_dataset_diff_null_key_is_common_not_added_plus_removed(spark):
    """Key matching is NULL-SAFE (r7 fix; since r8 implemented as a
    null-safe injective key-tuple fingerprint that the sides group and
    equi-join on): a key NULL on both sides pairs up as ONE common row
    — identical or changed by its compared columns — never as one
    added plus one removed the way plain equality / SQL USING would
    count it."""
    from term_spark.operators.multitable import dataset_diff

    left = spark.createDataFrame(
        [(None, "a", 1.0), (1, "b", 2.0)], "k long, s string, v double")

    # NULL key, same compared tuple -> common + identical
    right_same = spark.createDataFrame(
        [(None, "a", 1.0), (1, "b", 2.0)], "k long, s string, v double")
    row = dataset_diff(left, right_same, "k").collect()[0]
    assert row["n_common"] == 2 and row["n_added"] == 0 == row["n_removed"]
    assert row["n_identical"] == 2 and row["n_changed"] == 0

    # NULL key, different compared tuple -> common + changed
    right_diff = spark.createDataFrame(
        [(None, "a", 9.0), (1, "b", 2.0)], "k long, s string, v double")
    row = dataset_diff(left, right_diff, "k").collect()[0]
    assert row["n_common"] == 2 and row["n_added"] == 0 == row["n_removed"]
    assert row["n_changed"] == 1 and row["n_identical"] == 1

    # NULL key on one side only -> added/removed as usual
    row = dataset_diff(
        left, spark.createDataFrame([(1, "b", 2.0)],
                                    "k long, s string, v double"),
        "k").collect()[0]
    assert row["n_removed"] == 1 and row["n_added"] == 0
    assert row["n_common"] == 1

    # composite keys: NULL in one component still pairs null-safely
    l2 = spark.createDataFrame(
        [(1, None, "x"), (1, 2, "y")], "a long, b long, s string")
    r2 = spark.createDataFrame(
        [(1, None, "x2"), (1, 2, "y")], "a long, b long, s string")
    row = dataset_diff(l2, r2, ["a", "b"]).collect()[0]
    assert row["n_common"] == 2 and row["n_added"] == 0 == row["n_removed"]
    assert row["n_changed"] == 1 and row["n_identical"] == 1

    # the key fingerprint is INJECTIVE (JSON-escaped): composite key
    # components containing the legacy marker bytes cannot alias
    # across boundaries, and a literal "\x02" value is not a NULL
    l3 = spark.createDataFrame(
        [("x\x01y", "z", 1.0)], "a string, b string, v double")
    r3 = spark.createDataFrame(
        [("x", "y\x01z", 1.0)], "a string, b string, v double")
    row = dataset_diff(l3, r3, ["a", "b"], compare_cols=["v"]).collect()[0]
    assert row["n_common"] == 0
    assert row["n_added"] == 1 and row["n_removed"] == 1
    l4 = spark.createDataFrame([("\x02", 1.0)], "k string, v double")
    r4 = spark.createDataFrame([(None, 1.0)], "k string, v double")
    row = dataset_diff(l4, r4, "k").collect()[0]
    assert row["n_common"] == 0
    assert row["n_added"] == 1 and row["n_removed"] == 1


def test_has_low_churn_gate(spark):
    import pyspark.sql.functions as F
    from term_spark import Check, Level, ValidationSuite
    ref = spark.createDataFrame(
        [(i, f"v{i}") for i in range(100)], "k long, v string")
    small_change = ref.withColumn(
        "v", F.when(F.col("k") < 5, F.lit("changed")).otherwise(F.col("v")))
    rewrite = ref.withColumn("v", F.concat(F.col("v"), F.lit("_new")))
    ok = ValidationSuite.builder("c").with_check(
        Check("c", Level.ERROR).has_low_churn(ref, "k")).run(
        spark, small_change)
    assert ok.passed                      # 5% changed, caps at 20%
    bad = ValidationSuite.builder("c").with_check(
        Check("c", Level.ERROR).has_low_churn(ref, "k")).run(spark, rewrite)
    assert not bad.passed                 # same count, 100% changed
    assert "changed 100.00%" in [x.message for x in bad.report.issues][0]
    import pytest as _pt
    with _pt.raises(ValueError):
        Check("c", Level.ERROR).has_low_churn(ref, "k",
                                              max_changed_ratio=1.5)


def test_key_skew_report_reads_skew_correctly(spark):
    from term_spark.operators.uniqueness import key_skew_report
    even = spark.createDataFrame(
        [(i % 100, i) for i in range(1000)], "k long, v long")
    skewed = spark.createDataFrame(
        [(0, i) for i in range(901)] + [(i, 0) for i in range(1, 100)],
        "k long, v long")
    e = key_skew_report(even, "k").collect()[0]
    assert e["n_rows"] == 1000 and e["n_keys"] == 100
    assert e["max_key_share"] == 0.01
    assert e["key_entropy_norm"] == 1.0      # perfectly even
    assert e["count_cv"] == 0.0
    sk = key_skew_report(skewed, "k").collect()[0]
    assert sk["max_key_share"] == 0.901      # one task owns 90%
    assert sk["top10_share"] > 0.9
    assert sk["key_entropy_norm"] < 0.2
    assert sk["count_cv"] > 5
    # empty input -> NULL metrics, not a crash
    empty = spark.createDataFrame([], "k long, v long")
    z = key_skew_report(empty, "k").collect()[0]
    assert z["n_rows"] == 0 and z["max_key_share"] is None
    import pytest as _pt
    with _pt.raises(ValueError):
        key_skew_report(even, "k", top_k=0)


def test_has_balanced_keys_gate(spark):
    from term_spark import Check, Level, ValidationSuite
    even = spark.createDataFrame(
        [(i % 100, i) for i in range(1000)], "k long, v long")
    skewed = spark.createDataFrame(
        [(0, i) for i in range(901)] + [(i, 0) for i in range(1, 100)],
        "k long, v long")
    ok = ValidationSuite.builder("s").with_check(
        Check("s", Level.ERROR).has_balanced_keys("k")).run(spark, even)
    assert ok.passed
    bad = ValidationSuite.builder("s").with_check(
        Check("s", Level.ERROR).has_balanced_keys("k")).run(spark, skewed)
    assert not bad.passed
    msg = [x.message for x in bad.report.issues][0]
    assert "90.10%" in msg and "salt or bucket" in msg
    import pytest as _pt
    with _pt.raises(ValueError):
        Check("s", Level.ERROR).has_balanced_keys("k", max_key_share=0)
