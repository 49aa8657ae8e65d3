"""Pure-Python core: assertions, logical operators, levels.

Mirrors the reference's inline unit tests (assertion.rs:84-129,
core/logical.rs tests) — no Spark needed.
"""

import pytest

from term_spark import Assertion, Level, LogicalOperator
from term_spark.functions.security import (SecurityError, validate_identifier,
                                           validate_regex_pattern,
                                           validate_sql_expression)


def test_assertion_epsilon_equality():
    assert Assertion.eq(1.0).evaluate(1.0 + 1e-12)
    assert not Assertion.eq(1.0).evaluate(1.0 + 1e-9)
    assert Assertion.ne(1.0).evaluate(1.1)


def test_assertion_comparisons():
    assert Assertion.gt(5).evaluate(5.1)
    assert not Assertion.gt(5).evaluate(5.0)
    assert Assertion.ge(5).evaluate(5.0)
    assert Assertion.lt(5).evaluate(4.9)
    assert Assertion.le(5).evaluate(5.0)
    assert Assertion.between(1, 2).evaluate(1.5)
    assert not Assertion.between(1, 2).evaluate(2.5)
    assert Assertion.not_between(1, 2).evaluate(2.5)


def test_assertion_coerce():
    assert Assertion.coerce(0.9).op == "eq"
    assert Assertion.coerce(lambda v: v > 3).evaluate(4)
    a = Assertion.ge(0.5)
    assert Assertion.coerce(a) is a


def test_logical_operators():
    assert LogicalOperator.all().evaluate([True, True])
    assert not LogicalOperator.all().evaluate([True, False])
    assert LogicalOperator.any().evaluate([False, True])
    assert LogicalOperator.exactly(2).evaluate([True, True, False])
    assert LogicalOperator.at_least(1).evaluate([True, False])
    assert LogicalOperator.at_most(1).evaluate([True, False])
    # vacuous truth on empty input (logical.rs:70-78)
    assert LogicalOperator.all().evaluate([])
    assert not LogicalOperator.any().evaluate([])


def test_levels():
    assert Level.ERROR.fails_suite
    assert not Level.WARNING.fails_suite
    assert not Level.INFO.fails_suite


def test_security_identifier():
    assert validate_identifier("l_quantity") == "l_quantity"
    for bad in ["a;b", "a b", "a'b", "1abc", "", "a--b", "`x`"]:
        with pytest.raises(SecurityError):
            validate_identifier(bad)


def test_security_sql_expression():
    assert validate_sql_expression("l_quantity > 0")
    for bad in ["x > 0; DROP TABLE t", "x > 0 -- c", "DELETE FROM t",
                "x > 0 /* c */", "drop table t"]:
        with pytest.raises(SecurityError):
            validate_sql_expression(bad)


def test_security_regex():
    assert validate_regex_pattern(r"^\d+$")
    with pytest.raises(SecurityError):
        validate_regex_pattern(r"(a+)+b")
    with pytest.raises(SecurityError):
        validate_regex_pattern("(unclosed")


def test_annotate_rows_tags_each_violation(spark):
    from term_spark import Assertion, Check, Level, annotate_rows
    df = spark.createDataFrame(
        [(1, "A", 5.0), (2, None, 5.0), (3, "X", 5.0), (4, "A", -1.0),
         (5, None, -2.0)],
        "id long, flag string, v double")
    check = (Check("rows", Level.ERROR)
             .is_complete("flag")
             .is_contained_in("flag", ["A", "B"])
             .value_range("v", 0.0, 10.0)
             .satisfies("id > 0", 1.0))
    out = {r["id"]: r for r in annotate_rows(df, check).collect()}
    assert out[1]["__passed"] and out[1]["__violations"] == []
    # NULL flag: fails completeness AND containment (NULL not allowed)
    assert set(out[2]["__violations"]) == {"completeness(flag)",
                                          "contained_in(flag)"}
    assert out[3]["__violations"] == ["contained_in(flag)"]
    assert out[4]["__violations"] == ["value_range(v)"]
    assert set(out[5]["__violations"]) == {"completeness(flag)",
                                          "contained_in(flag)",
                                          "value_range(v)"}


def test_quarantine_rows_split_and_where_scope(spark):
    from term_spark import Check, Level, quarantine_rows
    df = spark.createDataFrame(
        [(1, "prod", 5.0), (2, "prod", -1.0), (3, "test", -9.0)],
        "id long, env string, v double")
    # scope: only prod rows are validated; the test row passes vacuously
    check = (Check("q", Level.ERROR, where="env = 'prod'")
             .value_range("v", 0.0, 10.0))
    good, bad = quarantine_rows(df, check)
    assert sorted(r["id"] for r in good.collect()) == [1, 3]
    bad_rows = bad.collect()
    assert [r["id"] for r in bad_rows] == [2]
    assert bad_rows[0]["__violations"] == ["value_range(v)"]
    assert "__passed" not in bad.columns and "__violations" in bad.columns
    assert "__violations" not in good.columns


def test_annotate_rows_rejects_aggregate_only_checks(spark):
    import pytest
    from term_spark import Assertion, Check, Level, annotate_rows
    df = spark.createDataFrame([(1.0,)], "v double")
    agg_only = Check("a", Level.ERROR).has_mean("v", Assertion.gt(0))
    with pytest.raises(ValueError, match="no row-expressible"):
        annotate_rows(df, agg_only)


def test_annotate_rows_is_map_only(spark, tpch):
    from term_spark import Check, Level, annotate_rows
    from term_spark.plans.audit import plan_text
    check = (Check("m", Level.ERROR)
             .is_complete("l_quantity")
             .value_range("l_discount", 0.0, 0.1)
             .has_length_between("l_returnflag", 1, 1))
    text = plan_text(annotate_rows(tpch["lineitem"], check))
    assert "Exchange" not in text    # pure projection, pipelines free
