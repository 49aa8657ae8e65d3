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
