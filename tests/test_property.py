"""Property-based tests (hypothesis) — the reference's pattern
(tests/property_tests.rs:16-41): generate data with controlled
null-fraction / match-rate, compute the expected metric independently
in Python, compare exactly (fp tolerance where float arithmetic is
involved). Categories: completeness, size, statistics (n−1 stddev),
patterns with controlled match rates, uniqueness, multi-constraint
suite consistency.
"""

import math
import statistics

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from term_spark import Assertion, Check, Level, Status, ValidationSuite

SET = settings(max_examples=12, deadline=None,
               suppress_health_check=[HealthCheck.function_scoped_fixture])


def run_metric(spark, df, check):
    result = ValidationSuite.builder("prop").with_check(check).run(spark, df)
    return result.report.outcomes[0].result


@given(values=st.lists(st.one_of(st.none(), st.floats(allow_nan=False,
                                                      allow_infinity=False,
                                                      width=32)),
                       min_size=1, max_size=60))
@SET
def test_completeness_matches_python(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "x double")
    expected = sum(1 for v in values if v is not None) / len(values)
    res = run_metric(spark, df, Check("c").completeness("x", Assertion.between(0, 1)))
    assert res.metric == pytest.approx(expected, abs=1e-12)


@given(values=st.lists(st.floats(min_value=-1e6, max_value=1e6,
                                 allow_nan=False), min_size=2, max_size=50))
@SET
def test_stddev_is_sample_stddev(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "x double")
    expected = statistics.stdev(values)  # n−1, like the reference pins
    res = run_metric(spark, df,
                     Check("c").has_standard_deviation("x", Assertion.ge(0)))
    if math.isclose(expected, 0.0, abs_tol=1e-12):
        assert (res.metric or 0.0) == pytest.approx(0.0, abs=1e-9)
    else:
        assert res.metric == pytest.approx(expected, rel=1e-9)


@given(n_match=st.integers(0, 30), n_miss=st.integers(0, 30))
@SET
def test_format_match_rate_controlled(spark, n_match, n_miss):
    if n_match + n_miss == 0:
        return
    rows = [("a@x.com",)] * n_match + [("not-an-email",)] * n_miss
    df = spark.createDataFrame(rows, "email string")
    expected = n_match / (n_match + n_miss)
    res = run_metric(spark, df,
                     Check("c").validates_email("email", Assertion.between(0, 1)))
    assert res.metric == pytest.approx(expected, abs=1e-12)


@given(dup_groups=st.lists(st.integers(1, 5), min_size=1, max_size=20))
@SET
def test_uniqueness_and_uvr_match_python(spark, dup_groups):
    rows = []
    for gi, count in enumerate(dup_groups):
        rows += [(f"v{gi}",)] * count
    df = spark.createDataFrame(rows, "x string")
    total = sum(dup_groups)
    distinct = len(dup_groups)
    once = sum(1 for c in dup_groups if c == 1)

    res = run_metric(spark, df, Check("c").validates_distinctness(
        "x", Assertion.between(0, 1)))
    assert res.metric == pytest.approx(distinct / total, abs=1e-12)

    res = run_metric(spark, df, Check("c").validates_unique_value_ratio(
        "x", Assertion.between(0, 1)))
    assert res.metric == pytest.approx(once / total, abs=1e-12)


@given(values=st.lists(st.integers(-1000, 1000), min_size=1, max_size=60))
@SET
def test_multi_constraint_consistency(spark, values):
    """All metrics from ONE fused pass must equal independently computed
    values — the scan-sharing must not cross-contaminate metrics."""
    df = spark.createDataFrame([(float(v),) for v in values], "x double")
    n = len(values)
    check = (Check("c", Level.ERROR)
             .has_size(Assertion.eq(n))
             .has_min("x", Assertion.eq(min(values)))
             .has_max("x", Assertion.eq(max(values)))
             .has_sum("x", Assertion.eq(float(sum(values))))
             .has_mean("x", Assertion.custom(
                 lambda m, e=sum(values) / n: math.isclose(m, e, rel_tol=1e-9,
                                                           abs_tol=1e-9),
                 "mean matches"))
             .satisfies("x >= 0", Assertion.eq(
                 sum(1 for v in values if v >= 0) / n)))
    result = ValidationSuite.builder("prop").with_check(check).run(spark, df)
    assert result.passed, result.report.to_json(2)
    assert result.report.num_spark_jobs == 1
