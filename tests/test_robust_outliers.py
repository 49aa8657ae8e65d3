"""statistics.robust_outlier_summary / RobustOutlierConstraint —
known-value MAD math, edge semantics, fluent wiring.  Oracle parity
for outlier_mad_acctbal runs in test_oracle_parity."""

import pytest

from term_spark import Check, Level, ValidationSuite
from term_spark.operators.statistics import robust_outlier_summary


def _df(spark, vals):
    return spark.createDataFrame([(float(v),) for v in vals], "v double")


def test_mad_known_values_with_planted_outlier(spark):
    row = robust_outlier_summary(
        _df(spark, list(range(1, 10)) + [1000]), "v").collect()[0]
    # median([1..9, 1000]) = 5.5; deviations' median = 2.5
    assert row["median"] == pytest.approx(5.5)
    assert row["mad"] == pytest.approx(2.5)
    # fence = 5.5 ± 3 * 1.4826 * 2.5 -> only 1000 escapes
    assert row["n"] == 10 and row["n_outliers"] == 1
    assert row["outlier_ratio"] == pytest.approx(0.1)


def test_mad_clean_data_has_no_outliers(spark):
    row = robust_outlier_summary(
        _df(spark, list(range(1, 10))), "v").collect()[0]
    assert row["median"] == 5.0 and row["mad"] == 2.0
    assert row["n_outliers"] == 0 and row["outlier_ratio"] == 0.0


def test_mad_constant_column_counts_off_median_rows(spark):
    # MAD 0 -> fence collapses to the median; the documented caveat
    row = robust_outlier_summary(
        _df(spark, [7.0] * 9 + [7.1]), "v").collect()[0]
    assert row["mad"] == 0.0 and row["n_outliers"] == 1


def test_mad_empty_column_raises(spark):
    empty = spark.createDataFrame([(None,)], "v double")
    with pytest.raises(ValueError, match="no non-null rows"):
        robust_outlier_summary(empty, "v")


def test_mad_approx_mode_close_to_exact(spark):
    d = _df(spark, [i % 100 for i in range(1000)])
    exact = robust_outlier_summary(d, "v", mode="exact").collect()[0]
    approx = robust_outlier_summary(d, "v", mode="approx").collect()[0]
    assert approx["median"] == pytest.approx(exact["median"], abs=1.0)
    assert approx["mad"] == pytest.approx(exact["mad"], abs=1.0)
    with pytest.raises(ValueError, match="mode"):
        robust_outlier_summary(d, "v", mode="bogus")


def test_check_has_no_outliers_passes_and_fails(spark):
    clean = _df(spark, list(range(100)))
    dirty = _df(spark, list(range(100)) + [10_000])

    ok = ValidationSuite.builder("outliers").with_check(
        Check("d", Level.ERROR).has_no_outliers("v"))
    assert ok.run(spark, clean).passed

    res = ValidationSuite.builder("outliers").with_check(
        Check("d", Level.ERROR).has_no_outliers("v")).run(spark, dirty)
    assert not res.passed
    msg = [x.message for x in res.report.issues][0]
    assert "1 of 101" in msg and "MAD" in msg

    # a tolerant ratio lets the single outlier through
    tol = ValidationSuite.builder("outliers").with_check(
        Check("d", Level.ERROR).has_no_outliers("v", max_ratio=0.05))
    assert tol.run(spark, dirty).passed


def test_constraint_validates_params(spark):
    with pytest.raises(ValueError, match="k must be"):
        Check("d", Level.ERROR).has_no_outliers("v", k=0)
    with pytest.raises(ValueError, match="max_ratio"):
        Check("d", Level.ERROR).has_no_outliers("v", max_ratio=2.0)
