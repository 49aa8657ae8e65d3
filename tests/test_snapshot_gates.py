"""Round-5 snapshot gates: dominant-value share, schema match vs a
reference snapshot, row-count ratio.  Oracle parity for
dominant_value_orderstatus runs in test_oracle_parity."""

import pytest

from term_spark import Check, Level, ValidationSuite
from term_spark.operators.histogram import dominant_value_summary


def test_dominant_value_summary_known(spark):
    df = spark.createDataFrame(
        [("a",)] * 6 + [("b",)] * 3 + [("c",)] * 1 + [(None,)],
        "v string")
    row = dominant_value_summary(df, "v").collect()[0]
    assert (row["top_value"], row["top_count"], row["total"],
            row["n_distinct"]) == ("a", 6, 10, 3)
    assert row["top_share"] == pytest.approx(0.6)


def test_dominant_value_deterministic_tie_break(spark):
    df = spark.createDataFrame([("a",)] * 3 + [("b",)] * 3, "v string")
    # equal counts -> larger value wins, every run
    assert dominant_value_summary(df, "v").collect()[0]["top_value"] == "b"


def test_check_has_no_dominant_value(spark):
    polluted = spark.createDataFrame(
        [("default",)] * 95 + [(f"v{i}",) for i in range(5)], "v string")
    res = ValidationSuite.builder("dom").with_check(
        Check("d", Level.ERROR).has_no_dominant_value("v")).run(spark, polluted)
    assert not res.passed
    assert "'default'" in [x.message for x in res.report.issues][0]

    balanced = spark.createDataFrame(
        [(f"v{i % 4}",) for i in range(100)], "v string")
    assert ValidationSuite.builder("dom").with_check(
        Check("d", Level.ERROR).has_no_dominant_value("v")) \
        .run(spark, balanced).passed

    with pytest.raises(ValueError, match="max_share"):
        Check("d", Level.ERROR).has_no_dominant_value("v", max_share=0.0)


def test_check_schema_match(spark):
    ref = spark.createDataFrame([(1, "x", 1.0)], "id long, name string, score double")
    same = spark.createDataFrame([(2, "y", 2.0)], "id long, name string, score double")
    retyped = spark.createDataFrame([(1, "x", "oops")], "id long, name string, score string")
    extra = spark.createDataFrame([(1, "x", 1.0, True)],
                                  "id long, name string, score double, flag boolean")
    dropped = spark.createDataFrame([(1, "x")], "id long, name string")

    def run(df, **kw):
        return ValidationSuite.builder("s").with_check(
            Check("d", Level.ERROR).has_same_schema_as(ref, **kw)).run(spark, df)

    assert run(same).passed
    r = run(retyped)
    assert not r.passed and "expected" in [x.message for x in r.report.issues][0]
    assert not run(extra).passed
    assert run(extra, allow_extra=True).passed
    r2 = run(dropped)
    assert not r2.passed and "missing" in [x.message for x in r2.report.issues][0]


def test_check_row_count_ratio(spark):
    ref = spark.createDataFrame([(i,) for i in range(100)], "id long")
    near = spark.createDataFrame([(i,) for i in range(90)], "id long")
    collapsed = spark.createDataFrame([(1,)], "id long")

    def run(df, **kw):
        return ValidationSuite.builder("rc").with_check(
            Check("d", Level.ERROR).has_row_count_ratio(ref, **kw)).run(spark, df)

    assert run(near).passed
    r = run(collapsed)
    assert not r.passed and "0.01" in [x.message for x in r.report.issues][0]

    empty_ref = spark.createDataFrame([], "id long")
    res = ValidationSuite.builder("rc").with_check(
        Check("d", Level.ERROR).has_row_count_ratio(empty_ref)) \
        .run(spark, near)
    assert not res.passed  # undefined ratio surfaces as error, not crash

    with pytest.raises(ValueError, match="min_ratio"):
        Check("d", Level.ERROR).has_row_count_ratio(ref, min_ratio=2, max_ratio=1)
