"""Umbrella TPC-H integration suite, mirroring the reference's
tests/tpc_integration_tests.rs:44-120 — comprehensive per-table checks,
cross-table referential integrity, business rules — against the
driver-provided parquet tables.
"""

import pytest

from term_spark import Assertion, Check, Level, ValidationSuite
from term_spark.formatters import HumanFormatter


def build_comprehensive_suite() -> ValidationSuite:
    return (
        ValidationSuite.builder("tpch_comprehensive")
        .with_check(
            Check("region", Level.ERROR, table="region")
            .has_size(Assertion.eq(5))
            .validates_primary_key("r_regionkey")
            .is_complete("r_name"))
        .with_check(
            Check("nation", Level.ERROR, table="nation")
            .has_size(Assertion.eq(25))
            .validates_primary_key("n_nationkey")
            .value_range("n_regionkey", 0, 4))
        .with_check(
            Check("customer", Level.ERROR, table="customer")
            .validates_primary_key("c_custkey")
            .is_complete("c_name")
            .has_min_length("c_name", 5)
            .is_contained_in("c_mktsegment",
                             ["AUTOMOBILE", "BUILDING", "FURNITURE",
                              "HOUSEHOLD", "MACHINERY"])
            .has_min("c_acctbal", Assertion.ge(-999.99)))
        .with_check(
            Check("orders", Level.ERROR, table="orders")
            .validates_primary_key("o_orderkey")
            .is_contained_in("o_orderstatus", ["O", "F", "P"])
            .is_positive("o_totalprice")
            .within_date_range("o_orderdate", "1990-01-01", "2005-12-31")
            .validates_regex("o_orderpriority", "^[1-5]-[A-Z ]+$"))
        .with_check(
            Check("lineitem", Level.ERROR, table="lineitem")
            .value_range("l_quantity", 1, 50)
            .value_range("l_discount", 0.0, 0.1)
            .is_contained_in("l_returnflag", ["R", "A", "N"])
            .is_contained_in("l_linestatus", ["O", "F"])
            .satisfies("l_extendedprice > 0", 1.0)
            .satisfies("l_tax >= 0", 1.0))
        .with_check(
            Check("referential_integrity", Level.ERROR)
            .foreign_key("nation", "n_regionkey", "region", "r_regionkey")
            .foreign_key("customer", "c_nationkey", "nation", "n_nationkey")
            .foreign_key("orders", "o_custkey", "customer", "c_custkey")
            .foreign_key("lineitem", "l_orderkey", "orders", "o_orderkey")
            .foreign_key("lineitem", "l_partkey", "part", "p_partkey")
            .foreign_key("lineitem", "l_suppkey", "supplier", "s_suppkey")
            .join_coverage("orders", "o_custkey", "customer", "c_custkey",
                           Assertion.ge(0.99), "left"))
    )


def test_comprehensive_tpch_suite(spark, tpch):
    result = build_comprehensive_suite().run(spark, tpch)
    assert result.passed, HumanFormatter().format(result)
    counts = result.report.counts()
    assert counts["success"] >= 25
    assert counts["failure"] == 0 and counts["error"] == 0
    # scan sharing: 6 tables × ≤3 class-pure fused jobs + 7 join jobs
    assert result.report.num_spark_jobs <= 6 * 3 + 7 + 2


def test_comprehensive_suite_detects_injected_corruption(spark, tpch):
    """Corrupt one table (simulating bad upstream data) — the suite must
    fail with the right constraint pointing at it."""
    import pyspark.sql.functions as F

    bad_orders = tpch["orders"].withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 100 == 0, "X")
         .otherwise(F.col("o_orderstatus")))
    tables = dict(tpch)
    tables["orders"] = bad_orders
    result = build_comprehensive_suite().run(spark, tables)
    assert not result.passed
    failing = [i for i in result.report.issues]
    assert any(i.constraint == "contained_in" and i.column == "o_orderstatus"
               for i in failing), [i.to_dict() for i in failing]
