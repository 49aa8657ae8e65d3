"""Scalar operator family vs independently-computed expectations,
mirroring the reference's integration tests (known small inputs →
exact metric values)."""

import pytest

from term_spark import Assertion, Check, Level, Status, ValidationSuite


def run_one(spark, df, check):
    result = ValidationSuite.builder("t").with_check(check).run(spark, df)
    return result


def outcome(result, idx=0):
    return result.report.outcomes[idx].result


def test_statistics_known_values(spark):
    vals = [1.0, 2.0, 3.0, 4.0, 5.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    check = (Check("stats", Level.ERROR)
             .has_min("x", 1.0).has_max("x", 5.0).has_mean("x", 3.0)
             .has_sum("x", 15.0)
             .has_standard_deviation("x", Assertion.between(1.5811, 1.5812))
             .has_variance("x", 2.5))  # sample variance n−1
    result = run_one(spark, df, check)
    assert result.passed, result.report.to_json(2)


def test_multi_statistic_single_constraint(spark):
    df = spark.createDataFrame([(float(i),) for i in range(1, 11)], "x double")
    check = Check("m", Level.ERROR).statistics(
        "x", {"min": 1.0, "max": 10.0, "mean": 5.5, "sum": 55.0})
    assert run_one(spark, df, check).passed


def test_uniqueness_modes(spark, dupes_df):
    # 6 rows, transaction_id distinct = 4 → uniqueness 4/6
    r = run_one(spark, dupes_df,
                Check("u", Level.ERROR).uniqueness("transaction_id", 1.0))
    o = outcome(r)
    assert o.status == Status.FAILURE
    assert o.metric == pytest.approx(4 / 6)
    # distinctness assertion form
    r = run_one(spark, dupes_df,
                Check("d", Level.ERROR).validates_distinctness(
                    "transaction_id", Assertion.between(0.6, 0.7)))
    assert r.passed
    # unique value ratio: t1,t3 unique → 2/6 rows
    r = run_one(spark, dupes_df,
                Check("uvr", Level.ERROR).validates_unique_value_ratio(
                    "transaction_id", Assertion.eq(2 / 6)))
    assert r.passed, r.report.to_json(2)
    # primary key on user_id (all distinct, no nulls) passes
    r = run_one(spark, dupes_df, Check("pk", Level.ERROR).validates_primary_key("user_id"))
    assert r.passed
    # primary key on transaction_id fails
    r = run_one(spark, dupes_df,
                Check("pk2", Level.ERROR).validates_primary_key("transaction_id"))
    assert not r.passed


def test_uniqueness_null_handling(spark):
    df = spark.createDataFrame(
        [("a",), ("b",), (None,), (None,)], "x string")
    # exclude (standard): distinct non-null = 2, total 4 → 0.5
    r = run_one(spark, df, Check("s", Level.ERROR).uniqueness("x", 0.5))
    assert outcome(r).metric == pytest.approx(0.5)
    # include: NULL coalesced to sentinel → distinct 3 → 0.75
    r = run_one(spark, df, Check("i", Level.ERROR)
                .validates_uniqueness_with_nulls("x", 0.75, "include"))
    assert outcome(r).metric == pytest.approx(0.75)
    # distinct: each NULL its own value → (2 + 2)/4 = 1.0
    r = run_one(spark, df, Check("d", Level.ERROR)
                .validates_uniqueness_with_nulls("x", 1.0, "distinct"))
    assert outcome(r).metric == pytest.approx(1.0)


def test_multicolumn_uniqueness_tuple_semantics(spark):
    # struct-distinct must NOT drop rows with a null component
    df = spark.createDataFrame(
        [(1, None), (1, None), (1, 2)], "a long, b long")
    r = run_one(spark, df, Check("u", Level.ERROR).uniqueness(["a", "b"], 1.0))
    # distinct tuples: (1,null), (1,2) → 2/3
    assert outcome(r).metric == pytest.approx(2 / 3)


def test_uniqueness_approx_strategy(spark):
    """Opt-in approx distinct (HLL++, rsd 2%): same verdict on small
    exact-representable cardinalities (HLL++ is exact below its sparse
    threshold), classified into the sketch fusion group so it can never
    drag an Expand plan, and refused for primary_key."""
    from term_spark.operators.uniqueness import UniquenessConstraint

    df = spark.createDataFrame([(i % 50,) for i in range(200)], "x long")
    r = run_one(spark, df, Check("a", Level.ERROR)
                .uniqueness("x", 0.25, strategy="approx"))
    assert outcome(r).metric == pytest.approx(50 / 200)
    r = run_one(spark, df, Check("d", Level.ERROR)
                .validates_distinctness("x", Assertion.between(0.2, 0.3),
                                        strategy="approx"))
    assert r.passed
    con = UniquenessConstraint("x", "full", strategy="approx")
    assert con._uq.startswith("mk_")          # sketch class, not DISTINCT
    con = UniquenessConstraint("x", "full", strategy="exact")
    assert con._uq.startswith("md_")
    assert con.distinct_groupings()           # exact exposes its key
    with pytest.raises(ValueError):
        UniquenessConstraint("x", "primary_key", strategy="approx")
    with pytest.raises(ValueError):
        UniquenessConstraint("x", "full", strategy="bogus")
    # two approx constraints on the same columns at different rsd must
    # NOT collide on one metric alias (the executor dedups by alias —
    # a collision would silently serve one constraint the other's
    # estimate); exact aliases stay rsd-free
    a = UniquenessConstraint("x", "full", strategy="approx",
                             approx_rsd=0.02)
    b = UniquenessConstraint("x", "full", strategy="approx",
                             approx_rsd=0.05)
    assert a._uq != b._uq
    e1 = UniquenessConstraint("x", "full", strategy="exact",
                              approx_rsd=0.02)
    e2 = UniquenessConstraint("x", "full", strategy="exact",
                              approx_rsd=0.05)
    assert e1._uq == e2._uq


def test_distinct_metrics_run_as_separate_two_stage_jobs(spark):
    """Round 9: each exact-DISTINCT metric is its own singleton fusion
    group executed as an explicit groupBy two-stage (never the
    DISTINCT-agg rewrite, never an Expand with a sibling DISTINCT).
    Two uniqueness constraints on different columns → plain job + two
    distinct jobs; values stay exact."""
    import io
    from contextlib import redirect_stdout

    from term_spark import ValidationSuite

    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "b"), (None, "b")], "x long, y string")
    check = (Check("u2", Level.ERROR)
             .uniqueness("x", 0.1)     # distinct non-null x = 2 → 2/4
             .uniqueness("y", 0.1))    # distinct y = 2 → 2/4
    suite = ValidationSuite.builder("t").with_check(check)
    result = suite.run(spark, df)
    assert result.report.num_spark_jobs == 3
    for o in result.report.outcomes:
        assert o.result.metric == pytest.approx(2 / 4)
    # the rendered plan for the distinct jobs is the two-stage groupBy:
    # no Expand anywhere, and a plain HashAggregate pair per job
    plan = suite.explain(spark, df)
    assert "Expand" not in plan
    assert plan.count("[distinct, 1 metrics]") == 2


def test_satisfies_and_containment(spark, dupes_df):
    r = run_one(spark, dupes_df, Check("s", Level.ERROR)
                .satisfies("amount > 15", Assertion.eq(5 / 6))
                .is_contained_in("status", ["ok", "bad"])
                .is_contained_in("status", ["ok"], Assertion.eq(4 / 6)))
    assert r.passed, r.report.to_json(2)


def test_satisfies_rejects_injection(spark, dupes_df):
    with pytest.raises(Exception):
        Check("x").satisfies("1=1; DROP TABLE t", 1.0)


def test_format_email(spark):
    rows = [("a@x.com",), ("bad",), ("b@y.org",), (None,)]
    df = spark.createDataFrame(rows, "email string")
    # 2 match / 4 total (null fails by default)
    r = run_one(spark, df, Check("f", Level.ERROR)
                .validates_email("email", Assertion.eq(0.5)))
    assert r.passed, r.report.to_json(2)
    # null_is_valid → 3/4
    from term_spark.operators.format import FormatOptions
    r = run_one(spark, df, Check("f2", Level.ERROR).validates_email(
        "email", Assertion.eq(0.75), options=FormatOptions(null_is_valid=True)))
    assert r.passed


def test_format_patterns(spark):
    df = spark.createDataFrame(
        [("550e8400-e29b-41d4-a716-446655440000", "192.168.1.1",
          "2024-01-15T10:30:00Z", '{"a": 1}', "12345", "555-123-4567")],
        "uuid string, ip string, ts string, js string, zip string, phone string")
    check = (Check("fmt", Level.ERROR)
             .validates_uuid("uuid")
             .validates_ipv4("ip")
             .validates_iso8601_datetime("ts")
             .validates_json("js")
             .validates_postal_code("zip", "US")
             .validates_phone("phone", country="US"))
    r = run_one(spark, df, check)
    assert r.passed, r.report.to_json(2)


def test_length_family(spark):
    df = spark.createDataFrame([("ab",), ("abcd",), (None,)], "s string")
    # nulls are VALID in the reference's length semantics
    r = run_one(spark, df, Check("l", Level.ERROR)
                .has_min_length("s", 2)
                .has_max_length("s", 4)
                .has_length_between("s", 1, 10)
                .is_not_empty("s")
                .has_exact_length("s", 2, Assertion.eq(2 / 3)))
    assert r.passed, r.report.to_json(2)


def test_quantile_exact_vs_approx(spark):
    df = spark.createDataFrame([(float(i),) for i in range(1, 101)], "x double")
    r = run_one(spark, df, Check("q", Level.ERROR)
                .has_exact_quantile("x", 0.5, Assertion.between(50.0, 51.0))
                .has_approx_quantile("x", 0.5, Assertion.between(49.0, 52.0))
                .has_quantile("x", 0.9, Assertion.between(90.0, 91.0), mode="auto"))
    assert r.passed, r.report.to_json(2)


def test_consistent_data_type(spark):
    df = spark.createDataFrame(
        [("1",), ("2",), ("3.5",), ("abc",), (None,)], "v string")
    r = run_one(spark, df, Check("t", Level.ERROR)
                .has_consistent_data_type("v", "integer", Assertion.eq(0.5)))
    assert r.passed, r.report.to_json(2)


def test_column_count_and_size(spark, dupes_df):
    r = run_one(spark, dupes_df, Check("c", Level.ERROR)
                .has_column_count(5).has_size(6))
    assert r.passed


def test_temporal_scalar_constraints(spark):
    rows = [
        ("2024-01-01 10:00:00", "2024-01-01 11:00:00"),
        ("2024-01-02 09:00:00", "2024-01-02 08:00:00"),  # violation
        ("2024-01-03 12:00:00", "2024-01-03 12:00:00"),  # equal
    ]
    df = spark.createDataFrame(rows, "a string, b string") \
        .selectExpr("cast(a as timestamp) a", "cast(b as timestamp) b")
    r = run_one(spark, df, Check("t", Level.ERROR)
                .temporal_ordering("a", "b", allow_equal=True,
                                   assertion=Assertion.eq(1 / 3)))
    assert r.passed, r.report.to_json(2)
    r = run_one(spark, df, Check("t2", Level.ERROR)
                .within_date_range("a", "2024-01-01", "2024-12-31"))
    assert r.passed
    # business hours: all three are weekdays within 9-17 except 08:00 one
    r = run_one(spark, df, Check("t3", Level.ERROR)
                .within_business_hours("b", 9, 17, weekdays_only=False,
                                       assertion=Assertion.eq(1 / 3)))
    assert r.passed, r.report.to_json(2)


# ---------------------------------------------------------------------------
# Benford's law
# ---------------------------------------------------------------------------

def test_benford_accepts_benford_data(spark):
    import math
    from term_spark import Assertion, Check, Level, ValidationSuite

    # synthesize ~Benford data: first digits drawn with P(d)=log10(1+1/d)
    rows, i = [], 0
    for d in range(1, 10):
        for _ in range(int(round(1000 * math.log10(1 + 1 / d)))):
            rows.append((i, float(d * 10 + i % 10))); i += 1
    df = spark.createDataFrame(rows, "id long, v double")
    suite = ValidationSuite.builder("b").with_check(
        Check("b", Level.ERROR).has_benford_distribution("v"))
    res = suite.run(spark, df)
    assert res.passed, [x.message for x in res.report.issues]


def test_benford_rejects_uniform_digits(spark):
    from term_spark import Assertion, Check, Level, ValidationSuite

    # all values start with digit 9 — maximally non-Benford
    df = spark.createDataFrame([(i, 900.0 + i) for i in range(100)],
                               "id long, v double")
    suite = ValidationSuite.builder("b").with_check(
        Check("b", Level.ERROR).has_benford_distribution("v"))
    res = suite.run(spark, df)
    assert not res.passed
    msg = [x.message for x in res.report.issues][0]
    assert "digit 9" in msg  # failure names the worst digit


def test_benford_first_digit_edges(spark):
    import pyspark.sql.functions as F
    from term_spark.operators.statistics import BenfordConstraint

    df = spark.createDataFrame(
        [(0.0,), (None,), (0.042,), (-523.0,), (1.0,), (999999.0,)],
        "v double")
    got = [r["d"] for r in df.select(
        BenfordConstraint.first_digit(F.col("v")).alias("d")).collect()]
    assert got == [None, None, 4, 5, 1, 9]


# ---------------------------------------------------------------------------
# PSI distribution drift
# ---------------------------------------------------------------------------

def test_psi_zero_for_identical_distributions(spark):
    from term_spark.operators.statistics import population_stability

    df = spark.createDataFrame([(float(i % 50),) for i in range(1000)], "v double")
    r = population_stability(df, df, "v", bins=10, lo=0.0, hi=50.0).collect()[0]
    assert r["n_ref"] == r["n_cur"] == 1000
    assert r["psi"] == 0.0


def test_psi_flags_shifted_distribution(spark):
    from term_spark.operators.statistics import population_stability

    ref = spark.createDataFrame([(float(i % 20),) for i in range(1000)], "v double")
    cur = spark.createDataFrame([(30.0 + i % 20,) for i in range(1000)], "v double")
    r = population_stability(ref, cur, "v", bins=10, lo=0.0, hi=50.0).collect()[0]
    assert r["psi"] > 0.25  # fully disjoint ranges -> severe drift


def test_psi_auto_domain_matches_fixed(spark):
    from term_spark.operators.statistics import population_stability

    ref = spark.createDataFrame([(float(i % 50),) for i in range(500)], "v double")
    cur = spark.createDataFrame([(float((i * 7) % 50),) for i in range(500)], "v double")
    fixed = population_stability(ref, cur, "v", bins=10, lo=0.0, hi=49.0).collect()[0]
    auto = population_stability(ref, cur, "v", bins=10).collect()[0]
    assert auto["psi"] == fixed["psi"]  # same [0,49] domain derived


def test_psi_clamps_out_of_domain_values(spark):
    from term_spark.operators.statistics import population_stability

    ref = spark.createDataFrame([(float(10 + i % 10),) for i in range(100)], "v double")
    # cur sprawls far below lo and above hi — must clamp to edge buckets
    cur = spark.createDataFrame([(-1000.0 + i,) for i in range(50)] +
                                [(9000.0 + i,) for i in range(50)], "v double")
    r = population_stability(ref, cur, "v", bins=10, lo=10.0, hi=20.0).collect()[0]
    assert r["n_ref"] == 100 and r["n_cur"] == 100  # nothing dropped
    assert r["psi"] > 0.25  # severe drift, finite and bounded


def test_psi_raises_on_empty_side_with_auto_domain(spark):
    import pytest as _pytest
    from term_spark.operators.statistics import population_stability

    ref = spark.createDataFrame([(1.0,)], "v double")
    empty = spark.createDataFrame([], "v double")
    with _pytest.raises(ValueError, match="no non-null"):
        population_stability(ref, empty, "v")


def test_psi_raises_on_degenerate_domain(spark):
    import pytest as _pytest
    from term_spark.operators.statistics import population_stability

    df = spark.createDataFrame([(float(i),) for i in range(10)], "v double")
    # reversed explicit pair
    with _pytest.raises(ValueError, match="must exceed"):
        population_stability(df, df, "v", bins=10, lo=50.0, hi=10.0)
    # equal explicit pair
    with _pytest.raises(ValueError, match="must exceed"):
        population_stability(df, df, "v", bins=10, lo=5.0, hi=5.0)
    # constant column -> derived lo == hi must also fail fast
    const = spark.createDataFrame([(7.0,)] * 10, "v double")
    with _pytest.raises(ValueError, match="must exceed"):
        population_stability(const, const, "v", bins=10)


def test_benford_first_digit_clamped_at_float_edges(spark):
    """Near powers of ten, log10 float rounding can push the arithmetic
    first digit to 0 or 10; the clamp keeps every non-zero value inside
    1..9 so no row vanishes from the digit counts."""
    import pyspark.sql.functions as F
    from term_spark.operators.statistics import BenfordConstraint

    vals = ([(10.0 ** k,) for k in range(-30, 31)] +
            [(9.999999999999999 * 10.0 ** k,) for k in range(-20, 21)] +
            [(1e23,), (1e-23,), (9.999999999999999e22,)])
    df = spark.createDataFrame(vals, "v double")
    got = df.select(
        BenfordConstraint.first_digit(F.col("v")).alias("d")).collect()
    assert all(r["d"] is not None and 1 <= r["d"] <= 9 for r in got)


def test_psi_oracle_parity_with_out_of_domain_values(spark, tmp_path):
    """The contract-query parity the driver can't see: l_quantity values
    BELOW lo=1.0 and above hi=50.0 must land in the same edge buckets in
    Spark (greatest/least) and the DuckDB oracle (GREATEST/LEAST)."""
    import duckdb
    import pandas as pd
    from term_spark.queries import ORACLES, QUERIES

    pdf = pd.DataFrame({
        "l_orderkey": list(range(1, 41)),
        # even keys -> ref, odd keys -> cur; plant 0.25/-3 (below lo) and
        # 75/400 (above hi) on both sides
        "l_quantity": [0.25, 75.0, -3.0, 400.0] +
                      [float(1 + (i % 50)) for i in range(36)],
    })
    path = tmp_path / "lineitem.parquet"
    pdf.to_parquet(path)

    sdf = QUERIES["drift_psi_quantity"](spark, str(tmp_path))
    srow = sdf.collect()[0]

    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{path}')")
    drow = con.execute(ORACLES["drift_psi_quantity"]).fetchone()

    assert srow["n_ref"] == drow[0] == 20   # nothing dropped on either side
    assert srow["n_cur"] == drow[1] == 20
    assert srow["psi"] == drow[2]


def test_custom_aggregate_rides_fused_agg(spark, tpch):
    from term_spark import Assertion, Check, Level, ValidationSuite
    suite = (ValidationSuite.builder("custom")
             .with_check(Check("c", Level.ERROR)
                         .is_complete("l_quantity")
                         .has_custom_aggregate(
                             "sum(l_extendedprice * (1 - l_discount)) / "
                             "sum(l_extendedprice)",
                             Assertion.between(0.9, 1.0),
                             description="avg_discount_factor")))
    res = suite.run(spark, tpch["lineitem"])
    assert res.passed, res.report.to_json(2)
    assert res.report.num_spark_jobs == 1      # fused, no extra scan

    bad = (ValidationSuite.builder("custom")
           .with_check(Check("c", Level.ERROR)
                       .has_custom_aggregate("avg(l_tax)",
                                             Assertion.lt(0.0))))
    r2 = bad.run(spark, tpch["lineitem"])
    assert not r2.passed
    assert "custom_aggregate(avg(l_tax))" in \
        [x.message for x in r2.report.issues][0]

    import pytest
    from term_spark.functions.security import SecurityError
    with pytest.raises(SecurityError):
        Check("c", Level.ERROR).has_custom_aggregate(
            "1; DROP TABLE x", Assertion.gt(0))


def test_custom_aggregate_row_expression_is_one_error_outcome(spark, tpch):
    """A screened-but-NON-AGGREGATE expression must yield ONE error
    outcome for its own constraint — not abort the suite's shared fused
    aggregation and take every co-scheduled constraint down with it
    (ADVICE r6/r7: the eager limit(0) analysis probe in
    CustomAggregateConstraint.scalar_metrics)."""
    from term_spark import Assertion, Check, Level, ValidationSuite
    from term_spark.core.result import Status

    suite = (ValidationSuite.builder("custom")
             .with_check(Check("c", Level.ERROR)
                         .is_complete("l_quantity")
                         .has_custom_aggregate("l_quantity + 1",
                                               Assertion.gt(0))))
    res = suite.run(spark, tpch["lineitem"])
    by_name = {o.result.name: o.result.status for o in res.report.outcomes}
    assert by_name["custom_aggregate"] is Status.ERROR
    # the fused job survived: the sibling constraint still evaluated
    assert by_name["completeness"] is Status.SUCCESS
    assert not res.passed
