"""operators.drift: KS / chi-squared (Cramér's V) / Jensen–Shannon —
known-value checks, edge semantics, and fluent Check wiring.  Oracle
parity for the contract queries (drift_ks_quantity,
drift_chi2_returnflag, drift_js_quantity) runs in test_oracle_parity."""

import math

import pytest

import pyspark.sql.functions as F

from term_spark import Check, Level, ValidationSuite
from term_spark.operators.drift import (chi_squared_drift, js_divergence,
                                        ks_statistic)


def _df(spark, vals, typ="double"):
    return spark.createDataFrame([(v,) for v in vals], f"v {typ}")


# ---- KS -------------------------------------------------------------------

def test_ks_known_value(spark):
    ref = _df(spark, [1.0, 1.0, 2.0, 3.0])
    cur = _df(spark, [2.0, 3.0, 3.0, 4.0])
    row = ks_statistic(ref, cur, "v").collect()[0]
    # CDFs at v=1: 0.5 vs 0.0 -> sup gap 0.5
    assert row["n_ref"] == 4 and row["n_cur"] == 4
    assert row["ks"] == pytest.approx(0.5)


def test_ks_identical_samples_is_zero(spark):
    d = _df(spark, [float(i % 7) for i in range(100)])
    assert ks_statistic(d, d, "v").collect()[0]["ks"] == 0.0


def test_ks_symmetric(spark):
    a = _df(spark, [float(i % 5) for i in range(50)])
    b = _df(spark, [float(i % 9) for i in range(50)])
    assert (ks_statistic(a, b, "v").collect()[0]["ks"]
            == ks_statistic(b, a, "v").collect()[0]["ks"])


def test_ks_binned_path_bounds_keys_and_requires_domain(spark):
    ref = _df(spark, [i / 10 for i in range(100)])        # 100 distinct
    cur = _df(spark, [5.0 + i / 10 for i in range(100)])  # shifted
    row = ks_statistic(ref, cur, "v", bins=10, lo=0.0, hi=15.0).collect()[0]
    assert 0.0 < row["ks"] <= 1.0
    with pytest.raises(ValueError, match="requires explicit lo/hi"):
        ks_statistic(ref, cur, "v", bins=10)
    with pytest.raises(ValueError, match="must exceed"):
        ks_statistic(ref, cur, "v", bins=10, lo=1.0, hi=1.0)


def test_ks_ignores_nulls(spark):
    ref = spark.createDataFrame([(1.0,), (None,), (2.0,)], "v double")
    cur = spark.createDataFrame([(1.0,), (2.0,), (None,)], "v double")
    row = ks_statistic(ref, cur, "v").collect()[0]
    assert row["n_ref"] == 2 and row["n_cur"] == 2 and row["ks"] == 0.0


# ---- chi-squared / Cramér's V ----------------------------------------------

def test_chi2_known_value(spark):
    ref = _df(spark, ["a"] * 50 + ["b"] * 50, "string")
    cur = _df(spark, ["a"] * 30 + ["b"] * 70, "string")
    row = chi_squared_drift(ref, cur, "v").collect()[0]
    # expected 50/50 -> chi2 = 400/50 + 400/50 = 16; V = sqrt(16/100) = 0.4
    assert row["n_categories"] == 2
    assert row["chi2"] == pytest.approx(16.0)
    assert row["cramers_v"] == pytest.approx(0.4)


def test_chi2_new_category_scores_as_heavy_drift(spark):
    ref = _df(spark, ["a"] * 10, "string")
    cur = _df(spark, ["a"] * 5 + ["b"] * 5, "string")
    row = chi_squared_drift(ref, cur, "v").collect()[0]
    # category b has eps-floored reference share -> enormous chi2, V >> 1
    assert row["cramers_v"] > 1.0


def test_chi2_identical_is_zero(spark):
    d = _df(spark, ["x"] * 7 + ["y"] * 3, "string")
    row = chi_squared_drift(d, d, "v").collect()[0]
    assert row["chi2"] == 0.0 and row["cramers_v"] == 0.0


# ---- Jensen–Shannon ---------------------------------------------------------

def test_js_disjoint_supports_is_one(spark):
    ref = _df(spark, [0.5] * 4)
    cur = _df(spark, [9.5] * 4)
    row = js_divergence(ref, cur, "v", bins=10, lo=0.0, hi=10.0).collect()[0]
    assert row["js"] == pytest.approx(1.0)


def test_js_identical_is_zero_and_symmetric(spark):
    a = _df(spark, [float(i % 10) for i in range(100)])
    b = _df(spark, [float((i * 3) % 10) + 0.4 for i in range(100)])
    assert js_divergence(a, a, "v", bins=10, lo=0.0, hi=10.0) \
        .collect()[0]["js"] == 0.0
    assert (js_divergence(a, b, "v", bins=10, lo=0.0, hi=11.0).collect()[0]["js"]
            == js_divergence(b, a, "v", bins=10, lo=0.0, hi=11.0).collect()[0]["js"])


def test_js_requires_explicit_domain(spark):
    d = _df(spark, [1.0])
    with pytest.raises(ValueError, match="lo/hi"):
        js_divergence(d, d, "v")
    with pytest.raises(ValueError, match="must exceed"):
        js_divergence(d, d, "v", lo=2.0, hi=1.0)


# ---- fluent Check wiring ----------------------------------------------------

def test_check_ks_drift_passes_and_fails(spark):
    ref = _df(spark, [float(i % 50) for i in range(1000)])
    same = _df(spark, [float((i * 7) % 50) for i in range(1000)])
    shifted = _df(spark, [25.0 + i % 50 for i in range(1000)])

    ok = ValidationSuite.builder("drift").with_check(
        Check("d", Level.ERROR).has_low_ks_drift(ref, "v", max_stat=0.05))
    assert ok.run(spark, same).passed

    bad = ValidationSuite.builder("drift").with_check(
        Check("d", Level.ERROR).has_low_ks_drift(ref, "v", max_stat=0.1))
    res = bad.run(spark, shifted)
    assert not res.passed
    assert "KS" in [x.message for x in res.report.issues][0]


def test_check_js_divergence_and_categories(spark):
    ref_n = _df(spark, [float(i % 10) for i in range(500)])
    drift_n = _df(spark, [5.0 + i % 10 for i in range(500)])
    bad = ValidationSuite.builder("drift").with_check(
        Check("d", Level.ERROR)
        .has_low_js_divergence(ref_n, "v", max_js=0.05, lo=0.0, hi=15.0))
    res = bad.run(spark, drift_n)
    assert not res.passed
    assert "JS divergence" in [x.message for x in res.report.issues][0]

    ref_c = _df(spark, ["a"] * 80 + ["b"] * 20, "string")
    cur_c = _df(spark, ["a"] * 20 + ["b"] * 80, "string")
    res2 = ValidationSuite.builder("drift").with_check(
        Check("d", Level.ERROR).has_stable_categories(ref_c, "v")) \
        .run(spark, cur_c)
    assert not res2.passed
    assert "Cram" in [x.message for x in res2.report.issues][0]


def test_check_js_missing_domain_is_error_not_crash(spark):
    ref = _df(spark, [1.0, 2.0])
    suite = ValidationSuite.builder("drift").with_check(
        Check("d", Level.ERROR).has_low_js_divergence(ref, "v"))
    res = suite.run(spark, ref)
    assert not res.passed  # surfaces as an error outcome, not a crash


# ---- grouped PSI ------------------------------------------------------------

def test_grouped_psi_flags_only_the_drifted_group(spark):
    from term_spark.operators.drift import population_stability_by
    rows_ref = [("a", float(i % 10)) for i in range(500)] + \
               [("b", float(i % 10)) for i in range(500)]
    rows_cur = [("a", float((i * 3) % 10)) for i in range(500)] + \
               [("b", 5.0 + i % 10) for i in range(500)]   # b shifted
    ref = spark.createDataFrame(rows_ref, "g string, v double")
    cur = spark.createDataFrame(rows_cur, "g string, v double")
    out = {r["g"]: r for r in population_stability_by(
        ref, cur, "v", "g", bins=10, lo=0.0, hi=15.0).collect()}
    assert out["a"]["psi"] < 0.01          # same distribution
    assert out["b"]["psi"] > 0.25          # shifted -> drifted
    assert out["a"]["n_ref"] == out["a"]["n_cur"] == 500


def test_grouped_psi_one_sided_group_is_null_not_huge(spark):
    from term_spark.operators.drift import population_stability_by
    ref = spark.createDataFrame([("a", 1.0)], "g string, v double")
    cur = spark.createDataFrame([("a", 1.0), ("new", 2.0)], "g string, v double")
    out = {r["g"]: r for r in population_stability_by(
        ref, cur, "v", "g", lo=0.0, hi=10.0).collect()}
    assert out["new"]["psi"] is None and out["new"]["n_ref"] == 0
    assert out["a"]["psi"] == 0.0


def test_grouped_psi_requires_domain(spark):
    from term_spark.operators.drift import population_stability_by
    d = spark.createDataFrame([("a", 1.0)], "g string, v double")
    with pytest.raises(ValueError, match="lo/hi"):
        population_stability_by(d, d, "v", "g")
    with pytest.raises(ValueError, match="must exceed"):
        population_stability_by(d, d, "v", "g", lo=1.0, hi=1.0)


def test_grouped_psi_matches_scalar_psi_per_group(spark):
    from term_spark.operators.drift import population_stability_by
    from term_spark.operators.statistics import population_stability
    ref = spark.createDataFrame(
        [("a", float(i % 7)) for i in range(200)] +
        [("b", float(i % 4)) for i in range(100)], "g string, v double")
    cur = spark.createDataFrame(
        [("a", float(i % 5)) for i in range(150)] +
        [("b", float(i % 9)) for i in range(120)], "g string, v double")
    grouped = {r["g"]: r["psi"] for r in population_stability_by(
        ref, cur, "v", "g", bins=10, lo=0.0, hi=10.0).collect()}
    for g in ("a", "b"):
        scalar = population_stability(
            ref.filter(F.col("g") == g), cur.filter(F.col("g") == g),
            "v", bins=10, lo=0.0, hi=10.0).collect()[0]["psi"]
        assert grouped[g] == pytest.approx(scalar, abs=1e-6)


def test_categorical_drift_empty_reference_is_error_not_failure(spark):
    # ADVICE r5: an empty reference snapshot must surface as the error
    # outcome (like KsDrift/JsDrift on the same degenerate case), not
    # as an eps-floored absurd Cramér's V reported as drift failure.
    from term_spark.core.result import Status
    empty_ref = _df(spark, [], "string")
    cur = _df(spark, ["a"] * 50 + ["b"] * 50, "string")
    res = ValidationSuite.builder("drift").with_check(
        Check("d", Level.ERROR).has_stable_categories(empty_ref, "v")) \
        .run(spark, cur)
    assert not res.passed
    statuses = [o.result.status for o in res.report.outcomes]
    assert Status.ERROR in statuses
    assert Status.FAILURE not in statuses


def test_anomaly_constraint_alias_is_deterministic():
    # ADVICE r5: the fused-agg alias must not depend on PYTHONHASHSEED
    from term_spark.analyzers.anomaly import AnomalyConstraint
    from term_spark.core.constraint import metric_alias
    c = AnomalyConstraint("row_count", None, None, None)
    assert c._alias == metric_alias("anom", "row_count")
    # distinct metric names must never collide on the alias
    c2 = AnomalyConstraint("null_ratio", None, None, None)
    assert c._alias != c2._alias


def test_has_stable_distribution_by_names_worst_group(spark):
    rows_ref = [("a", float(i % 10)) for i in range(300)] + \
               [("b", float(i % 10)) for i in range(300)]
    rows_cur = [("a", float(i % 10)) for i in range(300)] + \
               [("b", 5.0 + i % 10) for i in range(300)]   # only b drifts
    ref = spark.createDataFrame(rows_ref, "g string, v double")
    cur = spark.createDataFrame(rows_cur, "g string, v double")
    res = ValidationSuite.builder("drift").with_check(
        Check("d", Level.ERROR).has_stable_distribution_by(
            ref, "v", "g", max_psi=0.25, bins=10, lo=0.0, hi=15.0)) \
        .run(spark, cur)
    assert not res.passed
    msg = [x.message for x in res.report.issues][0]
    assert "'b'" in msg and "psi" in msg.lower()
    # loose gate passes (worst PSI is finite and reported as metric)
    ok = ValidationSuite.builder("drift").with_check(
        Check("d", Level.ERROR).has_stable_distribution_by(
            ref, "v", "g", max_psi=100.0, bins=10, lo=0.0, hi=15.0)) \
        .run(spark, cur)
    assert ok.passed


def test_has_stable_distribution_by_missing_group_policy(spark):
    from term_spark.core.result import Status
    ref = spark.createDataFrame(
        [("a", float(i % 10)) for i in range(100)], "g string, v double")
    cur = spark.createDataFrame(
        [("a", float(i % 10)) for i in range(100)] +
        [("NEW", float(i % 10)) for i in range(100)], "g string, v double")
    # default: one-sided group skipped, same-distribution group passes
    ok = ValidationSuite.builder("d").with_check(
        Check("d", Level.ERROR).has_stable_distribution_by(
            ref, "v", "g", lo=0.0, hi=10.0)).run(spark, cur)
    assert ok.passed
    # on_missing='fail': the brand-new segment is itself the finding
    bad = ValidationSuite.builder("d").with_check(
        Check("d", Level.ERROR).has_stable_distribution_by(
            ref, "v", "g", lo=0.0, hi=10.0, on_missing="fail")).run(spark, cur)
    assert not bad.passed
    assert "one snapshot" in [x.message for x in bad.report.issues][0]


# ---- Wasserstein-1 (round 6) ----------------------------------------------

def test_w1_known_value_one_bucket_shift(spark):
    from term_spark.operators.drift import wasserstein_1
    # every value moves exactly one bucket right: W1 = 1 bucket = width
    ref = _df(spark, [0.5] * 10)
    cur = _df(spark, [1.5] * 10)
    row = wasserstein_1(ref, cur, "v", bins=10, lo=0.0, hi=10.0).collect()[0]
    assert row["w1"] == pytest.approx(1.0)
    assert row["w1_norm"] == pytest.approx(0.1)


def test_w1_weighs_displacement_where_ks_does_not(spark):
    from term_spark.operators.drift import (ks_statistic, wasserstein_1)
    ref = _df(spark, [0.5] * 10)
    near = _df(spark, [1.5] * 10)   # one bucket away
    far = _df(spark, [9.5] * 10)    # nine buckets away
    ks_near = ks_statistic(ref, near, "v", bins=10, lo=0.0,
                           hi=10.0).collect()[0]["ks"]
    ks_far = ks_statistic(ref, far, "v", bins=10, lo=0.0,
                          hi=10.0).collect()[0]["ks"]
    assert ks_near == ks_far == pytest.approx(1.0)  # KS is blind to distance
    w_near = wasserstein_1(ref, near, "v", bins=10, lo=0.0,
                           hi=10.0).collect()[0]["w1"]
    w_far = wasserstein_1(ref, far, "v", bins=10, lo=0.0,
                          hi=10.0).collect()[0]["w1"]
    # the empty buckets between the two spikes carry the persisting
    # CDF gap (run-length weighting): 9 buckets * width 1
    assert w_far == pytest.approx(9.0) and w_near == pytest.approx(1.0)


def test_w1_identical_is_zero_and_symmetric(spark):
    from term_spark.operators.drift import wasserstein_1
    a = _df(spark, [float(i % 10) for i in range(100)])
    b = _df(spark, [float((i * 3) % 10) + 0.4 for i in range(100)])
    assert wasserstein_1(a, a, "v", bins=10, lo=0.0, hi=10.0) \
        .collect()[0]["w1"] == 0.0
    assert (wasserstein_1(a, b, "v", bins=10, lo=0.0, hi=11.0)
            .collect()[0]["w1"]
            == wasserstein_1(b, a, "v", bins=10, lo=0.0, hi=11.0)
            .collect()[0]["w1"])


def test_w1_requires_explicit_domain(spark):
    from term_spark.operators.drift import wasserstein_1
    d = _df(spark, [1.0])
    with pytest.raises(ValueError, match="lo/hi"):
        wasserstein_1(d, d, "v")
    with pytest.raises(ValueError, match="must exceed"):
        wasserstein_1(d, d, "v", lo=2.0, hi=1.0)


def test_check_wasserstein_drift_passes_fails_and_errors(spark):
    from term_spark.core.result import Status
    ref = _df(spark, [float(i % 10) for i in range(100)])
    same = _df(spark, [float((i + 3) % 10) for i in range(100)])
    shifted = _df(spark, [float(i % 10) + 5.0 for i in range(100)])
    ok = ValidationSuite.builder("w").with_check(
        Check("w", Level.ERROR).has_low_wasserstein_drift(
            ref, "v", lo=0.0, hi=15.0)).run(spark, same)
    assert ok.passed
    bad = ValidationSuite.builder("w").with_check(
        Check("w", Level.ERROR).has_low_wasserstein_drift(
            ref, "v", lo=0.0, hi=15.0)).run(spark, shifted)
    assert not bad.passed
    assert "w1_drift" in [x.message for x in bad.report.issues][0]
    # empty current snapshot -> error outcome, not a bogus failure
    empty = spark.createDataFrame([], "v double")
    err = ValidationSuite.builder("w").with_check(
        Check("w", Level.ERROR).has_low_wasserstein_drift(
            ref, "v", lo=0.0, hi=15.0)).run(spark, empty)
    assert not err.passed
    statuses = [o.result.status for o in err.report.outcomes]
    assert Status.ERROR in statuses and Status.FAILURE not in statuses


def test_psi_timeline_localizes_the_drift_day(spark):
    """Days 1-2 match the reference; day 3 is shifted — the timeline
    must read ~0 for the stable days and large for the drifted one."""
    import pyspark.sql.functions as F
    from term_spark.operators.drift import psi_timeline

    def day(d, base):
        return [(f"2024-02-0{d} 0{h}:00:00", float(base + (i % 50)))
                for h in range(1, 5) for i in range(100)]

    ref = spark.createDataFrame(day(1, 0) + day(2, 0), "ts string, value double") \
        .select(F.col("ts").cast("timestamp").alias("ts"), "value")
    cur = spark.createDataFrame(day(3, 0) + day(4, 0) + day(5, 400),
                                "ts string, value double") \
        .select(F.col("ts").cast("timestamp").alias("ts"), "value")
    got = {r["period"].day: r["psi"] for r in
           psi_timeline(ref, cur, "value", "ts", bins=10,
                        lo=0.0, hi=500.0).collect()}
    assert got[3] == 0.0 and got[4] == 0.0     # identical distribution
    assert got[5] > 1.0                        # the shifted day screams


def test_psi_timeline_validates_domain(spark):
    import pytest as _pytest

    from term_spark.operators.drift import psi_timeline
    df = spark.createDataFrame([("2024-01-01", 1.0)], "ts string, value double")
    with _pytest.raises(ValueError, match="lo/hi"):
        psi_timeline(df, df, "value", "ts")
    with _pytest.raises(ValueError, match="must exceed"):
        psi_timeline(df, df, "value", "ts", lo=5.0, hi=1.0)


def test_has_stable_timeline_gate(spark):
    """The gate passes on stable days, and a single drifted day fails
    it with the period named — the failure the corpus-level PSI gate
    cannot produce."""
    import pyspark.sql.functions as F

    def day(d, base, n=200):
        return [(f"2024-03-0{d} 0{h}:00:00", float(base + (i % 50)))
                for h in range(1, 3) for i in range(n)]

    mk = lambda rows: spark.createDataFrame(rows, "ts string, v double") \
        .select(F.col("ts").cast("timestamp").alias("ts"), "v")
    ref = mk(day(1, 0))
    ok = ValidationSuite.builder("drift").with_check(
        Check("d", Level.ERROR).has_stable_timeline(
            ref, "v", "ts", max_psi=0.25, lo=0.0, hi=500.0))
    assert ok.run(spark, mk(day(2, 0) + day(3, 0))).passed

    bad = ValidationSuite.builder("drift").with_check(
        Check("d", Level.ERROR).has_stable_timeline(
            ref, "v", "ts", max_psi=0.25, lo=0.0, hi=500.0))
    res = bad.run(spark, mk(day(2, 0) + day(3, 400)))
    assert not res.passed
    msg = [x.message for x in res.report.issues][0]
    assert "2024-03-03" in msg and "exceeds" in msg


def test_benford_deviation_math_and_filters(spark):
    """Benford screen (round 13): per-digit shares, literal
    expectations, 3σ band verdict; NULLs and sub-1 values dropped."""
    from term_spark.operators.drift import (BENFORD_EXPECTED,
                                            benford_deviation)
    # 30 ones, 10 twos, 10 nines; 0.5 has first digit 5 (sub-1
    # magnitudes count — the family's first_digit convention); NULL
    # and exact zero have no first digit and drop
    rows = ([(float(100 + i),) for i in range(30)]
            + [(float(200 + i),) for i in range(10)]
            + [(float(900 + i),) for i in range(9)]
            + [(None,), (0.5,), (0.0,)])
    df = spark.createDataFrame(rows, "v double")
    out = {r["digit"]: r for r in benford_deviation(df, "v").collect()}
    assert set(out) == {1, 2, 5, 9}
    assert out[1]["n"] == 30 and out[2]["n"] == 10 and out[5]["n"] == 1
    assert out[1]["observed"] == 0.6
    assert out[1]["expected"] == round(BENFORD_EXPECTED[1], 6)
    assert out[9]["observed"] == 0.18
    # 0.6 vs 0.30103 at N=50: band = 3*sqrt(.30103*.69897/50) ~ 0.195
    assert not out[1]["within_band"]
    abs_dev = out[1]["abs_dev"]
    assert abs(abs_dev - abs(0.6 - BENFORD_EXPECTED[1])) < 1e-6


def test_benford_conformant_sample_passes(spark):
    """A synthetic exactly-Benford-weighted sample sits inside the
    band for every digit."""
    from term_spark.operators.drift import (BENFORD_EXPECTED,
                                            benford_deviation)
    rows = []
    for d, p in BENFORD_EXPECTED.items():
        rows += [(float(d) * 10,)] * round(p * 10000)
    df = spark.createDataFrame(rows, "v double")
    out = benford_deviation(df, "v").collect()
    assert len(out) == 9
    assert all(r["within_band"] for r in out)
