"""Fluent-API wiring for the round-4 PII and PSI operators:
Check.has_no_pii (fused-agg scalar protocol) and
Check.has_stable_distribution (self-executing PSI vs a reference
snapshot)."""

import pytest

from term_spark import Assertion, Check, Level, ValidationSuite


@pytest.fixture()
def corpus(spark):
    rows = [
        (1, "clean text about spark and data"),
        (2, "mail me at a@b.io please"),                # email
        (3, "pan 4111111111111111 charged"),            # Luhn-valid card
        (4, "order id 1234567890123456 shipped"),       # NOT PII (no Luhn)
        (5, "another perfectly clean row"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_has_no_pii_fails_on_planted_pii(spark, corpus):
    suite = ValidationSuite.builder("gate").with_check(
        Check("corpus", Level.ERROR).has_no_pii("text"))
    res = suite.run(spark, corpus)
    assert not res.passed
    msg = [x.message for x in res.report.issues][0]
    assert "2 of 5" in msg  # docs 2 and 3; doc 4's non-Luhn id doesn't count


def test_has_no_pii_respects_kinds_and_ratio(spark, corpus):
    # email-only scan: 1 of 5 rows affected -> passes at max_ratio=0.2
    suite = ValidationSuite.builder("gate").with_check(
        Check("corpus", Level.ERROR)
        .has_no_pii("text", kinds=["email"], max_ratio=0.2))
    assert suite.run(spark, corpus).passed

    clean = corpus.filter("doc_id in (1, 4, 5)")
    suite2 = ValidationSuite.builder("gate").with_check(
        Check("corpus", Level.ERROR).has_no_pii("text"))
    assert suite2.run(spark, clean).passed


def test_has_no_pii_rides_fused_agg(spark, corpus):
    """The PII gate plus ordinary scalar checks must still execute as
    ONE aggregation job over the table (the suite's design center)."""
    from term_spark.telemetry import DebugContext, DebugLevel

    suite = ValidationSuite.builder("gate").with_check(
        Check("corpus", Level.ERROR)
        .has_size(Assertion.gt(0))
        .is_complete("text")
        .has_no_pii("text"))
    dbg = DebugContext(DebugLevel.DETAILED)
    res = suite.run(spark, corpus, debug=dbg)
    assert not res.passed  # planted PII still fails it
    fused = [q for q in dbg.queries if q.query.startswith("fused agg")]
    own = [q for q in dbg.queries if q.query.startswith("own job")]
    assert len(fused) == 1 and not own  # PII metrics share the one scan


def test_has_stable_distribution_passes_and_fails(spark):
    ref = spark.createDataFrame(
        [(float(i % 50),) for i in range(1000)], "v double")
    same = spark.createDataFrame(
        [(float((i * 7) % 50),) for i in range(1000)], "v double")
    shifted = spark.createDataFrame(
        [(200.0 + i % 20,) for i in range(1000)], "v double")

    ok = ValidationSuite.builder("drift").with_check(
        Check("d", Level.ERROR)
        .has_stable_distribution(ref, "v", max_psi=0.1, lo=0.0, hi=50.0))
    assert ok.run(spark, same).passed

    bad = ValidationSuite.builder("drift").with_check(
        Check("d", Level.ERROR)
        .has_stable_distribution(ref, "v", max_psi=0.25, lo=0.0, hi=50.0))
    res = bad.run(spark, shifted)
    assert not res.passed
    assert "PSI" in [x.message for x in res.report.issues][0]


def test_has_stable_distribution_degenerate_domain_is_error(spark):
    ref = spark.createDataFrame([(1.0,)] * 5, "v double")
    cur = spark.createDataFrame([(1.0,)] * 5, "v double")
    suite = ValidationSuite.builder("drift").with_check(
        Check("d", Level.ERROR).has_stable_distribution(ref, "v"))
    res = suite.run(spark, cur)
    assert not res.passed  # surfaces as an error outcome, not a crash
