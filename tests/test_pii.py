"""PII detection/redaction: planted-PII fixtures (the synthetic corpus
has none, so the operator is verified on crafted rows)."""

import pyspark.sql.functions as F
import pytest


@pytest.fixture()
def pii_docs(spark):
    rows = [
        (1, "contact john.doe+spam@example.co.uk or call 555-867-5309 now"),
        (2, "server at 192.168.1.100 logged ssn 123-45-6789 twice"),
        (3, "card 4111-1111-1111-1111 and card 5500000000000004 on file"),
        (4, "perfectly clean text with no identifiers at all"),
        (5, "mixed: a@b.io, 10.0.0.1, (415) 555-1234"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pii_counts(spark, pii_docs):
    from term_spark.operators.pii import pii_counts

    rows = {r["doc_id"]: r for r in pii_counts(pii_docs).collect()}
    assert rows[1]["n_email"] == 1 and rows[1]["n_phone"] == 1
    assert rows[2]["n_ipv4"] == 1 and rows[2]["n_ssn"] == 1
    assert rows[3]["n_credit_card"] == 2
    assert rows[4]["n_pii"] == 0 and not rows[4]["has_pii"]
    assert rows[5]["n_email"] == 1 and rows[5]["n_ipv4"] == 1
    assert rows[5]["n_phone"] == 1 and rows[5]["has_pii"]


def test_redact_pii_masks_everything(spark, pii_docs):
    from term_spark.operators.pii import pii_counts, redact_pii

    red = redact_pii(pii_docs)
    # after redaction, a second scan finds nothing
    assert all(r["n_pii"] == 0 for r in pii_counts(red).collect())
    texts = {r["doc_id"]: r["text"] for r in red.collect()}
    assert "[EMAIL]" in texts[1] and "[PHONE]" in texts[1]
    assert "[IPV4]" in texts[2] and "[SSN]" in texts[2]
    assert texts[3].count("[CREDIT_CARD]") == 2
    assert texts[4] == "perfectly clean text with no identifiers at all"


def test_redact_pii_output_col_and_kind_subset(spark, pii_docs):
    from term_spark.operators.pii import redact_pii

    red = redact_pii(pii_docs, kinds=["email"], output_col="clean")
    r = {x["doc_id"]: x for x in red.collect()}
    assert "[EMAIL]" in r[1]["clean"] and "555-867-5309" in r[1]["clean"]
    assert r[1]["text"].startswith("contact john")  # original untouched

    with pytest.raises(ValueError):
        redact_pii(pii_docs, kinds=["email", "nope"])


def test_corpus_pii_summary(spark, pii_docs):
    from term_spark.operators.pii import corpus_pii_summary

    row = corpus_pii_summary(pii_docs).collect()[0]
    assert row["n_docs"] == 5 and row["docs_with_pii"] == 4
    assert row["total_email"] == 2 and row["docs_with_email"] == 2
    assert row["total_credit_card"] == 2 and row["docs_with_credit_card"] == 1


def test_pii_scan_is_codegen_only(spark, pii_docs):
    """No Python execution nodes in the plan — the scan must stay JVM-side."""
    from term_spark.operators.pii import pii_counts

    plan = pii_counts(pii_docs)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# URLs / domains
# ---------------------------------------------------------------------------

@pytest.fixture()
def url_docs(spark):
    rows = [
        (1, "see https://spam.example.com/a and http://ok.org/page?q=1"),
        (2, "mirror at https://cdn.spam.example.com/x plus https://ok.org/2"),
        (3, "only good: https://docs.python.org/3/"),
        (4, "no links here at all"),
        (5, "creds http://user:pw@evil.net:8080/p and https://OK.org/z"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_url_and_domain_counts(spark, url_docs):
    from term_spark.operators.pii import domain_counts, url_counts

    rows = {r["doc_id"]: r for r in url_counts(url_docs).collect()}
    assert rows[1]["n_urls"] == 2 and sorted(rows[1]["domains"]) == [
        "ok.org", "spam.example.com"]
    assert rows[4]["n_urls"] == 0 and rows[4]["domains"] == []
    assert rows[5]["domains"] == ["evil.net:8080", "ok.org"] or \
        "evil.net" in rows[5]["domains"][0]  # port keeps the host identifiable

    dom = {r["domain"]: (r["n_docs"], r["n_urls"])
           for r in domain_counts(url_docs).collect()}
    assert dom["ok.org"] == (3, 3)
    assert dom["spam.example.com"] == (1, 1)


def test_blocklist_filter_subdomains(spark, url_docs):
    from term_spark.operators.pii import blocklist_filter

    kept = sorted(r["doc_id"] for r in blocklist_filter(
        url_docs, ["spam.example.com"]).collect())
    assert kept == [3, 4, 5]  # doc 2's cdn. subdomain is blocked too

    kept_exact = sorted(r["doc_id"] for r in blocklist_filter(
        url_docs, ["spam.example.com"], match_subdomains=False).collect())
    assert kept_exact == [2, 3, 4, 5]


def test_credit_card_requires_luhn(spark):
    """A bare 16-digit integer is only a card if the Luhn checksum holds
    — order ids / hashes / timestamps must survive counting AND redaction."""
    from term_spark.operators.pii import pii_counts, redact_pii

    rows = [
        (1, "order id 1234567890123456 shipped"),        # Luhn-invalid
        (2, "pan 4111111111111111 charged"),             # Luhn-valid Visa
        (3, "pan 4111-1111-1111-1111 charged"),          # separator form
        (4, "ts 1700000000000000 and 5500000000000004"),  # invalid + valid
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    counts = {r["doc_id"]: r["n_credit_card"]
              for r in pii_counts(df, kinds=["credit_card"]).collect()}
    assert counts == {1: 0, 2: 1, 3: 1, 4: 1}

    texts = {r["doc_id"]: r["text"]
             for r in redact_pii(df, kinds=["credit_card"]).collect()}
    assert texts[1] == "order id 1234567890123456 shipped"  # untouched
    assert texts[2] == "pan [CREDIT_CARD] charged"
    assert texts[3] == "pan [CREDIT_CARD] charged"
    assert "1700000000000000" in texts[4] and "[CREDIT_CARD]" in texts[4]


def test_luhn_validation_stays_jvm_side(spark):
    from term_spark.operators.pii import pii_counts, redact_pii

    df = spark.createDataFrame([(1, "pan 4111111111111111")],
                               "doc_id long, text string")
    for q in (pii_counts(df), redact_pii(df)):
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "BatchEvalPython" not in plan


def test_ipv6_detection_and_redaction(spark):
    from term_spark.operators.pii import pii_counts, redact_pii

    rows = [
        (1, "host 2001:0db8:85a3:0000:0000:8a2e:0370:7334 up"),  # full form
        (2, "link fe80::1 and loopback ::1"),                     # compressed
        (3, "std::vector<int> and a dead:beef word"),             # code, no digit
        (4, "router at 2001:db8::8a2e:370:7334 replied"),         # mid ::
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    c = {r["doc_id"]: r["n_ipv6"]
         for r in pii_counts(df, kinds=["ipv6"]).collect()}
    assert c == {1: 1, 2: 2, 3: 0, 4: 1}

    texts = {r["doc_id"]: r["text"]
             for r in redact_pii(df, kinds=["ipv6"]).collect()}
    assert texts[1] == "host [IPV6] up"
    assert texts[2] == "link [IPV6] and loopback [IPV6]"
    assert texts[3] == "std::vector<int> and a dead:beef word"
    assert texts[4] == "router at [IPV6] replied"


def test_phone_e164_detection(spark):
    from term_spark.operators.pii import pii_counts, redact_pii

    rows = [
        (1, "call +14155551234 or +442071838750 today"),
        (2, "equation 2+345678901 is not a phone"),   # '+' mid-expression
        (3, "short +1234 stays"),                     # below 7 digits
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    c = {r["doc_id"]: r["n_phone_e164"]
         for r in pii_counts(df, kinds=["phone_e164"]).collect()}
    assert c == {1: 2, 2: 0, 3: 0}

    out = redact_pii(df, kinds=["phone_e164"]).collect()
    texts = {r["doc_id"]: r["text"] for r in out}
    assert texts[1] == "call [PHONE_E164] or [PHONE_E164] today"
    assert texts[2] == "equation 2+345678901 is not a phone"


def test_pii_counts_null_text_is_zero_not_null(spark):
    from term_spark.operators.pii import pii_counts

    df = spark.createDataFrame([(1, None), (2, "a@b.io")],
                               "doc_id long, text string")
    rows = {r["doc_id"]: r for r in pii_counts(df).collect()}
    assert rows[1]["n_pii"] == 0 and rows[1]["has_pii"] is False
    # a ~has_pii clean filter must KEEP the NULL-text doc
    clean = pii_counts(df).filter(~F.col("has_pii")).count()
    assert clean == 1


def test_redact_parenthesized_phone_leaves_no_artifact(spark):
    from term_spark.operators.pii import redact_pii

    df = spark.createDataFrame([(1, "call (415) 555-1234 now")],
                               "doc_id long, text string")
    out = redact_pii(df).collect()[0]["text"]
    assert out == "call [PHONE] now"  # the '(' is consumed by the mask


def test_badwords_filter_whole_words_only(spark):
    from term_spark.operators.pii import badwords_filter, badwords_ratio
    df = spark.createDataFrame(
        [(1, "a perfectly clean document"),
         (2, "contains BADWORD right here"),          # case-insensitive hit
         (3, "an associate of the classic false positive"),  # no hit
         (4, "badword and another badword"),          # 2 hits
         (5, None)],
        "doc_id long, text string")
    terms = ["badword", "ass"]

    kept = badwords_filter(df, terms)
    assert {r["doc_id"] for r in kept.collect()} == {1, 3, 5}

    tolerant = badwords_filter(df, terms, max_hits=1)
    assert {r["doc_id"] for r in tolerant.collect()} == {1, 2, 3, 5}

    row = badwords_ratio(df, terms).collect()[0]
    assert (row["n_docs"], row["docs_flagged"], row["total_hits"]) == (4, 2, 3)
    assert row["flag_ratio"] == 0.5


def test_badwords_filter_escapes_regex_metachars(spark):
    from term_spark.operators.pii import badwords_filter
    df = spark.createDataFrame(
        [(1, "price is $9.99 today"), (2, "price is $9X99 today")],
        "doc_id long, text string")
    # the dot must match LITERALLY, not any char
    kept = badwords_filter(df, ["$9.99"])
    assert {r["doc_id"] for r in kept.collect()} == {2}


def test_badwords_filter_validates_terms(spark):
    import pytest as _pt

    from term_spark.operators.pii import badwords_filter
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with _pt.raises(ValueError, match="empty term list"):
        badwords_filter(df, ["", "  "])


def test_oracle_re2_patterns_match_pii_patterns():
    """The driver-oracle's RE2 spellings (queries_llm._PII_RE2) must be
    byte-identical to the operator's PII_PATTERNS for every RE2-portable
    kind — the oracle rows prove the REAL patterns, and this pin stops
    the two tables from drifting apart silently."""
    from term_spark.operators.pii import PII_PATTERNS
    from term_spark.queries_llm import _PII_KINDS, _PII_RE2

    assert set(_PII_RE2) == set(_PII_KINDS)
    for kind in _PII_KINDS:
        assert _PII_RE2[kind] == PII_PATTERNS[kind], kind
    # redaction order is PII_PATTERNS order — the oracle kinds must be
    # listed in that same order or redact_pii masks in a different
    # sequence than the query documents
    order = [k for k in PII_PATTERNS if k in _PII_KINDS]
    assert list(_PII_KINDS) == order


def _run_suite(spark, df, check):
    from term_spark import ValidationSuite
    r = (ValidationSuite.builder("pii_gates").with_check(check)
         .run(spark, {"data": df}))
    return r.report.outcomes[0].result


def test_has_acceptable_badwords_ratio_gate(spark):
    from term_spark.core.check import Check, Level
    df = spark.createDataFrame(
        [(1, "totally clean text"), (2, "a slow day"), (3, None)],
        "doc_id long, text string")
    ok = _run_suite(spark, df, Check("bw", Level.ERROR)
                    .has_acceptable_badwords_ratio("text", ["slow"],
                                                   max_ratio=0.5))
    assert ok.status.value == "success" and ok.metric == pytest.approx(1 / 3)
    bad = _run_suite(spark, df, Check("bw", Level.ERROR)
                     .has_acceptable_badwords_ratio("text", ["slow"]))
    assert bad.status.value == "failure"
    assert "blocklisted term" in bad.message


def test_has_no_blocked_domains_gate_subdomains(spark):
    from term_spark.core.check import Check, Level
    df = spark.createDataFrame(
        [(1, "see https://ok.example.org/x"),
         (2, "see https://spam.bad.site/y"),
         (3, "see https://u@BAD.SITE:8080/z"),   # creds+port+case
         (4, "no urls here"),
         (5, None)],
        "doc_id long, text string")
    gate = _run_suite(spark, df, Check("bl", Level.ERROR)
                      .has_no_blocked_domains("text", ["bad.site"]))
    assert gate.status.value == "failure"
    assert gate.metric == pytest.approx(2 / 5)
    exact_only = _run_suite(
        spark, df, Check("bl", Level.ERROR)
        .has_no_blocked_domains("text", ["bad.site"], max_ratio=0.25,
                                match_subdomains=False))
    # only row 3 matches exactly -> 1/5 <= 0.25
    assert exact_only.status.value == "success"
    assert exact_only.metric == pytest.approx(1 / 5)


def test_blocked_domains_validates_inputs(spark):
    import pytest as _pt

    from term_spark.operators.pii import BlockedDomainsConstraint
    with _pt.raises(ValueError, match="empty domain list"):
        BlockedDomainsConstraint("text", ["", " "])
    with _pt.raises(ValueError, match="max_ratio"):
        BlockedDomainsConstraint("text", ["x.com"], max_ratio=1.5)


def test_metric_aliases_cover_full_constraint_identity():
    """Round-12 advice pins: the fused-agg executor dedups expressions
    BY ALIAS, so an alias must cover everything the expression depends
    on — the FULL domain list (not a prefix) and the subdomain flag —
    and must be deterministic across driver processes (no builtin
    hash(), which PYTHONHASHSEED salts)."""
    from term_spark.operators.pii import (BadwordsConstraint,
                                          BlockedDomainsConstraint)

    base = ["d0.com", "d1.com", "d2.com", "d3.com",
            "d4.com", "d5.com", "d6.com", "d7.com"]
    a = BlockedDomainsConstraint("text", base + ["evil.com"])
    b = BlockedDomainsConstraint("text", base + ["other.com"])
    assert a._hits != b._hits          # differ only past the 8th domain
    c = BlockedDomainsConstraint("text", base, match_subdomains=True)
    d = BlockedDomainsConstraint("text", base, match_subdomains=False)
    assert c._hits != d._hits          # flag changes the expression
    e = BlockedDomainsConstraint("text", list(reversed(base)))
    assert c._hits == e._hits          # list order is NOT identity

    bw1 = BadwordsConstraint("text", ["foo", "bar"])
    bw2 = BadwordsConstraint("text", ["foo", "bar"])
    bw3 = BadwordsConstraint("text", ["foo", "baz"])
    assert bw1._hits == bw2._hits      # deterministic, process-stable
    assert bw1._hits != bw3._hits
