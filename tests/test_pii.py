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
