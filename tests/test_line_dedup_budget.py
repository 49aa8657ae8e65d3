"""Planted-fixture tests for line-level corpus dedup
(text.dedup_lines / line_dedup_summary) and greedy token-budget
sampling (curation.token_budget_sample).  The contract queries'
DuckDB parity runs in test_oracle_parity (the synthetic corpus is
single-line, so the interesting removal behavior is proven here)."""

import pytest

import pyspark.sql.functions as F

from term_spark.operators.curation import token_budget_sample
from term_spark.operators.text import dedup_lines, line_dedup_summary

BOILER = "accept cookies to continue"


@pytest.fixture()
def lined_docs(spark):
    rows = [
        (1, f"{BOILER}\nunique one\nshared tail"),
        (2, f"{BOILER}\nunique two\nshared tail"),
        (3, f"unique three\n{BOILER}"),
        (4, BOILER),                      # all boilerplate
        (5, "entirely original text"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dedup_lines_strips_corpus_duplicates(spark, lined_docs):
    cleaned, _ = dedup_lines(lined_docs)
    got = {r["doc_id"]: r["text"] for r in cleaned.collect()}
    # BOILER (x4) and "shared tail" (x2) are corpus-duplicated -> gone
    assert got == {
        1: "unique one",
        2: "unique two",
        3: "unique three",
        5: "entirely original text",
    }  # doc 4 was all boilerplate and disappears


def test_dedup_lines_preserves_order_and_min_count(spark):
    df = spark.createDataFrame(
        [(1, "alpha\nbeta\ngamma"), (2, "beta\ndelta")],
        "doc_id long, text string")
    cleaned, _ = dedup_lines(df, min_count=3)   # no line occurs 3x
    got = {r["doc_id"]: r["text"] for r in cleaned.collect()}
    assert got == {1: "alpha\nbeta\ngamma", 2: "beta\ndelta"}
    cleaned2, _ = dedup_lines(df, min_count=2)  # beta occurs 2x -> dropped
    got2 = {r["doc_id"]: r["text"] for r in cleaned2.collect()}
    assert got2 == {1: "alpha\ngamma", 2: "delta"}


def test_line_dedup_summary_accounting(spark, lined_docs):
    row = line_dedup_summary(lined_docs).collect()[0]
    # 5 docs; lines: doc1:3 doc2:3 doc3:2 doc4:1 doc5:1 = 10 instances
    assert row["n_docs"] == 5
    assert row["total_lines"] == 10
    # distinct: BOILER, unique one/two/three, shared tail, original = 6
    assert row["distinct_lines"] == 6
    # dup instances: BOILER x4 + shared tail x2 = 6
    assert row["dup_line_instances"] == 6
    assert row["chars_removed"] == 4 * len(BOILER) + 2 * len("shared tail")


def test_dedup_lines_null_text_is_dropped(spark):
    df = spark.createDataFrame(
        [(1, "keep me"), (2, None)], "doc_id long, text string")
    cleaned, _ = dedup_lines(df)
    assert {r["doc_id"] for r in cleaned.collect()} == {1}
    assert line_dedup_summary(df).collect()[0]["n_docs"] == 1


@pytest.fixture()
def budget_docs(spark):
    # token counts: a1=4, a2=3, a3=2 ; b1=5, b2=5
    rows = [
        (1, "w w w w", "a"),
        (2, "w w w", "a"),
        (3, "w w", "a"),
        (4, "w w w w w", "b"),
        (5, "w w w w w", "b"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_token_budget_is_never_exceeded_and_deterministic(spark, budget_docs):
    kept = token_budget_sample(budget_docs, 7, by="source")
    per = {r["source"]: r["tot"] for r in
           kept.groupBy("source").agg(F.sum("__n_tokens").alias("tot")).collect()}
    assert all(v <= 7 for v in per.values())
    ids1 = sorted(r["doc_id"] for r in kept.collect())
    ids2 = sorted(r["doc_id"] for r in
                  token_budget_sample(budget_docs, 7, by="source").collect())
    assert ids1 == ids2 and ids1  # deterministic, non-empty


def test_token_budget_greedy_prefix_no_backfill(spark, budget_docs):
    # budget 5 in source b: both docs are 5 tokens; exactly the first
    # in hash order fits, the second would exceed -> 1 kept
    kept = token_budget_sample(budget_docs, 5, by="source")
    b = [r for r in kept.collect() if r["source"] == "b"]
    assert len(b) == 1 and b[0]["__cum_tokens"] == 5
    # a generous budget keeps everything
    assert token_budget_sample(budget_docs, 100, by="source").count() == 5


def test_token_budget_validates_input(spark, budget_docs):
    with pytest.raises(ValueError, match="budget_tokens"):
        token_budget_sample(budget_docs, 0)


def test_curate_corpus_with_clean_and_line_dedup_stages(spark):
    from term_spark.operators.curation import curate_corpus
    rows = [
        (1, "accept  cookies\nreal content one", "en", "web"),
        (2, "accept  cookies\nreal content two", "en", "web"),
        (3, "accept  cookies", "en", "web"),          # all boilerplate
        (4, "a perfectly fine “standalone” doc with the and of is", "en", "web"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    curated, report = curate_corpus(
        df, min_quality=0.0, clean_first=True, line_dedup_min_count=3)
    got = {r["doc_id"]: r["text"] for r in curated.collect()}
    # the cleaned boilerplate line ("accept cookies", whitespace
    # collapsed by clean_first) repeats 3x -> stripped; doc 3 vanishes
    assert set(got) == {1, 2, 4}
    assert got[1] == "real content one"
    assert got[4].startswith('a perfectly fine "standalone" doc')
    assert report.after_line_dedup == 3
    assert report.stages["line_dedup"] == 3
    # payload columns survive the line-dedup rejoin
    assert {f.name for f in curated.schema.fields} >= {"lang", "source"}


def test_dedup_lines_rejects_min_count_below_two(spark, lined_docs):
    # min_count=1 would keep lines occurring "< 1 time" — i.e. delete
    # the entire corpus silently (ADVICE r5); must raise instead.
    with pytest.raises(ValueError, match="min_count"):
        dedup_lines(lined_docs, min_count=1)
    with pytest.raises(ValueError, match="min_count"):
        from term_spark.operators.curation import curate_corpus
        curate_corpus(lined_docs, min_quality=0.0, line_dedup_min_count=1)


def test_dedup_lines_regex_special_separator_round_trips(spark):
    # '|' is regex-special; an unquoted F.split would split on EVERY
    # character while array_join reassembles with a literal '|',
    # corrupting the round-trip (ADVICE r5).
    df = spark.createDataFrame(
        [(1, "alpha|beta|gamma"), (2, "beta|delta")],
        "doc_id long, text string")
    cleaned, _ = dedup_lines(df, min_count=3, sep="|")  # nothing dropped
    got = {r["doc_id"]: r["text"] for r in cleaned.collect()}
    assert got == {1: "alpha|beta|gamma", 2: "beta|delta"}
    cleaned2, _ = dedup_lines(df, min_count=2, sep="|")  # beta x2 dropped
    got2 = {r["doc_id"]: r["text"] for r in cleaned2.collect()}
    assert got2 == {1: "alpha|gamma", 2: "delta"}
    row = line_dedup_summary(df, min_count=2, sep="|").collect()[0]
    assert row["total_lines"] == 5 and row["distinct_lines"] == 4
    assert row["dup_line_instances"] == 2


def test_dedup_paragraphs_strips_corpus_duplicates(spark):
    """Paragraph tier (round 9): a boilerplate paragraph repeated
    across documents is dropped everywhere; unique paragraphs survive
    in original order, reassembled with a blank line; a document that
    was ALL boilerplate disappears from cleaned output."""
    from term_spark.operators.text import (dedup_paragraphs,
                                           paragraph_dedup_summary)

    boiler = "subscribe to our newsletter\nfor more updates"
    rows = [
        (1, f"intro one\n\n{boiler}\n\nbody one"),
        (2, f"{boiler}\n\nbody two"),
        (3, boiler),                       # all boilerplate
        (4, "unique document\n\nwith two paragraphs"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cleaned, tagged = dedup_paragraphs(df, min_count=2)
    got = {r["doc_id"]: r["text"] for r in cleaned.collect()}
    assert got == {1: "intro one\n\nbody one",
                   2: "body two",
                   4: "unique document\n\nwith two paragraphs"}
    assert 3 not in got
    # the per-instance table carries fingerprints and corpus counts
    hot = {r["para"] for r in tagged.collect() if r["n_corpus"] >= 2}
    assert hot == {boiler}

    row = paragraph_dedup_summary(df, min_count=2).collect()[0]
    assert row["n_docs"] == 4
    assert row["total_paras"] == 8
    assert row["distinct_paras"] == 6          # boiler counted once
    assert row["dup_para_instances"] == 3
    assert row["chars_removed"] == 3 * len(boiler)


def test_dedup_paragraphs_rejects_min_count_below_two(spark):
    import pytest
    from term_spark.operators.text import dedup_paragraphs

    df = spark.createDataFrame([(1, "a\n\nb")], "doc_id long, text string")
    with pytest.raises(ValueError, match="min_count"):
        dedup_paragraphs(df, min_count=1)
