"""text.clean_text / text_cleaning_summary — planted fixtures for each
cleanup stage (the synthetic corpus is plain ASCII, so the contract
query's interesting behavior is proven here; DuckDB parity for
text_cleaning_docs runs in test_oracle_parity)."""

import pyspark.sql.functions as F
import pytest

from term_spark.operators.text import clean_text, text_cleaning_summary


def _clean_one(spark, s):
    df = spark.createDataFrame([(s,)], "text string")
    return df.select(clean_text("text").alias("c")).collect()[0]["c"]


def test_strips_control_and_zero_width(spark):
    assert _clean_one(spark, "a\x00b\x07c\x7fd") == "abcd"
    assert _clean_one(spark, "zero​width‍ joi﻿ner") == \
        "zerowidth joiner"


def test_normalizes_unicode_spaces_and_punctuation(spark):
    assert _clean_one(spark, "non breaking space") == \
        "non breaking space"
    assert _clean_one(spark, "“quoted” ‘single’ a–b—c") == \
        "\"quoted\" 'single' a-b-c"


def test_collapses_whitespace_and_blank_lines(spark):
    assert _clean_one(spark, "a   b\t\tc") == "a b c"
    assert _clean_one(spark, "p1\n\n\n\np2") == "p1\n\np2"
    # blank lines holding stray spaces still collapse
    assert _clean_one(spark, "p1\n  \n  \np2") == "p1\n\np2"
    assert _clean_one(spark, "  padded  ") == "padded"


def test_keeps_tabs_newlines_semantics(spark):
    # \t collapses into the space run; single \n survives
    assert _clean_one(spark, "line1\nline2") == "line1\nline2"


def test_clean_text_is_idempotent(spark):
    dirty = "“A” \x00 b c\n\n\n\nd   e​"
    once = _clean_one(spark, dirty)
    assert _clean_one(spark, once) == once


def test_cleaning_summary_accounting(spark):
    df = spark.createDataFrame(
        [(1, "already clean"),
         (2, "dirty\x00text"),          # 1 char removed
         (3, "a b"),               # changed, same length
         (4, None)],
        "doc_id long, text string")
    row = text_cleaning_summary(df).collect()[0]
    assert row["n_docs"] == 3
    assert row["docs_changed"] == 2
    assert row["chars_before"] - row["chars_after"] == 1


def test_clean_docs_pipeline_composes(spark):
    # cleaned text feeds the identity normalizer without surprises
    from term_spark.operators.text import normalize_text
    df = spark.createDataFrame(
        [(1, "“Hello,”  world—and more")],
        "doc_id long, text string")
    out = df.select(
        normalize_text(clean_text("text")).alias("n")).collect()[0]["n"]
    assert out == "hello world and more"


def test_readability_separates_simple_from_jargon(spark):
    from term_spark.operators.text import readability
    rows = [
        (1, "The cat sat. The dog ran. We had fun."),
        (2, "Notwithstanding heterogeneous organizational interdependencies, "
            "multidimensional stakeholder prioritization methodologies "
            "necessitate comprehensive infrastructural reconceptualization."),
        (3, ""),
        (4, None),
        (5, "No terminal punctuation here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in readability(df).collect()}
    assert out[1]["flesch_ease"] > 80          # easy text scores high
    assert out[2]["flesch_ease"] < 0           # dense jargon goes negative
    assert out[2]["fk_grade"] > 20
    assert out[1]["n_sentences"] == 3
    # empty/NULL keep the row with NULL scores ("empty" is a finding)
    assert out[3]["n_words"] == 0 and out[3]["flesch_ease"] is None
    assert out[4]["n_words"] == 0 and out[4]["fk_grade"] is None
    # fragment floors at one sentence
    assert out[5]["n_sentences"] == 1
    # syllables floored at word count (every word >= 1)
    assert all(r["n_syllables"] >= r["n_words"] for r in out.values()
               if r["n_syllables"] is not None)


def test_has_readable_text_gate_rides_fused_agg(spark):
    from term_spark import Check, Level, ValidationSuite
    easy = [(i, "The cat sat. The dog ran. We had fun today.")
            for i in range(9)]
    jargon = [(100, "Notwithstanding heterogeneous organizational "
                    "interdependencies multidimensional prioritization "
                    "methodologies necessitate reconceptualization.")]
    ok_df = spark.createDataFrame(easy + jargon, "doc_id long, text string")
    res = ValidationSuite.builder("r").with_check(
        Check("r", Level.ERROR).has_readable_text(min_ratio=0.9)).run(
        spark, ok_df)
    assert res.passed                       # 9/10 in band

    bad = ValidationSuite.builder("r").with_check(
        Check("r", Level.ERROR).has_readable_text(min_ratio=0.95)).run(
        spark, ok_df)
    assert not bad.passed
    assert "readable_text" in [x.message for x in bad.report.issues][0]

    # blank-only corpus -> skipped, not a bogus pass/fail
    from term_spark.core.result import Status
    blank = spark.createDataFrame([(1, ""), (2, None)],
                                  "doc_id long, text string")
    sk = ValidationSuite.builder("r").with_check(
        Check("r", Level.ERROR).has_readable_text()).run(spark, blank)
    statuses = [o.result.status for o in sk.report.outcomes]
    assert Status.SKIPPED in statuses

    import pytest as _pt
    with _pt.raises(ValueError):
        Check("r", Level.ERROR).has_readable_text(min_ease=50, max_ease=40)


def test_readability_gate_fuses_with_other_constraints(spark):
    """The gate's two count expressions must ride the SAME fused
    aggregation as the other scalar constraints — one scan total."""
    import re
    from term_spark import Assertion, Check, Level, ValidationSuite
    df_rows = [(i, f"Plain sentence number {i}. It reads fine.")
               for i in range(20)]
    df = spark.createDataFrame(df_rows, "doc_id long, text string")
    suite = (ValidationSuite.builder("fuse")
             .with_check(Check("c", Level.ERROR)
                         .is_complete("text")
                         .has_readable_text(min_ratio=0.5)
                         .has_min("doc_id", Assertion.ge(0))))
    text = suite.explain(spark, df)
    agg_blocks = re.findall(r"\(\d+\) HashAggregate", text)
    # partial + final of ONE fused aggregate, no extra scan pair
    assert len(agg_blocks) <= 2, text


def test_passes_gopher_rules_gate_rides_fused_agg(spark):
    """Round-8 suite form of the Gopher bundle: pass/fail thresholds,
    NULL-as-fail denominator, empty-table skip, and the two count
    expressions fusing into the suite's single shared aggregation."""
    import re
    from term_spark import Assertion, Check, Level, ValidationSuite
    from term_spark.core.result import Status

    good = [(i, "This is a perfectly ordinary paragraph of well formed "
                "prose that keeps going with sensible words and normal "
                "structure throughout the entire document body here again "
                "and then some more ordinary filler words to pass the "
                "fifty word minimum rule of the bundle easily by now "
                "with room to spare for every single threshold check")
            for i in range(8)]
    junk = [(100, "short"), (101, None)]
    df = spark.createDataFrame(good + junk, "doc_id long, text string")

    ok = ValidationSuite.builder("g").with_check(
        Check("g", Level.ERROR).passes_gopher_rules(min_pass_ratio=0.8)).run(
        spark, df)
    assert ok.passed                        # 8/10 pass, NULL counts as fail

    bad = ValidationSuite.builder("g").with_check(
        Check("g", Level.ERROR).passes_gopher_rules(min_pass_ratio=0.9)).run(
        spark, df)
    assert not bad.passed
    assert "gopher_quality" in [x.message for x in bad.report.issues][0]

    # tunable thresholds reach the fused expression
    tuned = ValidationSuite.builder("g").with_check(
        Check("g", Level.ERROR).passes_gopher_rules(
            min_pass_ratio=0.9, min_words=1)).run(spark, df)
    assert tuned.passed                     # "short" now passes too (9/10)

    empty = spark.createDataFrame([], "doc_id long, text string")
    sk = ValidationSuite.builder("g").with_check(
        Check("g", Level.ERROR).passes_gopher_rules()).run(spark, empty)
    assert Status.SKIPPED in [o.result.status for o in sk.report.outcomes]

    import pytest as _pt
    with _pt.raises(ValueError, match="unknown gopher"):
        Check("g", Level.ERROR).passes_gopher_rules(max_typo_ratio=0.1)
    with _pt.raises(ValueError, match="min_pass_ratio"):
        Check("g", Level.ERROR).passes_gopher_rules(min_pass_ratio=1.5)

    suite = (ValidationSuite.builder("fuse")
             .with_check(Check("c", Level.ERROR)
                         .is_complete("text")
                         .passes_gopher_rules(min_pass_ratio=0.5)
                         .has_min("doc_id", Assertion.ge(0))))
    text = suite.explain(spark, df)
    agg_blocks = re.findall(r"\(\d+\) HashAggregate", text)
    assert len(agg_blocks) <= 2, text       # one fused agg pair, one scan


def test_gopher_rules_flag_the_right_failures(spark):
    from term_spark.operators.text import gopher_quality_flags
    rows = [
        (1, "This is a perfectly ordinary paragraph of well formed "
            "prose that keeps going with sensible words and normal "
            "structure throughout the entire document body here."),
        (2, "short"),                                    # word count
        (3, " ".join(["a"] * 60)),                       # mean word len low
        (4, " ".join(["####"] * 60)),                    # symbols + alpha
        (5, "- one\n- two\n- three\n- four"),            # bullets
        (6, "so then...\nand more...\nwait...\nhm..."),  # ellipses
        (7, None),                                       # NULL fails
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r for r in
           gopher_quality_flags(df, min_words=10).collect()}
    assert out[1]["passes"]
    assert not out[2]["r_word_count"] and not out[2]["passes"]
    assert not out[3]["r_mean_word_len"]
    assert not out[4]["r_symbol_ratio"] and not out[4]["r_alpha_words"]
    assert not out[5]["r_bullet_lines"] or out[5]["bullet_line_ratio"] == 1.0
    assert out[5]["bullet_line_ratio"] == 1.0
    assert not out[6]["r_ellipsis_lines"]
    assert out[7]["n_words"] == 0 and not out[7]["passes"]
    import pytest as _pt
    with _pt.raises(ValueError, match="unknown gopher"):
        gopher_quality_flags(df, max_typo_ratio=0.1)


def test_corpus_profile_counts_null_text_as_zero_tokens(spark):
    """review r6: NULL-text docs are 0-token documents — n_docs,
    n_tokens, and mean_tokens must agree (mean = sum/docs), not
    silently skip the NULLs in the averages."""
    from term_spark.operators.text import corpus_profile
    rows = [("en", "one two three four"), ("en", "five six"),
            ("en", None), ("de", "eins zwei")]
    df = spark.createDataFrame(rows, "lang string, text string")
    out = {r["grp"]: r for r in corpus_profile(df).collect()}
    en = out["en"]
    assert en["n_docs"] == 3 and en["n_tokens"] == 6
    assert en["mean_tokens"] == 2.0          # 6 tokens / 3 docs, not /2


def test_lexical_diversity_metrics(spark):
    """Planted fixtures: repeated text scores low TTR/hapax, all-unique
    text scores 1.0/1.0; rttr = types/sqrt(tokens); blank and NULL keep
    their rows with 0 tokens and NULL ratios; normalization folds case
    and punctuation before counting."""
    from term_spark.operators.text import lexical_diversity
    df = spark.createDataFrame(
        [(1, "the cat and the dog and the bird"),
         (2, "unique words only here now"),
         (3, ""), (4, None),
         (5, "Repeat repeat REPEAT!")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in lexical_diversity(df).collect()}
    assert (out[1]["n_tokens"], out[1]["n_types"]) == (8, 5)
    assert out[1]["ttr"] == 0.625
    # hapax in doc 1: cat, dog, bird (the/and repeat) -> 3/8
    assert out[1]["hapax_ratio"] == 0.375
    assert out[1]["rttr"] == round(5 / 8 ** 0.5, 6)
    assert out[2]["ttr"] == 1.0 and out[2]["hapax_ratio"] == 1.0
    for d in (3, 4):
        assert out[d]["n_tokens"] == 0
        assert out[d]["ttr"] is None and out[d]["hapax_ratio"] is None
    # case/punct fold: three tokens, one type, zero hapax
    assert (out[5]["n_tokens"], out[5]["n_types"]) == (3, 1)
    assert out[5]["hapax_ratio"] == 0.0
