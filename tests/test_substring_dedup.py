"""Planted-fixture + independent-oracle tests for the exact-substring
dedup tier (text.duplicated_spans / substring_dedup_summary /
remove_duplicated_spans — Lee et al. 2021 ExactSubstr, round 10).
The contract query's DuckDB parity runs in test_oracle_parity; here a
pure-Python reimplementation pins the span arithmetic on planted and
randomized corpora, and fixtures prove the removal semantics."""

import random
import re

import pytest

from term_spark.operators.text import (
    duplicated_spans,
    remove_duplicated_spans,
    substring_dedup_summary,
)

K = 4  # small k so fixtures stay readable

RUN = "alpha beta gamma delta epsilon"          # 5 tokens, >= K
UNIQ1 = "one two three four five six seven"
UNIQ2 = "red green blue yellow purple orange"


def _py_spans(texts, k, min_count=2):
    """Independent oracle: dict id -> [(start, end)] merged spans."""
    toks = {i: re.sub(r"[^a-z0-9]+", " ", t.lower()).strip().split(" ")
            for i, t in texts.items()}
    freq = {}
    grams = {}
    for i, ts in toks.items():
        gs = [" ".join(ts[p:p + k]) for p in range(len(ts) - k + 1)]
        grams[i] = gs
        for g in gs:
            freq[g] = freq.get(g, 0) + 1
    out = {}
    for i, gs in grams.items():
        pos = [p for p, g in enumerate(gs) if freq[g] >= min_count]
        merged = []
        for p in pos:
            if merged and p - merged[-1][1] <= k:
                merged[-1][1] = p
            else:
                merged.append([p, p])
        if merged:
            out[i] = [(s, e + k) for s, e in merged]
    return out


UNIQ3 = "cold warm damp dry bright dim hazy"


@pytest.fixture()
def span_docs(spark):
    rows = [
        (1, f"{UNIQ1} {RUN} tail one"),       # RUN at tokens 7..11
        (2, f"{RUN} {UNIQ2}"),                # RUN at tokens 0..4
        (3, UNIQ3 + " extra trailing words"),  # no duplicated run
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_duplicated_spans_finds_planted_run(spark, span_docs):
    spans = duplicated_spans(span_docs, k=K).collect()
    got = {(r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
           for r in spans}
    # RUN is 5 tokens = two overlapping 4-grams -> one merged 5-token span
    assert got == {(1, 7, 12, 5), (2, 0, 5, 5)}


def test_spans_match_python_oracle_on_fixture(spark, span_docs):
    texts = {r["doc_id"]: r["text"] for r in span_docs.collect()}
    want = _py_spans(texts, K)
    got = {}
    for r in duplicated_spans(span_docs, k=K).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"]))
    assert {i: sorted(v) for i, v in got.items()} == want


def test_spans_match_python_oracle_randomized(spark):
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    base = [" ".join(rng.choice(vocab) for _ in range(rng.randint(5, 40)))
            for _ in range(12)]
    # plant clones and partial copies so long shared runs exist
    texts = {i: t for i, t in enumerate(base)}
    texts[100] = base[0]                                   # full clone
    texts[101] = base[1] + " " + base[2]                   # concat copy
    texts[102] = " ".join(base[3].split()[:10])            # prefix copy
    rows = [(i, t) for i, t in texts.items()]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    want = _py_spans(texts, 6)
    got = {}
    for r in duplicated_spans(df, k=6).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"]))
    assert {i: sorted(v) for i, v in got.items()} == want


def test_within_document_repetition_counts(spark):
    # the duplicated run occurs twice INSIDE one doc -> still flagged
    df = spark.createDataFrame(
        [(1, f"{RUN} {UNIQ1} {RUN}")], "doc_id long, text string")
    spans = duplicated_spans(df, k=K).collect()
    got = sorted((r["span_start"], r["span_end"]) for r in spans)
    assert got == [(0, 5), (12, 17)]


def test_overlapping_runs_merge_into_one_span(spark):
    # doc 1 shares tokens 0..5 with doc 2 and tokens 3..8 with doc 3:
    # covers merge into a single 0..9 span for doc 1
    t = "a1 a2 a3 a4 a5 a6 a7 a8 a9"
    toks = t.split()
    df = spark.createDataFrame(
        [(1, t),
         (2, " ".join(toks[0:6]) + " zz1 zz2"),
         (3, "yy1 yy2 " + " ".join(toks[3:9]))],
        "doc_id long, text string")
    spans = {r["doc_id"]: (r["span_start"], r["span_end"])
             for r in duplicated_spans(df, k=K).collect()}
    assert spans[1] == (0, 9)


def test_remove_duplicated_spans_strips_all_occurrences(spark, span_docs):
    cleaned, _ = remove_duplicated_spans(span_docs, k=K)
    got = {r["doc_id"]: r["text"] for r in cleaned.collect()}
    # Lee et al. simplification: EVERY copy of the run goes
    assert got == {
        1: "one two three four five six seven tail one",
        2: "red green blue yellow purple orange",
        3: "cold warm damp dry bright dim hazy extra trailing words",
    }


def test_remove_fully_duplicated_doc_disappears(spark):
    df = spark.createDataFrame(
        [(1, RUN), (2, RUN), (3, UNIQ1)], "doc_id long, text string")
    cleaned, _ = remove_duplicated_spans(df, k=K)
    got = {r["doc_id"]: r["text"] for r in cleaned.collect()}
    assert got == {3: UNIQ1.lower()}


def test_summary_accounting(spark, span_docs):
    row = substring_dedup_summary(span_docs, k=K).collect()[0]
    assert row["n_docs"] == 3
    # doc1: 14 tokens -> 11 grams; doc2: 11 -> 8; doc3: 10 -> 7
    assert row["total_grams"] == 26
    # RUN's two fully-interior 4-grams each occur twice (docs 1 and 2)
    assert row["dup_gram_instances"] == 4
    assert row["distinct_grams"] == 26 - 2
    assert row["docs_with_dups"] == 2
    assert row["dup_spans"] == 2
    assert row["dup_tokens"] == 10


def test_parameter_validation(spark, span_docs):
    with pytest.raises(ValueError, match="k must be >= 2"):
        duplicated_spans(span_docs, k=1)
    with pytest.raises(ValueError, match="min_count must be >= 2"):
        duplicated_spans(span_docs, min_count=1)


def test_short_docs_have_no_grams(spark):
    df = spark.createDataFrame(
        [(1, "too short"), (2, "too short"), (3, "")],
        "doc_id long, text string")
    assert duplicated_spans(df, k=K).count() == 0
    row = substring_dedup_summary(df, k=K).collect()[0]
    assert row["total_grams"] == 0 and row["dup_tokens"] == 0


def test_has_low_substring_duplication_gate(spark):
    """Round-10 release gate: share of corpus TOKENS inside a
    duplicated >=k-token span.  Docs 1 and 2 share RUN (5 tokens each
    side at k=4); total tokens 14+11+10=35 -> ratio 10/35."""
    from term_spark import Check, Level, ValidationSuite

    rows = [(1, f"{UNIQ1} {RUN} tail one"),
            (2, f"{RUN} {UNIQ2}"),
            (3, UNIQ3 + " extra trailing words"),
            (4, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = (ValidationSuite.builder("s")
         .with_check(Check("sub", Level.ERROR)
                     .has_low_substring_duplication(
                         "text", k=K, max_ratio=0.3))
         .run(spark, df))
    assert r.passed
    assert r.report.outcomes[0].result.metric == pytest.approx(10 / 35)
    # default zero tolerance fails on the same corpus
    r2 = (ValidationSuite.builder("s2")
          .with_check(Check("sub", Level.ERROR)
                      .has_low_substring_duplication("text", k=K))
          .run(spark, df))
    assert not r2.passed
    assert "substring-duplication" in r2.report.outcomes[0].result.message
    # span-free corpus passes even at zero tolerance
    clean = df.filter("doc_id = 3")
    r3 = (ValidationSuite.builder("s3")
          .with_check(Check("sub", Level.ERROR)
                      .has_low_substring_duplication("text", k=K))
          .run(spark, clean))
    assert r3.passed


def test_rolling_hasher_spans_identical_on_fixture(spark, span_docs):
    md5 = {(r["doc_id"], r["span_start"], r["span_end"])
           for r in duplicated_spans(span_docs, k=K).collect()}
    roll = {(r["doc_id"], r["span_start"], r["span_end"])
            for r in duplicated_spans(span_docs, k=K,
                                      hasher="rolling").collect()}
    assert roll == md5


def test_rolling_hasher_spans_identical_randomized(spark):
    rng = random.Random(31)
    vocab = [f"w{i}" for i in range(25)]
    base = [" ".join(rng.choice(vocab) for _ in range(rng.randint(3, 60)))
            for _ in range(15)]
    texts = {i: t for i, t in enumerate(base)}
    texts[200] = base[0]
    texts[201] = base[4] + " " + base[7]
    texts[202] = " ".join(base[2].split()[:12])
    df = spark.createDataFrame(list(texts.items()),
                               "doc_id long, text string")
    for k in (3, 6, 11):
        md5 = {(r["doc_id"], r["span_start"], r["span_end"])
               for r in duplicated_spans(df, k=k).collect()}
        roll = {(r["doc_id"], r["span_start"], r["span_end"])
                for r in duplicated_spans(df, k=k,
                                          hasher="rolling").collect()}
        assert roll == md5, f"k={k}"


def test_rolling_hasher_summary_and_rewrite(spark, span_docs):
    a = substring_dedup_summary(span_docs, k=K).collect()[0]
    b = substring_dedup_summary(span_docs, k=K,
                                hasher="rolling").collect()[0]
    assert a.asDict() == b.asDict()
    ca, _ = remove_duplicated_spans(span_docs, k=K)
    cb, _ = remove_duplicated_spans(span_docs, k=K, hasher="rolling")
    assert ({r["doc_id"]: r["text"] for r in ca.collect()}
            == {r["doc_id"]: r["text"] for r in cb.collect()})


def test_rolling_hasher_null_and_short_docs(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "too short"), (3, "")],
        "doc_id long, text string")
    assert duplicated_spans(df, k=K, hasher="rolling").count() == 0


def test_unknown_hasher_rejected(spark, span_docs):
    with pytest.raises(ValueError, match="hasher"):
        duplicated_spans(span_docs, hasher="sha9000")
