"""text.quality_model_scores — hashed-linear quality classifier.
DuckDB parity for quality_model_docs runs in test_oracle_parity."""

import pytest

from term_spark.operators.text import quality_model_scores


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(1, "spark data quality"), (2, "more spark text here"),
         (3, None)],
        "doc_id long, text string")


def test_uniform_weights_score_the_constant(spark, docs):
    rows = quality_model_scores(docs, [0.25] * 16).collect()
    got = {r["doc_id"]: (r["n_tokens"], r["raw_score"]) for r in rows}
    # every token maps to weight 0.25 -> mean 0.25; null text excluded
    assert got == {1: (3, 0.25), 2: (4, 0.25)}


def test_bias_and_determinism(spark, docs):
    a = {r["doc_id"]: r["raw_score"]
         for r in quality_model_scores(docs, [0.1] * 8, bias=1.0).collect()}
    assert a == {1: 1.1, 2: 1.1}
    w = [((i * 13) % 32) / 32.0 for i in range(32)]
    s1 = {r["doc_id"]: r["raw_score"]
          for r in quality_model_scores(docs, w).collect()}
    s2 = {r["doc_id"]: r["raw_score"]
          for r in quality_model_scores(docs, w).collect()}
    assert s1 == s2  # hash-stable, no RNG


def test_model_is_injectable(spark, docs):
    neutral = {r["doc_id"]: r["raw_score"]
               for r in quality_model_scores(docs, [0.0] * 64).collect()}
    assert set(neutral.values()) == {0.0}
    trained = {r["doc_id"]: r["raw_score"]
               for r in quality_model_scores(
                   docs, [(-1) ** i * 0.5 for i in range(64)]).collect()}
    assert trained != neutral  # different model, different scores


def test_quality_model_validates_weights(spark, docs):
    with pytest.raises(ValueError, match="non-empty"):
        quality_model_scores(docs, [])


# ---- ANN recall evaluation --------------------------------------------------

def test_ann_recall_exact_vs_itself_is_one(spark):
    from term_spark.operators.similarity import ann_recall
    topk = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20), (2, 21)], "query_id long, nbr_id long")
    rows = ann_recall(topk, topk).collect()
    assert all(r["recall"] == 1.0 and r["k_exact"] == 2 for r in rows)


def test_ann_recall_counts_misses_and_dedups_approx(spark):
    from term_spark.operators.similarity import ann_recall
    exact = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (1, 13)], "query_id long, nbr_id long")
    # approx found 2 of 4; the duplicate (1,10) must not inflate hits
    approx = spark.createDataFrame(
        [(1, 10), (1, 10), (1, 12), (1, 99)], "query_id long, nbr_id long")
    row = ann_recall(approx, exact).collect()[0]
    assert (row["k_exact"], row["hits"], row["recall"]) == (4, 2, 0.5)


def test_ann_recall_on_real_ivf_path(spark):
    import random

    from term_spark.operators.similarity import (ann_recall, cosine_topk,
                                                 ivf_topk)
    rng = random.Random(7)
    # two well-separated clusters of vectors
    vecs = [(i, [rng.gauss(5.0 if i % 2 else -5.0, 0.3) for _ in range(8)])
            for i in range(60)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    qs = spark.createDataFrame(
        [(0, [5.0] * 8), (1, [-5.0] * 8)],
        "query_id long, query_vec array<double>")
    exact = cosine_topk(df, qs, k=5)
    approx = ivf_topk(df, qs, k=5, n_centroids=4, nprobe=2)
    rows = ann_recall(approx, exact).collect()
    assert len(rows) == 2
    # probing half the centroids on clean clusters recovers most of top-5
    assert all(r["recall"] >= 0.6 for r in rows)
    mean = sum(r["recall"] for r in rows) / 2
    assert 0.6 <= mean <= 1.0


# ---- unigram surprisal ------------------------------------------------------

def test_unigram_surprisal_known_distribution(spark):
    import math

    from term_spark.operators.text import unigram_surprisal
    # corpus: 'a' x3, 'b' x1 -> p(a)=0.75, p(b)=0.25
    df = spark.createDataFrame(
        [(1, "a a"), (2, "a b")], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in unigram_surprisal(df).collect()}
    s_a, s_b = -math.log2(0.75), -math.log2(0.25)
    assert rows[1]["bits_per_token"] == pytest.approx(s_a, abs=1e-6)
    assert rows[2]["bits_per_token"] == pytest.approx((s_a + s_b) / 2, abs=1e-6)
    assert rows[1]["n_tokens"] == 2


def test_unigram_surprisal_rare_tokens_score_higher(spark):
    from term_spark.operators.text import unigram_surprisal
    common = " ".join(["spark"] * 20)
    df = spark.createDataFrame(
        [(1, common), (2, "qzx wvu jkl mno pqr")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r["bits_per_token"]
            for r in unigram_surprisal(df).collect()}
    assert rows[2] > rows[1]  # gibberish = high surprisal


def test_unigram_surprisal_injected_vocab_is_cross_entropy(spark):
    from term_spark.operators.text import unigram_surprisal
    df = spark.createDataFrame([(1, "a b oov")], "doc_id long, text string")
    vocab = spark.createDataFrame([("a", 0.5), ("b", 0.5)], "tok string, p double")
    row = unigram_surprisal(df, vocab_df=vocab).collect()[0]
    # OOV dropped (inner join): 2 in-vocab tokens at 1 bit each
    assert row["n_tokens"] == 2 and row["bits_per_token"] == 1.0
