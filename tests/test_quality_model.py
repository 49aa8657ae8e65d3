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
