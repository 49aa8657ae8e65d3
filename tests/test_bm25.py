"""Planted-fixture tests for Okapi BM25 retrieval (text.bm25_topk,
round 10). The registry query's DuckDB parity runs in
test_oracle_parity; here the scoring formula is pinned against a
hand-computed value and the BM25 properties (idf contrast, length
normalization, qtf weighting) are asserted directly."""

import math

import pytest

from term_spark.operators.text import bm25_topk


@pytest.fixture()
def corpus(spark):
    # 4 docs; "rare" appears in exactly one, "common" in all four
    rows = [
        (1, "rare common alpha beta"),
        (2, "common alpha beta gamma"),
        (3, "common common alpha beta gamma delta epsilon zeta"),
        (4, "common beta"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _q(spark, *probes):
    return spark.createDataFrame(list(enumerate(probes)),
                                 "query_id long, query string")


def _idf(n, df):
    return round(math.log(1.0 + (n - df + 0.5) / (df + 0.5)), 6)


def test_hand_computed_score(spark, corpus):
    # query "rare" -> only doc 1 matches.  N=4, df=1, tf=1, dl=4,
    # avgdl=(4+4+8+2)/4=4.5, k1=1.2, b=0.75
    got = bm25_topk(corpus, _q(spark, "rare"), k=10).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["query_id"], r["doc_id"], r["rank"]) == (0, 1, 1)
    idf = _idf(4, 1)
    denom = 1 + 1.2 * (1 - 0.75 + 0.75 * 4 / 4.5)
    want = round(1 * idf * 1 * 2.2 / denom, 6)
    assert r["score"] == pytest.approx(want, abs=1e-6)


def test_rare_term_outranks_common(spark, corpus):
    # doc 1 is the only one with "rare"; for query "rare common" it
    # must rank first even though every doc has "common"
    got = bm25_topk(corpus, _q(spark, "rare common"), k=10).collect()
    by_rank = [r["doc_id"] for r in sorted(got, key=lambda r: r["rank"])]
    assert by_rank[0] == 1
    assert len(by_rank) == 4  # every doc matches "common"


def test_length_normalization(spark, corpus):
    # docs 2 (dl=4) and 3 (dl=8) both contain "gamma" once with equal
    # df; the shorter doc must score higher
    got = {r["doc_id"]: r["score"]
           for r in bm25_topk(corpus, _q(spark, "gamma"), k=10).collect()}
    assert set(got) == {2, 3}
    assert got[2] > got[3]


def test_higher_tf_scores_higher(spark, corpus):
    # "common" tf: doc3 has 2 but dl=8; doc4 tf=1 dl=2 — compare
    # doc 1 vs doc 2 instead (same dl=4, same tf=1 -> identical
    # scores, tie-break by doc_id)
    got = bm25_topk(corpus, _q(spark, "common"), k=10).collect()
    by_doc = {r["doc_id"]: (r["score"], r["rank"]) for r in got}
    assert by_doc[1][0] == by_doc[2][0]
    assert by_doc[1][1] < by_doc[2][1]  # tie broken by ascending id


def test_qtf_weights_linearly(spark, corpus):
    # "rare rare" doubles the rare-term contribution vs "rare"
    one = bm25_topk(corpus, _q(spark, "rare"), k=10).collect()[0]["score"]
    two = bm25_topk(corpus, _q(spark, "rare rare"), k=10).collect()[0]["score"]
    assert two == pytest.approx(2 * one, abs=2e-6)


def test_k_bounds_results(spark, corpus):
    got = bm25_topk(corpus, _q(spark, "common"), k=2).collect()
    assert len(got) == 2
    assert sorted(r["rank"] for r in got) == [1, 2]


def test_no_match_returns_empty(spark, corpus):
    assert bm25_topk(corpus, _q(spark, "zzz unseen"), k=5).count() == 0


def test_multiple_queries_independent(spark, corpus):
    got = bm25_topk(corpus, _q(spark, "rare", "gamma"), k=10).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], set()).add(r["doc_id"])
    assert by_q == {0: {1}, 1: {2, 3}}


def test_parameter_validation(spark, corpus):
    q = _q(spark, "rare")
    with pytest.raises(ValueError, match="k must be > 0"):
        bm25_topk(corpus, q, k=0)
    with pytest.raises(ValueError, match="k1 >= 0"):
        bm25_topk(corpus, q, b=1.5)
