"""Hybrid retrieval (operators/retrieval.py): RRF fusion math on
hand-built rankings, the missing-from-one-system convention, weights,
deterministic tie-breaks, the n_systems vote count, and the
end-to-end hybrid_topk composition over planted text + vectors."""

import pyspark.sql.functions as F
import pytest

from term_spark.operators.retrieval import hybrid_topk, rrf_fuse


def _ranking(spark, rows):
    return spark.createDataFrame(
        rows, "query_id long, doc_id long, rank int")


def test_rrf_math_and_agreement_beats_solo_head(spark):
    # doc 1: rank 2 in BOTH systems; doc 2: rank 1 in one only.
    # 2/(60+2) = 0.032258 > 1/(60+1) = 0.016393 — agreement wins.
    a = _ranking(spark, [(0, 2, 1), (0, 1, 2)])
    b = _ranking(spark, [(0, 3, 1), (0, 1, 2)])
    out = {r["doc_id"]: r for r in
           rrf_fuse({"a": a, "b": b}, k=10).collect()}
    assert out[1]["rank"] == 1
    assert out[1]["n_systems"] == 2
    assert out[1]["rrf_score"] == round(2.0 / 62.0, 6)
    assert out[2]["n_systems"] == 1
    assert out[2]["rrf_score"] == round(1.0 / 61.0, 6)
    # docs 2 and 3 tie on score (both rank-1 solos) -> doc_id ascending
    assert out[2]["rank"] == 2 and out[3]["rank"] == 3


def test_rrf_weights_rescale_contributions(spark):
    a = _ranking(spark, [(0, 1, 1)])
    b = _ranking(spark, [(0, 2, 1)])
    out = {r["doc_id"]: r["rrf_score"] for r in
           rrf_fuse({"a": a, "b": b}, weights={"a": 3.0}).collect()}
    assert out[1] == round(3.0 / 61.0, 6)
    assert out[2] == round(1.0 / 61.0, 6)


def test_rrf_bounds_topk_per_query_independently(spark):
    a = _ranking(spark, [(q, d, d + 1) for q in (0, 1) for d in range(8)])
    got = rrf_fuse({"a": a}, k=3).groupBy("query_id").count().collect()
    assert {r["count"] for r in got} == {3}
    with pytest.raises(ValueError, match="no rankings"):
        rrf_fuse({})


def test_hybrid_topk_end_to_end(spark):
    # doc 0 matches lexically AND by vector; doc 1 lexically only;
    # doc 2 by vector only; doc 3 neither.
    docs = spark.createDataFrame(
        [(0, "needle in the corpus"), (1, "another needle here"),
         (2, "plain filler text"), (3, "nothing to see")],
        "doc_id long, text string")
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [0.9, 0.1]),
         (3, [-1.0, 0.0])], "vec_id long, embedding array<double>")
    q = spark.createDataFrame([(0, "needle", [1.0, 0.0])],
                              "query_id long, query string, "
                              "query_vec array<double>")
    got = hybrid_topk(docs, emb, q, k=4, depth=2).collect()
    by_rank = {r["rank"]: r for r in got}
    assert by_rank[1]["doc_id"] == 0          # in both top-2 lists
    assert by_rank[1]["n_systems"] == 2
    assert {by_rank[2]["doc_id"], by_rank[3]["doc_id"]} <= {1, 2}
    assert all(r["n_systems"] == 1 for r in got if r["doc_id"] != 0)


def test_rrf_plan_is_bounded(spark):
    """Fusion is union + hash agg + per-query window — no nested-loop
    join anywhere (the corpus never enters this stage)."""
    a = _ranking(spark, [(0, 1, 1), (0, 2, 2)])
    b = _ranking(spark, [(0, 2, 1)])
    plan = rrf_fuse({"a": a, "b": b})._sc._jvm and \
        rrf_fuse({"a": a, "b": b})._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_rrf_rejects_unknown_weight_keys(spark):
    import pytest
    from term_spark.operators.retrieval import rrf_fuse
    df = spark.createDataFrame([(1, "d1", 1)],
                               "query_id int, doc_id string, rank int")
    with pytest.raises(ValueError, match="unknown rankings"):
        rrf_fuse({"bm25": df}, weights={"bm52": 2.0})
