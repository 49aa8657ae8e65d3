"""Embedding hygiene audit + release gate (round 14)."""

import pytest

import pyspark.sql.functions as F


def _mixed_df(spark):
    rows = [
        (1, [0.6, 0.8]),            # clean, norm 1.0
        (2, [3.0, 4.0]),            # clean, norm 5.0
        (3, None),                  # NULL array
        (4, [1.0, 2.0, 3.0]),       # wrong dim (expect 2)
        (5, [float("nan"), 1.0]),   # NaN element
        (6, [float("inf"), 0.0]),   # Inf element
        (7, [0.0, 0.0]),            # zero norm
        (8, [None, 1.0]),           # NULL element (3VL trap, r14 advice)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_embedding_quality_summary_counts_each_defect(spark):
    from term_spark.operators.similarity import embedding_quality_summary
    row = embedding_quality_summary(
        _mixed_df(spark), "embedding", expect_dim=2).collect()[0]
    assert (row["n_vecs"], row["n_null"], row["n_wrong_dim"],
            row["n_nonfinite"], row["n_zero_norm"], row["n_null_elem"],
            row["n_clean"]) \
        == (8, 1, 1, 2, 1, 1, 2)
    assert row["min_norm"] == 1.0 and row["max_norm"] == 5.0
    assert row["mean_norm"] == 3.0
    # without expect_dim: wrong-dim is NULL and doc 4 counts clean
    row2 = embedding_quality_summary(_mixed_df(spark), "embedding").collect()[0]
    assert row2["n_wrong_dim"] is None and row2["n_clean"] == 3
    # the fused pass is map-only: one 1-row aggregate, no join/window
    plan = (embedding_quality_summary(_mixed_df(spark), "embedding", 2)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Join" not in plan and "Window" not in plan


def test_has_valid_embeddings_gate(spark):
    from term_spark import Check, Level, ValidationSuite
    clean = spark.createDataFrame(
        [(i, [0.6, 0.8]) for i in range(10)],
        "vec_id long, embedding array<double>")
    ok = ValidationSuite.builder("emb").with_check(
        Check("v", Level.ERROR).has_valid_embeddings(
            "embedding", expect_dim=2, require_unit_norm=True))
    assert ok.run(spark, clean).passed

    res = ValidationSuite.builder("emb").with_check(
        Check("v", Level.ERROR).has_valid_embeddings(
            "embedding", expect_dim=2)).run(spark, _mixed_df(spark))
    assert not res.passed
    msg = [x.message for x in res.report.issues][0]
    assert "6/8" in msg                # null+wrong+nan+inf+zero+null-elem

    # unit-norm requirement flips the norm-5 vector to bad
    res2 = ValidationSuite.builder("emb").with_check(
        Check("v", Level.ERROR).has_valid_embeddings(
            "embedding", expect_dim=2, require_unit_norm=True,
            max_bad_ratio=6 / 8)).run(spark, _mixed_df(spark))
    assert not res2.passed                    # 7/8 > 6/8
    with pytest.raises(ValueError, match="max_bad_ratio"):
        Check("v", Level.ERROR).has_valid_embeddings("e", max_bad_ratio=2)
    with pytest.raises(ValueError, match="norm_tol"):
        Check("v", Level.ERROR).has_valid_embeddings("e", norm_tol=0)
