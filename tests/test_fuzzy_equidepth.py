"""Fuzzy key matching + equi-depth histogram (round 13)."""

import pytest

import pyspark.sql.functions as F


def test_blocked_fuzzy_pairs_blocks_and_bounds(spark):
    from term_spark.operators.fuzzy import blocked_fuzzy_pairs
    df = spark.createDataFrame(
        [("acme corp",)] * 5 + [("acme corp.",)] * 1 + [("acmee corp",)] * 2
        + [("zenith corp",)] * 3 + [("acme labs",)] * 4 + [(None,)],
        "vendor string")
    rows = blocked_fuzzy_pairs(df, "vendor", max_distance=2).collect()
    got = {(r["name_a"], r["name_b"]): (r["distance"], r["n_a"], r["n_b"])
           for r in rows}
    # same block ("corp"-ish tokens differ: 'corp' vs 'corp.' block
    # apart — blocking is exact by design), distances are classical
    assert got[("acme corp", "acmee corp")] == (1, 5, 2)
    # cross-block pairs never form, even at tiny distance
    assert ("acme corp", "acme corp.") not in got   # blocks corp / corp.
    assert ("acme corp", "acme labs") not in got    # blocks corp / labs
    # far names in the same block are filtered by the distance bound
    assert ("acme corp", "zenith corp") not in got
    # ordering + dedup: name_a < name_b exactly once
    assert all(a < b for a, b in got)


def test_fuzzy_canonicalize_elects_heaviest_then_smallest(spark):
    from term_spark.operators.fuzzy import fuzzy_canonicalize
    df = spark.createDataFrame(
        [("acme corp",)] * 5 + [("acmee corp",)] * 2 + [("acm corp",)] * 5
        + [("solo corp",)] * 1,
        "vendor string")
    out = {r["name"]: r for r in
           fuzzy_canonicalize(df, "vendor", max_distance=2).collect()}
    # 'acmee corp' sees both 5-count neighbors; count tie -> smallest name
    assert out["acmee corp"]["canonical"] == "acm corp"
    assert out["acmee corp"]["canonical_n"] == 5
    # tied heavyweights CONVERGE to the smallest name (self-preference
    # would leave a tied pair permanently unmerged) — both 5-count
    # names elect 'acm corp'
    assert out["acme corp"]["canonical"] == "acm corp"
    assert out["acm corp"]["canonical"] == "acm corp"
    # distance-isolated names map to themselves
    assert out["solo corp"]["canonical"] == "solo corp"
    assert out["solo corp"]["canonical_n"] == 1


def test_fuzzy_validation(spark):
    from term_spark.operators.fuzzy import blocked_fuzzy_pairs
    df = spark.createDataFrame([("a",)], "v string")
    with pytest.raises(ValueError, match="max_distance"):
        blocked_fuzzy_pairs(df, "v", max_distance=0)
    with pytest.raises(ValueError, match="min_count"):
        blocked_fuzzy_pairs(df, "v", min_count=0)


def test_fuzzy_pairs_plan_is_equi_join(spark):
    """The block join must be a hash/sort-merge EQUI join — a
    cartesian or broadcast nested loop would mean the blocking failed
    to reach the join condition."""
    from term_spark.operators.fuzzy import blocked_fuzzy_pairs
    df = spark.createDataFrame([("red widget",), ("blue widget",)],
                               "v string")
    plan = blocked_fuzzy_pairs(df, "v")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_equidepth_histogram_even_depths_and_edges(spark):
    from term_spark.operators.histogram import equidepth_histogram
    df = spark.createDataFrame([(float(i),) for i in range(1, 101)],
                               "v double")
    rows = equidepth_histogram(df, "v", buckets=4).collect()
    assert [r["bucket"] for r in rows] == [0, 1, 2, 3]
    assert [r["n"] for r in rows] == [25, 25, 25, 25]
    assert rows[0]["lo"] == 1.0 and rows[-1]["hi"] == 100.0
    # interpolated interior edge at rank (n-1)p = 99*0.25 = 24.75 -> 25.75
    assert rows[0]["hi"] == pytest.approx(25.75)
    assert all(r["share"] == 0.25 for r in rows)


def test_equidepth_histogram_skewed_beats_equiwidth(spark):
    """The motivating case: a heavy tail collapses equi-width into one
    mega-bucket; equi-depth keeps depths even."""
    from term_spark.operators.histogram import equidepth_histogram
    vals = [float(i) for i in range(1, 97)] + [1e6, 2e6, 3e6, 4e6]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    rows = equidepth_histogram(df, "v", buckets=4).collect()
    assert [r["n"] for r in rows] == [25, 25, 25, 25]


def test_equidepth_histogram_degenerate_and_empty(spark):
    from term_spark.operators.histogram import equidepth_histogram
    same = spark.createDataFrame([(7.0,)] * 10, "v double")
    rows = equidepth_histogram(same, "v", buckets=4).collect()
    # all spans are [7,7); only the closed last bucket catches rows
    assert sum(r["n"] for r in rows) == 10
    assert [r["n"] for r in rows][-1] == 10
    empty = spark.createDataFrame([], "v double")
    assert equidepth_histogram(empty, "v", buckets=4).collect() == []
    with pytest.raises(ValueError, match="buckets"):
        equidepth_histogram(same, "v", buckets=1)


def test_equidepth_histogram_ignores_nan(spark):
    """NaN passes isNotNull yet compares false against every span
    (r13 advice): it must be excluded from BOTH passes, so totals and
    shares come out as if the NaN rows never existed."""
    from term_spark.operators.histogram import equidepth_histogram
    vals = [(float(i),) for i in range(1, 9)] + [(float("nan"),)] * 3
    df = spark.createDataFrame(vals, "v double")
    rows = equidepth_histogram(df, "v", buckets=4).collect()
    assert sum(r["n"] for r in rows) == 8          # NaNs not counted
    assert sum(r["share"] for r in rows) == pytest.approx(1.0, abs=1e-6)
    clean = equidepth_histogram(
        spark.createDataFrame(vals[:8], "v double"), "v", buckets=4).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in clean]


def test_has_canonical_keys_gate(spark):
    from term_spark import Check, Level, ValidationSuite
    ok_df = spark.createDataFrame(
        [("acme corp",)] * 99 + [("zenith corp",)] * 99 + [("acmee corp",)],
        "vendor string")
    ok = ValidationSuite.builder("keys").with_check(
        Check("v", Level.ERROR).has_canonical_keys("vendor", max_ratio=0.02))
    assert ok.run(spark, ok_df).passed

    bad_df = spark.createDataFrame(
        [("acme corp",)] * 60 + [("acmee corp",)] * 40, "vendor string")
    bad = ValidationSuite.builder("keys").with_check(
        Check("v", Level.ERROR).has_canonical_keys("vendor", max_ratio=0.02))
    res = bad.run(spark, bad_df)
    assert not res.passed
    msg = [x.message for x in res.report.issues][0]
    assert "acmee corp" in msg and "acme corp" in msg


def test_fuzzy_fragmentation_validates(spark):
    from term_spark.operators.fuzzy import FuzzyFragmentationConstraint
    with pytest.raises(ValueError, match="max_ratio"):
        FuzzyFragmentationConstraint("v", max_ratio=1.5)


def test_has_canonical_keys_bounded_driver_on_high_cardinality(
        spark, monkeypatch):
    """r13 verdict ask #3: the gate must stay aggregate-side — on a
    5,000-distinct-value key column every collect() the constraint
    issues must hand the driver O(1) rows (the old form collected the
    whole value dictionary)."""
    # patch the CONCRETE class: pyspark.sql.DataFrame is the abstract
    # facade in Spark 4 and the classic subclass defines its own collect
    from pyspark.sql.classic.dataframe import DataFrame

    from term_spark import Check, Level, ValidationSuite
    df = spark.range(5000).selectExpr("concat('key_', id) as k")
    sizes = []
    orig = DataFrame.collect

    def spy(self):
        rows = orig(self)
        sizes.append(len(rows))
        return rows

    monkeypatch.setattr(DataFrame, "collect", spy)
    suite = ValidationSuite.builder("keys").with_check(
        Check("v", Level.ERROR).has_canonical_keys("k", max_ratio=0.5))
    assert suite.run(spark, df).passed
    assert sizes and max(sizes) <= 1, sizes

    # failure path fetches exactly one worst-offender row
    sizes.clear()
    bad = spark.createDataFrame(
        [("acme corp",)] * 60 + [("acmee corp",)] * 40, "vendor string")
    res = ValidationSuite.builder("keys").with_check(
        Check("v", Level.ERROR).has_canonical_keys(
            "vendor", max_ratio=0.02)).run(spark, bad)
    assert not res.passed
    assert sizes and max(sizes) <= 1, sizes


def test_equidepth_from_index_counts_exact_edges_attested(spark, tmp_path):
    """Grid-served equi-depth (r13 verdict ask #5): edges come from the
    persisted quantile index, counts stay exact — every row lands in a
    bucket (unbounded outer buckets), Σn is the exact population, each
    bucket's depth is near 1/buckets, and every edge's rank attestation
    pins TRUE."""
    from term_spark.analyzers.quantile_index import build_quantile_index
    from term_spark.operators.histogram import (
        equidepth_histogram, equidepth_histogram_from_index)
    df = spark.range(10_000).selectExpr("cast(id as double) as v",
                                        "id % 7 as junk")
    idx = str(tmp_path / "qidx")
    build_quantile_index(df, ["v"], idx)
    rows = equidepth_histogram_from_index(df, "v", idx, buckets=8).collect()
    assert len(rows) == 8
    assert sum(r["n"] for r in rows) == 10_000       # counts exact
    assert all(r["edge_within_bound"] for r in rows)  # rank attestation
    # each bucket's depth within the tier's rank band of 1/buckets
    for r in rows:
        assert abs(r["share"] - 0.125) <= 2 * 2 * (2 / 200 + 1 / 10_000)
    # near the exact form's buckets on uniform data
    exact = equidepth_histogram(df, "v", buckets=8).collect()
    for a, b in zip(rows, exact):
        assert abs(a["n"] - b["n"]) <= 600

    # append a second shard: probe must still attest over the union
    df2 = spark.range(10_000, 20_000).selectExpr("cast(id as double) as v",
                                                 "id % 7 as junk")
    build_quantile_index(df2, ["v"], idx, mode="append")
    both = df.unionByName(df2)
    rows2 = equidepth_histogram_from_index(both, "v", idx, buckets=8).collect()
    assert sum(r["n"] for r in rows2) == 20_000
    assert all(r["edge_within_bound"] for r in rows2)

    # untracked column refuses loudly; attest=False skips the column
    with pytest.raises(ValueError, match="not tracked"):
        equidepth_histogram_from_index(df, "junk", idx, buckets=4)
    # grouped index refuses loudly — probing it un-keyed would blend
    # groups (duplicate p keys, last group silently winning)
    gidx = str(tmp_path / "qidx_grouped")
    build_quantile_index(df.selectExpr("v", "cast(junk as string) as g"),
                         ["v"], gidx, group_col="g")
    with pytest.raises(ValueError, match="GROUPED"):
        equidepth_histogram_from_index(df, "v", gidx, buckets=4)
    lean = equidepth_histogram_from_index(df, "v", idx, buckets=8,
                                          attest=False)
    assert "edge_within_bound" not in lean.columns
    assert sum(r["n"] for r in lean.collect()) == 10_000


def test_equidepth_by_group_grid_served(spark, tmp_path):
    """Per-group grid-served equi-depth (round 14): each group gets its
    OWN probed edges, per-group counts stay exact, attestations pin
    TRUE, and ungrouped indexes refuse."""
    from term_spark.analyzers.quantile_index import build_quantile_index
    from term_spark.operators.histogram import (
        equidepth_histogram_from_index, equidepth_histograms_by_group)
    # group a: uniform 0..9999; group b: uniform 0..999 (different scales)
    df = spark.range(10_000).selectExpr(
        "cast(id as double) as v",
        "case when id % 2 = 0 then 'a' else 'b' end as g") \
        .withColumn("v", F.when(F.col("g") == "b", F.col("v") / 10)
                    .otherwise(F.col("v")))
    idx = str(tmp_path / "qidx_g")
    build_quantile_index(df, ["v"], idx, group_col="g")
    rows = equidepth_histograms_by_group(df, "v", idx, buckets=4).collect()
    assert len(rows) == 8
    by_g = {}
    for r in rows:
        by_g.setdefault(r["grp"], []).append(r)
    for g, rs in by_g.items():
        assert sum(r["n"] for r in rs) == 5_000          # exact per group
        assert all(r["edge_within_bound"] for r in rs)
        for r in rs:
            assert abs(r["share"] - 0.25) <= 2 * 2 * (2 / 200 + 1 / 10_000)
    # the two groups' edges live on their own scales
    assert by_g["a"][-1]["hi"] > 9_000
    assert by_g["b"][-1]["hi"] < 1_100
    # ungrouped index refuses here; grouped index refuses in the
    # ungrouped operator (symmetry)
    uidx = str(tmp_path / "qidx_u")
    build_quantile_index(df, ["v"], uidx)
    with pytest.raises(ValueError, match="UNGROUPED"):
        equidepth_histograms_by_group(df, "v", uidx, buckets=4)
    with pytest.raises(ValueError, match="GROUPED"):
        equidepth_histogram_from_index(df, "v", idx, buckets=4)


def test_equidepth_by_group_unindexed_group_raises(spark, tmp_path):
    """r15 (ADVICE fix): clean rows whose group the grouped index does
    NOT track must raise loudly instead of being silently dropped —
    bucketing them against another group's edges would be wrong, and
    dropping them would undercount the corpus.  Index-only groups keep
    reporting n=0 rows (the documented asymmetry)."""
    from term_spark.analyzers.quantile_index import build_quantile_index
    from term_spark.operators.histogram import equidepth_histograms_by_group
    df = spark.range(2_000).selectExpr(
        "cast(id as double) as v",
        "case when id % 2 = 0 then 'a' else 'b' end as g")
    idx = str(tmp_path / "qidx_partial")
    build_quantile_index(df.filter("g = 'a'"), ["v"], idx, group_col="g")
    with pytest.raises(ValueError, match="absent from the index"):
        equidepth_histograms_by_group(df, "v", idx, buckets=4)
    # covered df passes; an index-only group reports n=0 rows
    ok = equidepth_histograms_by_group(
        df.filter("g = 'a'"), "v", idx, buckets=4).collect()
    assert sum(r["n"] for r in ok) == 1_000
    none_left = equidepth_histograms_by_group(
        df.filter("g = 'zzz'"), "v", idx, buckets=4).collect()
    assert [r["n"] for r in none_left] == [0, 0, 0, 0]
    assert all(not r["edge_within_bound"] for r in none_left)
