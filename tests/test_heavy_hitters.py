"""Misra-Gries heavy-hitter sketch: the three theorems (underestimate,
n/(k+1) error bound, no false negatives above the bound) against exact
counts, the Agarwal et al. merge law under arbitrary sharding
(hypothesis), the map-only Spark pass, and the has_no_heavy_hitters
gate. Deterministic data throughout — MG itself is deterministic given
an input order, but every assertion here is ORDER-INVARIANT (the
theorems hold for any order), so partition scheduling can't flake."""

from collections import Counter

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from term_spark.analyzers.heavy_hitters import (HeavyHitterConstraint,
                                                MGSummary, _absorb,
                                                heavy_hitters, mg_merge,
                                                mg_sketch, mg_sketch_by)


def _summary_of(items, k):
    counters = {}
    _absorb(counters, Counter(items).items(), k)
    return MGSummary(k=k, n=len(items), counters=counters)


def _assert_theorems(summary, exact: Counter):
    n = sum(exact.values())
    assert summary.n == n
    bound = n // (summary.k + 1)
    assert summary.error_bound == bound
    assert len(summary.counters) <= summary.k
    for item, est in summary.counters.items():
        true = exact[item]
        assert est <= true, f"{item}: est {est} > true {true}"
        assert true - est <= bound, f"{item}: undercount > {bound}"
    for item, true in exact.items():
        if true > bound:
            assert item in summary.counters, \
                f"heavy hitter {item} (count {true} > {bound}) missing"


def test_exact_when_k_exceeds_distincts():
    items = ["a"] * 50 + ["b"] * 30 + ["c"] * 20
    s = _summary_of(items, k=8)
    assert s.counters == {"a": 50, "b": 30, "c": 20}
    assert s.estimate("a") == 50 and s.estimate("zzz") == 0
    assert s.top(2) == [("a", 50), ("b", 30)]


def test_theorems_on_skewed_stream():
    # one dominant value + a long tail wider than k
    items = ["hot"] * 400 + [f"t{i}" for i in range(300)] * 2
    s = _summary_of(items, k=16)
    _assert_theorems(s, Counter(items))
    assert "hot" in s.counters  # 400 > 1000/17


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=40), min_size=1,
                max_size=400),
       st.integers(min_value=2, max_value=12),
       st.integers(min_value=1, max_value=5))
def test_merge_law_any_sharding(values, k, n_shards):
    """Sharding a stream arbitrarily, sketching each shard, and merging
    must satisfy the SAME theorems on the TOTAL stream — Agarwal et al.
    PODS'12 Thm. 1, the property that makes shard-wise sketching safe
    at any fan-in."""
    items = [str(v) for v in values]
    shards = [items[i::n_shards] for i in range(n_shards)]
    merged = mg_merge([_summary_of(sh, k) for sh in shards if True])
    _assert_theorems(merged, Counter(items))


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(st.integers(min_value=0, max_value=3),
                          st.integers(min_value=0, max_value=40)),
                min_size=1, max_size=400),
       st.integers(min_value=2, max_value=12),
       st.integers(min_value=1, max_value=5))
def test_grouped_merge_law_any_sharding(pairs, k, n_shards):
    """The grouped sketch's merge discipline — per-shard per-group
    summaries, merged group-wise — satisfies the theorems on each
    group's TOTAL stream under arbitrary sharding: groups never
    interact, so Agarwal et al. Thm. 1 applies group-wise and each
    group's n/(k+1) bound is on ITS OWN item count (the exact driver
    merge ``mg_sketch_by`` performs)."""
    from collections import defaultdict

    shards = [pairs[i::n_shards] for i in range(n_shards)]
    per_group = defaultdict(list)
    for sh in shards:
        by_g = defaultdict(list)
        for g, v in sh:
            by_g[str(g)].append(str(v))
        for g, items in by_g.items():
            per_group[g].append(_summary_of(items, k))
    exact = defaultdict(Counter)
    for g, v in pairs:
        exact[str(g)][str(v)] += 1
    assert set(per_group) == set(exact)
    for g, summaries in per_group.items():
        _assert_theorems(mg_merge(summaries), exact[g])


def test_mg_sketch_by_spark_theorems_per_group(spark):
    """The one-pass grouped Spark sketch: each group's summary
    satisfies the theorems against that group's exact counts, with
    groups spread across partitions; NULL groups and NULL values are
    excluded; the group key is its string cast."""
    rows = ([("en", "the")] * 300 + [("en", f"r{i}") for i in range(150)]
            + [("de", "der")] * 200 + [("de", f"q{i}") for i in range(100)]
            + [(None, "ghost"), ("en", None)])
    df = spark.createDataFrame(rows, "g string, v string").repartition(7)
    out = mg_sketch_by(df, "g", "v", k=16)
    assert set(out) == {"en", "de"}
    exact_en = Counter(["the"] * 300 + [f"r{i}" for i in range(150)])
    exact_de = Counter(["der"] * 200 + [f"q{i}" for i in range(100)])
    _assert_theorems(out["en"], exact_en)
    _assert_theorems(out["de"], exact_de)
    assert out["en"].top(1)[0][0] == "the"
    assert out["de"].top(1)[0][0] == "der"
    # per-group n excludes the other group, NULL group, NULL value rows
    assert out["en"].n == 450 and out["de"].n == 300


def test_mg_sketch_by_casts_group_key(spark):
    df = spark.createDataFrame([(1, "a"), (1, "a"), (2, "b")],
                               "g long, v string")
    out = mg_sketch_by(df, "g", "v", k=4)
    assert set(out) == {"1", "2"}
    assert out["1"].counters == {"a": 2}


def test_mg_sketch_by_empty(spark):
    out = mg_sketch_by(spark.createDataFrame([], "g string, v string"),
                       "g", "v", k=4)
    assert out == {}


def test_merge_rejects_mixed_k():
    with pytest.raises(ValueError):
        mg_merge([_summary_of(["a"], 4), _summary_of(["a"], 8)])


def test_mg_sketch_spark_matches_theorems(spark):
    items = (["the"] * 500 + ["of"] * 250 + ["and"] * 125
             + [f"rare{i}" for i in range(400)])
    df = spark.createDataFrame([(v,) for v in items], "v string") \
              .repartition(7)
    s = mg_sketch(df, "v", k=32)
    _assert_theorems(s, Counter(items))
    # the three genuine heavy hitters must surface at the top
    assert [t for t, _ in s.top(3)] == ["the", "of", "and"]


def test_mg_sketch_excludes_nulls_and_counts_n(spark):
    df = spark.createDataFrame([("a",), (None,), ("a",), ("b",)],
                               "v string")
    s = mg_sketch(df, "v", k=8)
    assert s.n == 3 and s.counters == {"a": 2, "b": 1}


def test_mg_sketch_empty_input(spark):
    df = spark.createDataFrame([], "v string")
    s = mg_sketch(df, "v", k=8)
    assert s.n == 0 and s.counters == {} and s.error_bound == 0


def test_heavy_hitters_no_false_negatives(spark):
    items = ["dominant"] * 600 + [f"t{i}" for i in range(200)] * 2
    df = spark.createDataFrame([(v,) for v in items], "v string") \
              .repartition(5)
    hits = heavy_hitters(df, "v", min_ratio=0.3)
    assert "dominant" in [h[0] for h in hits]
    for item, est, bound in hits:
        assert est <= items.count(item) <= est + bound


def test_constraint_gate(spark):
    from term_spark import Check, Level, ValidationSuite

    def run(spark_, tables, check):
        return (ValidationSuite.builder("t").with_check(check)
                .run(spark_, tables))

    skewed = spark.createDataFrame(
        [("x",)] * 80 + [(f"v{i}",) for i in range(20)], "k string")
    balanced = spark.createDataFrame(
        [(f"v{i % 50}",) for i in range(200)], "k string")

    r = run(spark, {"data": skewed},
            Check("hh", Level.ERROR).has_no_heavy_hitters("k", 0.5))
    o = r.report.outcomes[0].result
    assert not r.passed and o.metric == pytest.approx(0.8, abs=0.02)
    assert "'k'" in o.message

    r = run(spark, {"data": balanced},
            Check("hh", Level.ERROR).has_no_heavy_hitters("k", 0.5))
    assert r.passed

    empty = spark.createDataFrame([], "k string")
    res = HeavyHitterConstraint("k", 0.5).evaluate(
        __import__("term_spark.core.constraint",
                   fromlist=["EngineContext"]).EngineContext(
            spark, {"data": empty}, "data"))
    assert res.status.name == "SKIPPED"


def test_constraint_validates_args():
    with pytest.raises(ValueError):
        HeavyHitterConstraint("c", max_ratio=1.5)
    with pytest.raises(ValueError):
        heavy_hitters(None, "c", min_ratio=0.0)


def test_registry_query_attestations(spark):
    """The driver-contract query returns exact top-5 counts with both
    theorem attestations TRUE (what the DuckDB oracle pins)."""
    from term_spark.queries import ORACLES, QUERIES
    import tests.conftest as C

    assert "mg_heavy_hitters_docs" in ORACLES
    rows = QUERIES["mg_heavy_hitters_docs"](spark, C.SF_DIR).collect()
    assert 0 < len(rows) <= 5
    assert all(r["present_ok"] and r["bound_ok"] for r in rows)
    cnts = [r["cnt"] for r in rows]
    assert cnts == sorted(cnts, reverse=True)


def test_incremental_analyzer_integration(spark, tmp_path):
    """MG state rides the engine's incremental algebra: sketch two
    daily partitions, persist JSON states, and the merged metric obeys
    the theorems on the COMBINED stream — no rescan. A fused analyzer
    shares the same run to prove the two state paths coexist."""
    from term_spark.analyzers.base import SizeAnalyzer
    from term_spark.analyzers.heavy_hitters import MGFrequencyAnalyzer
    from term_spark.analyzers.runner import (AnalysisRunner,
                                             FilesystemStateStore,
                                             IncrementalAnalysisRunner)

    day1 = ["the"] * 60 + [f"a{i}" for i in range(30)]
    day2 = ["the"] * 40 + ["of"] * 50 + [f"b{i}" for i in range(20)]
    df1 = spark.createDataFrame([(v,) for v in day1], "tok string")
    df2 = spark.createDataFrame([(v,) for v in day2], "tok string")

    an = MGFrequencyAnalyzer("tok", k=16)
    inc = (IncrementalAnalysisRunner(FilesystemStateStore(str(tmp_path)))
           .add(an).add(SizeAnalyzer()))
    inc.analyze_partition(df1, "2026-08-14")
    inc.analyze_partition(df2, "2026-08-15")
    ctx = inc.aggregate_partitions()

    exact = Counter(day1 + day2)
    merged = MGFrequencyAnalyzer.summary_from_state(
        an.merge_states([
            __import__("term_spark.analyzers.base",
                       fromlist=["AnalyzerState"]).AnalyzerState.from_json(
                inc.store.load(p)["mg_frequency.tok"])
            for p in inc.store.partitions()]))
    _assert_theorems(merged, exact)
    assert merged.top(1)[0][0] == "the"

    # metric = top share; "the" holds 100/200 with bound 200//17
    assert ctx.metric("mg_frequency.tok").value == pytest.approx(
        0.5, abs=200 // 17 / 200 + 1e-9)
    assert ctx.metric("size").value == 200

    # single-shot runner drives the direct-state path alongside fused
    one = AnalysisRunner().add(MGFrequencyAnalyzer("tok", k=16)) \
                          .add(SizeAnalyzer()).run(df2)
    assert one.metric("size").value == len(day2)
    assert one.metric("mg_frequency.tok").value == pytest.approx(
        50 / 110, abs=110 // 17 / 110 + 1e-9)


def test_streaming_monitor_batch_parity(spark, tmp_path):
    """Micro-batch boundaries are shards: streaming the corpus in 3
    batches must satisfy the MG theorems on the WHOLE stream, alert on
    the provably dominant value, and (k > distincts) match the exact
    counts a single batch would give."""
    import os

    from term_spark.streaming import StreamingHeavyHitterMonitor

    src = str(tmp_path / "hh_src")
    os.makedirs(src)
    batches = [["the"] * 30 + ["of"] * 10,
               ["the"] * 40 + [f"t{i}" for i in range(10)],
               ["the"] * 30 + ["of"] * 20]
    for i, items in enumerate(batches):
        spark.createDataFrame([(v,) for v in items], "tok string") \
            .coalesce(1).write.parquet(f"{src}/b{i}.parquet")

    monitor = StreamingHeavyHitterMonitor("tok", k=64, max_ratio=0.6)
    stream = (spark.readStream.schema("tok string")
              .option("maxFilesPerTrigger", 1).parquet(src + "/*.parquet"))
    q = monitor.attach(stream.writeStream).trigger(availableNow=True).start()
    q.awaitTermination(180)

    exact = Counter(v for b in batches for v in b)
    _assert_theorems(monitor.summary, exact)
    # k=64 > 12 distincts: counters are EXACT regardless of batch order
    assert monitor.summary.counters == dict(exact)
    assert monitor.top(1) == [("the", 100)]
    # "the" holds 100/140 > 0.6 — a proof-of-dominance alert fired
    assert any(item == "the" and share > 0.6
               for _, item, share in monitor.alerts)
    assert all(item == "the" for _, item, share in monitor.alerts)


def test_streaming_monitor_validates_ratio():
    from term_spark.streaming import StreamingHeavyHitterMonitor
    with pytest.raises(ValueError):
        StreamingHeavyHitterMonitor("c", max_ratio=1.0)


def test_join_cardinality_exact_when_sketches_saturate(spark):
    """k above both distinct counts: the hot term covers every key, the
    tail is zero, and the estimate IS the exact join size."""
    from term_spark.operators.multitable import estimate_join_cardinality

    left = spark.createDataFrame(
        [("a",)] * 3 + [("b",)] * 2 + [("c",)] * 1, "k string")
    right = spark.createDataFrame(
        [("a",)] * 4 + [("b",)] * 1 + [("d",)] * 5, "k string")
    rep = estimate_join_cardinality(left, right, "k", "k", k=64)
    assert rep["lower_bound"] == 3 * 4 + 2 * 1  # a:12 + b:2
    assert rep["estimate"] == pytest.approx(14.0)
    assert rep["hot_keys"][0] == ("a", 3, 4)


def test_join_cardinality_lower_bound_theorem(spark):
    """Small k on a wide key set: the bound must stay at or below the
    true join size (MG underestimates per key)."""
    from term_spark.operators.multitable import estimate_join_cardinality

    lrows = [(f"k{i % 40}",) for i in range(400)] + [("hot",)] * 100
    rrows = [(f"k{i % 40}",) for i in range(200)] + [("hot",)] * 80
    left = spark.createDataFrame(lrows, "k string").repartition(4)
    right = spark.createDataFrame(rrows, "k string").repartition(3)
    true_size = left.join(right, "k").count()
    rep = estimate_join_cardinality(left, right, "k", "k", k=8)
    assert rep["lower_bound"] <= true_size
    assert rep["hot_keys"][0][0] == "hot"  # 100x80 dominates any k=8 cut


def test_join_cardinality_gate(spark):
    """A provably exploding join fails the suite with salting targets
    named; a modest join passes; empty sides skip."""
    from term_spark import Check, Level, ValidationSuite
    from term_spark.core.constraint import EngineContext
    from term_spark.operators.multitable import JoinCardinalityConstraint

    boom_l = spark.createDataFrame([("x",)] * 1000, "k string")
    boom_r = spark.createDataFrame([("x",)] * 1000, "k string")
    small = spark.createDataFrame([(f"v{i}",) for i in range(50)], "k string")
    tables = {"bl": boom_l, "br": boom_r, "s": small}

    r = (ValidationSuite.builder("t")
         .with_check(Check("jc", Level.ERROR, table="bl")
                     .has_bounded_join_cardinality("bl", "k", "br", "k",
                                                   max_rows=10_000))
         .run(spark, tables))
    o = r.report.outcomes[0].result
    assert not r.passed
    assert "provably >= 1000000" in o.message and "'x' (1000x1000)" in o.message
    assert o.metric == pytest.approx(100.0)  # 1e6 / 1e4

    r = (ValidationSuite.builder("t")
         .with_check(Check("jc", Level.ERROR, table="s")
                     .has_bounded_join_cardinality("s", "k", "br", "k",
                                                   max_rows=10_000))
         .run(spark, tables))
    assert r.passed

    empty = spark.createDataFrame([], "k string")
    res = JoinCardinalityConstraint("e", "k", "e", "k", 10).evaluate(
        EngineContext(spark, {"e": empty}, "e"))
    assert res.status.name == "SKIPPED"

    with pytest.raises(ValueError):
        JoinCardinalityConstraint("a", "k", "b", "k", max_rows=0)


def test_grouped_gate(spark):
    """has_no_heavy_hitters_by: a group dominated by one value fails
    the suite and is named; balanced groups pass; the metric is the
    worst group's (underestimated) ratio."""
    from term_spark import Check, Level, ValidationSuite
    from term_spark.core.result import Status

    rows = ([("skewed", "dominant")] * 80
            + [("skewed", f"t{i}") for i in range(20)]
            + [("balanced", f"v{i % 10}") for i in range(100)])
    df = spark.createDataFrame(rows, "src string, v string").repartition(5)

    ok = ValidationSuite.builder("g1").with_check(
        Check("c", Level.ERROR)
        .has_no_heavy_hitters_by("src", "v", max_ratio=0.85)).run(spark, df)
    assert ok.passed

    bad = ValidationSuite.builder("g2").with_check(
        Check("c", Level.ERROR)
        .has_no_heavy_hitters_by("src", "v", max_ratio=0.5)).run(spark, df)
    assert not bad.passed
    msg = bad.report.outcomes[0].result.message
    assert "skewed" in msg and "dominant" in msg
    assert "balanced" not in msg


def test_grouped_gate_validates_args():
    from term_spark.analyzers.heavy_hitters import GroupedHeavyHitterConstraint

    with pytest.raises(ValueError, match="max_ratio"):
        GroupedHeavyHitterConstraint("g", "v", max_ratio=1.5)


def test_streaming_grouped_monitor_batch_parity(spark, tmp_path):
    """Grouped streaming monitor: per-group theorems over the whole
    stream, per-group alert on the provably dominant value only in the
    dominated group, exact counters when k > per-group distincts."""
    import os

    from term_spark.streaming import StreamingGroupedHeavyHitterMonitor

    src = str(tmp_path / "ghh_src")
    os.makedirs(src)
    batches = [[("en", "the")] * 30 + [("de", "der")] * 5 + [("de", "x")] * 5,
               [("en", "the")] * 20 + [("en", "of")] * 10
               + [("de", f"q{i}") for i in range(10)],
               [("en", "the")] * 30 + [("de", "x")] * 10]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, "src string, tok string") \
            .coalesce(1).write.parquet(f"{src}/b{i}.parquet")

    monitor = StreamingGroupedHeavyHitterMonitor("src", "tok", k=64,
                                                 max_ratio=0.6)
    stream = (spark.readStream.schema("src string, tok string")
              .option("maxFilesPerTrigger", 1).parquet(src + "/*.parquet"))
    q = monitor.attach(stream.writeStream).trigger(availableNow=True).start()
    q.awaitTermination(180)

    flat = [r for b in batches for r in b]
    exact_en = Counter(t for g, t in flat if g == "en")
    exact_de = Counter(t for g, t in flat if g == "de")
    assert monitor.groups() == ["de", "en"]
    _assert_theorems(monitor.summaries["en"], exact_en)
    _assert_theorems(monitor.summaries["de"], exact_de)
    # k=64 > per-group distincts: exact regardless of batch order
    assert monitor.summaries["en"].counters == dict(exact_en)
    assert monitor.summaries["de"].counters == dict(exact_de)
    assert monitor.top("en", 1) == [("the", 80)]
    # "the" dominates en (80/90); nothing dominates de (x: 15/30 = 0.5)
    assert any(g == "en" and item == "the" and share > 0.6
               for _, g, item, share in monitor.alerts)
    assert all(g == "en" for _, g, item, share in monitor.alerts)


def test_streaming_grouped_monitor_validates_ratio():
    from term_spark.streaming import StreamingGroupedHeavyHitterMonitor

    with pytest.raises(ValueError, match="max_ratio"):
        StreamingGroupedHeavyHitterMonitor("g", "v", max_ratio=2.0)
