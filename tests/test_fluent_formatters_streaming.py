"""Multi-table fluent DSL, formatters, sources, streaming wrapper."""

import time

import pytest

from term_spark import Assertion, Check, Level, ValidationSuite
from term_spark.core.fluent import validate_tables
from term_spark.formatters import (FormatterConfig, HumanFormatter,
                                   JsonFormatter)


def test_fluent_multi_table_dsl(spark, tpch):
    check = (validate_tables("orders", "customer")
             .join_on("o_custkey", "c_custkey")
             .ensure_referential_integrity()
             .expect_join_coverage(1.0)
             .expect_bounded_join_size(10_000_000)
             .and_validate_tables("orders", "lineitem")
             .ensure_sum_consistency("o_totalprice", "l_extendedprice")
             .group_by("o_orderkey", "l_orderkey")
             .with_tolerance(1e12)  # synthetic data doesn't reconcile; huge tol
             .and_validate_temporal("events")
             .within_business_hours("ts", 0, 24, weekdays_only=False)
             .build())
    assert len(check.constraints) == 5
    result = (ValidationSuite.builder("fluent").with_check(check)
              .run(spark, tpch))
    assert result.passed, result.report.to_json(2)


def test_fluent_requires_stages():
    with pytest.raises(ValueError):
        validate_tables("a", "b").ensure_referential_integrity()


def test_formatters(spark, nulls_df):
    suite = (ValidationSuite.builder("fmt")
             .with_check(Check("c", Level.ERROR)
                         .is_complete("id")
                         .completeness("name", Assertion.ge(0.9))))
    result = suite.run(spark, nulls_df)
    js = JsonFormatter().format(result)
    assert '"passed": false' in js
    human = HumanFormatter().format(result)
    assert "FAILED" in human and "completeness" in human
    minimal = HumanFormatter(FormatterConfig.minimal()).format(result)
    assert "✓" not in minimal and "✗" in minimal


def test_sources_csv_json_roundtrip(spark, tmp_path, dupes_df):
    from term_spark.sources import JoinedSource, read_csv, read_json

    csv_path = str(tmp_path / "data_csv")
    dupes_df.write.option("header", True).csv(csv_path)
    back = read_csv(spark, csv_path)
    assert back.count() == 6 and set(back.columns) == set(dupes_df.columns)

    json_path = str(tmp_path / "data_json")
    dupes_df.write.json(json_path)
    back = read_json(spark, json_path, multiline=False)
    assert back.count() == 6

    j = JoinedSource(back, back.select("transaction_id").distinct(),
                     "transaction_id", "inner")
    assert j.df().count() == 6


def test_streaming_suite_per_microbatch(spark, tmp_path):
    """foreachBatch wrapper drives the batch engine per micro-batch and
    feeds the metrics repository."""
    from term_spark.analyzers.anomaly import AnomalyDetector, ZScore
    from term_spark.repository import InMemoryRepository
    from term_spark.streaming import StreamingSuiteRunner

    src = str(tmp_path / "stream_src")
    import os
    os.makedirs(src)
    df = spark.createDataFrame([(i, float(i)) for i in range(50)], "id long, v double")
    df.write.parquet(src + "/batch0.parquet")

    stream = spark.readStream.schema("id long, v double").parquet(src + "/*.parquet")
    suite = (ValidationSuite.builder("stream_suite")
             .with_check(Check("c", Level.ERROR)
                         .is_complete("id").has_min("v", Assertion.ge(0))))
    repo = InMemoryRepository()
    runner = StreamingSuiteRunner(suite, repository=repo)
    q = runner.attach(stream.writeStream).trigger(availableNow=True).start()
    q.awaitTermination(120)
    assert runner.results, "no micro-batch processed"
    bid, result = runner.results[0]
    assert result.passed
    assert repo.series("completeness.id") == [1.0]
    assert not AnomalyDetector(ZScore()).detect_series(
        repo.series("completeness.id") * 4).is_anomaly


def test_windowed_metrics_stream(spark, tpch, tmp_path):
    """Watermarked windowed aggregation over the events table replayed
    as a file stream."""
    import pyspark.sql.functions as F
    from term_spark.streaming import windowed_metrics

    src = str(tmp_path / "events_stream")
    tpch["events"].write.parquet(src)
    schema = tpch["events"].schema
    stream = spark.readStream.schema(schema).parquet(src)
    agg = windowed_metrics(
        stream, "ts",
        {"n": F.count(F.lit(1)), "nn_value": F.count("value")},
        window="1 day", watermark="1 hour")
    # complete mode: emits every window each trigger (append mode would
    # hold back windows still inside the watermark at end-of-input)
    q = (agg.writeStream.format("memory").queryName("win_metrics")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.sql("select * from win_metrics").collect()
    # events span ~30 days → ~30 daily windows; counts must sum to total
    total = sum(r["n"] for r in rows)
    assert total == tpch["events"].count()
    assert 25 <= len(rows) <= 35


def test_running_stats_stream_state_across_batches(spark, tmp_path):
    """applyInPandasWithState keeps per-key (n, sum, sum2) across
    micro-batches: two files processed as separate batches
    (maxFilesPerTrigger=1) must end with the cumulative stats."""
    import math
    import os
    import statistics

    from term_spark.streaming import running_stats_stream

    src = str(tmp_path / "rs_src")
    os.makedirs(src)
    b0 = [(1, 1.0), (1, 2.0), (2, 10.0)]
    b1 = [(1, 3.0), (2, 20.0), (2, 30.0)]
    spark.createDataFrame(b0, "k long, v double").coalesce(1) \
        .write.parquet(src + "/b0.parquet")
    spark.createDataFrame(b1, "k long, v double").coalesce(1) \
        .write.parquet(src + "/b1.parquet")

    stream = (spark.readStream.schema("k long, v double")
              .option("maxFilesPerTrigger", 1).parquet(src + "/*.parquet"))
    out = running_stats_stream(stream, "k", "v")
    q = (out.writeStream.format("memory").queryName("running_stats")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(180)

    rows = spark.sql("SELECT * FROM running_stats").collect()
    assert len(rows) >= 3  # >=2 batches emitted, keys overlap
    # last emission per key carries the cumulative state
    final = {}
    for r in rows:  # memory sink appends in batch order
        final[r["k"]] = (r["n"], r["mean"], r["stddev"])
    all_v = {1: [1.0, 2.0, 3.0], 2: [10.0, 20.0, 30.0]}
    for k, vs in all_v.items():
        n, mean, std = final[k]
        assert n == len(vs)
        assert mean == pytest.approx(statistics.mean(vs))
        assert std == pytest.approx(statistics.stdev(vs))


def test_running_stats_stream_string_key(spark, tmp_path):
    """The output schema derives the key type from the input stream —
    a string user-id key must work, not just bigint."""
    import os

    from term_spark.streaming import running_stats_stream

    src = str(tmp_path / "rs_str_src")
    os.makedirs(src)
    spark.createDataFrame([("alice", 1.0), ("alice", 3.0), ("bob", 5.0)],
                          "k string, v double").coalesce(1) \
        .write.parquet(src + "/b0.parquet")
    stream = spark.readStream.schema("k string, v double").parquet(
        src + "/*.parquet")
    out = running_stats_stream(stream, "k", "v")
    q = (out.writeStream.format("memory").queryName("running_stats_str")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(180)
    rows = {r["k"]: r for r in
            spark.sql("SELECT * FROM running_stats_str").collect()}
    assert rows["alice"]["n"] == 2 and rows["alice"]["mean"] == 2.0
    assert rows["bob"]["n"] == 1


def test_session_metrics_stream(spark, tmp_path):
    """Native session_window sessionization: events 10s apart share a
    session; a 10-minute gap opens a new one."""
    import os

    from term_spark.streaming import session_metrics

    src = str(tmp_path / "sess_src")
    os.makedirs(src)
    rows = [(7, "2024-01-01 00:00:00"), (7, "2024-01-01 00:00:10"),
            (7, "2024-01-01 00:20:00"),          # > 5 min gap -> new session
            (8, "2024-01-01 00:00:05")]
    df = spark.createDataFrame(rows, "user_id long, ts_s string") \
        .selectExpr("user_id", "CAST(ts_s AS TIMESTAMP) AS ts")
    df.coalesce(1).write.parquet(src + "/b0.parquet")

    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(
        src + "/*.parquet")
    agg = session_metrics(stream, "ts", "user_id", gap="5 minutes")
    q = (agg.writeStream.format("memory").queryName("sess_metrics")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    out = spark.sql(
        "SELECT user_id, n_events FROM sess_metrics ORDER BY user_id, n_events"
    ).collect()
    assert [(r["user_id"], r["n_events"]) for r in out] == [(7, 1), (7, 2), (8, 1)]


def test_drift_metrics_stream_psi_per_window(spark, tmp_path):
    """PSI emitted per micro-batch window vs a static reference: day 1
    reproduces the reference distribution (PSI ~ 0), day 2 is shifted
    (PSI above the 0.25 drifted line). Batch parity pinned on day 1."""
    import datetime as dt

    import pyspark.sql.functions as F
    from term_spark.operators.statistics import population_stability
    from term_spark.streaming import drift_metrics

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    for i in range(400):  # day 1: uniform over [0, 50) — matches ref
        rows.append((base + dt.timedelta(seconds=i), float(i % 50)))
    for i in range(400):  # day 2: shifted mass, upper edge only
        rows.append((base + dt.timedelta(days=1, seconds=i),
                     45.0 + (i % 5)))
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    src = str(tmp_path / "drift_stream")
    df.write.parquet(src)

    ref = spark.createDataFrame(
        [(float(i % 50),) for i in range(1000)], "v double")

    stream = spark.readStream.schema("ts timestamp, v double").parquet(src)
    agg = drift_metrics(stream, "ts", "v", ref, bins=10, lo=0.0, hi=50.0,
                        window="1 day", watermark="1 hour")
    q = (agg.writeStream.format("memory").queryName("drift_win")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["window"]["start"].day: r for r in
           spark.sql("select * from drift_win").collect()}
    assert set(got) == {1, 2} and all(r["n_events"] == 400 for r in got.values())
    assert got[1]["psi"] < 0.01      # same distribution as reference
    assert got[2]["psi"] > 0.25      # shifted day trips the drifted line

    # W1 rides the same agg: near 0 on the matching day; on the shifted
    # day mass sits entirely in the top bucket vs a uniform reference,
    # whose exact binned W1 is sum(0.1..0.9)/10 = 0.45
    assert got[1]["w1_norm"] < 0.01
    assert got[2]["w1_norm"] == pytest.approx(0.45, abs=0.01)

    # streamed PSI == batch population_stability over the same rows
    day1 = df.filter(F.col("ts") < dt.datetime(2024, 1, 2))
    batch = population_stability(ref, day1, "v",
                                 bins=10, lo=0.0, hi=50.0).collect()[0]
    assert got[1]["psi"] == batch["psi"]

    # streamed W1 == batch wasserstein_1 over the same rows
    from term_spark.operators.drift import wasserstein_1
    b1 = wasserstein_1(ref, day1, "v", bins=10, lo=0.0,
                       hi=50.0).collect()[0]
    assert got[1]["w1_norm"] == b1["w1_norm"]


def test_windowed_pii_metrics_stream(spark, tmp_path):
    """The PII count expressions compose straight into windowed_metrics:
    a per-window PII-row counter needs no dedicated streaming operator."""
    import datetime as dt

    import pyspark.sql.functions as F
    from term_spark.operators.pii import pii_count_expr
    from term_spark.streaming import windowed_metrics

    base = dt.datetime(2024, 3, 1)
    rows = [(base + dt.timedelta(seconds=i), "clean row") for i in range(20)]
    rows += [(base + dt.timedelta(days=1, seconds=i),
              "leak a@b.io here" if i % 4 == 0 else "still clean")
             for i in range(20)]
    df = spark.createDataFrame(rows, "ts timestamp, text string")
    src = str(tmp_path / "pii_stream")
    df.write.parquet(src)

    txt = F.coalesce(F.col("text"), F.lit(""))
    pii_total = pii_count_expr(txt, "email") + pii_count_expr(txt, "credit_card")
    stream = spark.readStream.schema("ts timestamp, text string").parquet(src)
    agg = windowed_metrics(
        stream, "ts",
        {"n": F.count(F.lit(1)),
         "pii_rows": F.count(F.when(pii_total > 0, 1))},
        window="1 day", watermark="1 hour")
    q = (agg.writeStream.format("memory").queryName("pii_win")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["window"]["start"].day: r
           for r in spark.sql("select * from pii_win").collect()}
    assert got[1]["pii_rows"] == 0 and got[1]["n"] == 20
    assert got[2]["pii_rows"] == 5 and got[2]["n"] == 20


def test_streaming_quarantine_via_foreachbatch(spark, tmp_path):
    """The row-level predicates compose unchanged into foreachBatch:
    per micro-batch, bad rows route to a quarantine sink and good rows
    continue — no dedicated streaming operator needed."""
    from term_spark import Check, Level
    from term_spark.core.rows import quarantine_rows

    src = str(tmp_path / "rows_src")
    good_out = str(tmp_path / "good")
    bad_out = str(tmp_path / "bad")
    spark.createDataFrame(
        [(1, 5.0), (2, -3.0), (3, 7.0), (4, 99.0)],
        "id long, v double").write.parquet(src)

    check = Check("q", Level.ERROR).value_range("v", 0.0, 10.0)

    def route(batch_df, batch_id):
        good, bad = quarantine_rows(batch_df, check)
        good.write.mode("append").parquet(good_out)
        bad.withColumn("__violations",
                       __import__("pyspark.sql.functions",
                                  fromlist=["F"]).array_join(
                           "__violations", ";")) \
           .write.mode("append").parquet(bad_out)

    stream = spark.readStream.schema("id long, v double").parquet(src)
    q = (stream.writeStream.foreachBatch(route)
         .trigger(availableNow=True)
         .option("checkpointLocation", str(tmp_path / "ckpt")).start())
    q.awaitTermination(120)

    good_ids = sorted(r["id"] for r in spark.read.parquet(good_out).collect())
    bad_rows = spark.read.parquet(bad_out).collect()
    assert good_ids == [1, 3]
    assert sorted(r["id"] for r in bad_rows) == [2, 4]
    assert all(r["__violations"] == "value_range(v)" for r in bad_rows)


def test_text_quality_metrics_stream_batch_parity(spark, tmp_path):
    """Round 8: per-window readable/Gopher shares from the stream equal
    the batch gates' expressions over the same rows — window 1 holds
    readable prose, window 2 junk; a blank-only window reports NULL
    readable_ratio rather than a fake 0."""
    import datetime as dt

    import pyspark.sql.functions as F
    from term_spark.operators.text import flesch_ease_col, gopher_passes_col
    from term_spark.streaming import text_quality_metrics

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    prose = ("This is a perfectly ordinary paragraph of well formed prose "
             "that keeps going with sensible words and normal structure "
             "throughout the entire document body here again and then some "
             "more ordinary filler words to pass the fifty word minimum "
             "rule of the bundle easily by now with room to spare for "
             "every single threshold check")
    rows = [(base + dt.timedelta(seconds=i), prose) for i in range(8)]
    rows += [(base + dt.timedelta(seconds=8), "short")]
    rows += [(base + dt.timedelta(minutes=1, seconds=i), "#### " * 40)
             for i in range(4)]
    rows += [(base + dt.timedelta(minutes=2), ""),
             (base + dt.timedelta(minutes=2, seconds=1), None)]
    df = spark.createDataFrame(rows, "ts timestamp, text string")
    src = str(tmp_path / "text_stream")
    df.write.parquet(src)

    stream = spark.readStream.schema("ts timestamp, text string").parquet(src)
    agg = text_quality_metrics(stream, "ts", window="1 minute")
    q = (agg.writeStream.format("memory").queryName("tq_win")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["window"]["start"].minute: r for r in
           spark.sql("select * from tq_win").collect()}

    assert set(got) == {0, 1, 2}
    assert got[0]["n_docs"] == 9
    assert got[0]["gopher_pass_ratio"] == round(8 / 9, 6)
    assert got[1]["gopher_pass_ratio"] == 0.0      # symbol-flood junk
    assert got[2]["readable_ratio"] is None        # blank-only window
    assert got[2]["mean_tokens"] == 0.0

    # exact batch parity on window 0's rows, via the same expressions
    w0 = df.filter(F.col("ts") < base + dt.timedelta(minutes=1))
    ease = flesch_ease_col("text")
    batch = w0.agg(
        F.round(F.count(F.when(ease.between(10.0, 125.0), 1))
                / F.count(F.when(ease.isNotNull(), 1)), 6).alias("rr"),
        F.round(F.count(F.when(gopher_passes_col("text"), 1))
                / F.count(F.lit(1)), 6).alias("gp")).collect()[0]
    assert got[0]["readable_ratio"] == batch["rr"]
    assert got[0]["gopher_pass_ratio"] == batch["gp"]
