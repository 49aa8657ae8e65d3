"""Streaming round-5 additions: watermarked stream-stream attribution
join (bounded join state via the time-range condition) and per-batch
metric anomaly detection against repository history."""

import datetime as dt
import os

import pytest

import pyspark.sql.functions as F

from term_spark.analyzers.anomaly import AbsoluteChange, ZScore
from term_spark.repository import InMemoryRepository
from term_spark.streaming import StreamingAnomalyMonitor, attribution_join

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def test_attribution_join_matches_within_tolerance(spark, tmp_path):
    imps = [(1, _ts(0), "ad_a"), (2, _ts(0), "ad_b"), (3, _ts(5), "ad_c")]
    clicks = [
        (1, _ts(10), "home"),    # 10 min after imp 1 -> match
        (2, _ts(45), "cart"),    # 45 min after imp 2 -> outside 30m
        (3, _ts(2), "home"),     # 3 min BEFORE imp 3 -> no match
    ]
    isrc, csrc = str(tmp_path / "imps"), str(tmp_path / "clicks")
    spark.createDataFrame(imps, "user long, ts timestamp, ad string") \
        .write.parquet(isrc)
    spark.createDataFrame(clicks, "user long, ts timestamp, page string") \
        .write.parquet(csrc)

    istream = spark.readStream.schema("user long, ts timestamp, ad string") \
        .parquet(isrc)
    cstream = spark.readStream.schema("user long, ts timestamp, page string") \
        .parquet(csrc)
    joined = attribution_join(istream, cstream, "user",
                              tolerance="30 minutes", watermark="1 hour")
    q = (joined.writeStream.format("memory").queryName("attrib")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)

    rows = spark.sql("SELECT * FROM attrib").collect()
    assert [(r["user"], r["l_ad"], r["r_page"]) for r in rows] == \
        [(1, "ad_a", "home")]
    assert rows[0]["lag_seconds"] == pytest.approx(600.0)


def test_attribution_join_plan_has_bounded_state_condition(spark, tmp_path):
    # the analyzed plan must carry watermarks on BOTH sides — that is
    # what authorizes state eviction in a stream-stream join
    isrc = str(tmp_path / "i2")
    spark.createDataFrame([(1, _ts(0), "x")],
                          "user long, ts timestamp, ad string").write.parquet(isrc)
    s1 = spark.readStream.schema("user long, ts timestamp, ad string").parquet(isrc)
    s2 = spark.readStream.schema("user long, ts timestamp, page string").parquet(isrc)
    j = attribution_join(s1, s2, "user")
    import re
    plan = j._jdf.queryExecution().analyzed().toString()
    assert len(re.findall(r"EventTimeWatermark", plan)) == 2


def test_streaming_anomaly_monitor_alerts_on_spike(spark, tmp_path):
    src = str(tmp_path / "mon_src")
    os.makedirs(src)
    # batches 0/1: ~10 rows, value ~1; batch 2: row-count x10 spike
    for i, (n, v) in enumerate([(10, 1.0), (11, 1.1), (100, 1.05)]):
        spark.createDataFrame([(float(v),)] * n, "v double").coalesce(1) \
            .write.parquet(f"{src}/b{i}.parquet")

    repo = InMemoryRepository()
    monitor = StreamingAnomalyMonitor(
        {"n_rows": F.count(F.lit(1)), "mean_v": F.avg("v")},
        repository=repo,
        detector=AbsoluteChange(max_increase=20, min_history=1))
    stream = (spark.readStream.schema("v double")
              .option("maxFilesPerTrigger", 1).parquet(src + "/*.parquet"))
    q = monitor.attach(stream.writeStream).trigger(availableNow=True).start()
    q.awaitTermination(180)

    # history accumulated one row per batch
    assert repo.series("n_rows") == [10.0, 11.0, 100.0]
    # exactly the row-count spike alerted; the mean stayed inside bounds
    assert [(m, r.value) for _, m, r in monitor.alerts] == [("n_rows", 100.0)]


def test_streaming_anomaly_monitor_respects_min_history(spark, tmp_path):
    src = str(tmp_path / "mon2_src")
    os.makedirs(src)
    for i, n in enumerate([10, 1000]):
        spark.createDataFrame([(1.0,)] * n, "v double").coalesce(1) \
            .write.parquet(f"{src}/b{i}.parquet")
    repo = InMemoryRepository()
    monitor = StreamingAnomalyMonitor(
        {"n_rows": F.count(F.lit(1))}, repository=repo,
        detector=ZScore(threshold=3.0, min_history=3))
    stream = (spark.readStream.schema("v double")
              .option("maxFilesPerTrigger", 1).parquet(src + "/*.parquet"))
    q = monitor.attach(stream.writeStream).trigger(availableNow=True).start()
    q.awaitTermination(180)
    # two batches < min_history+1 -> no alerts, but history recorded
    assert monitor.alerts == []
    assert repo.series("n_rows") == [10.0, 1000.0]


def test_streaming_pii_monitor_alerts_and_totals(spark, tmp_path):
    from term_spark.streaming import StreamingPiiMonitor
    src = str(tmp_path / "pii_src")
    os.makedirs(src)
    batches = [
        [("clean text one",), ("clean text two",)],                  # b0
        [("contact bob@example.com now",), ("clean",)],              # b1
        [("card 4111 1111 1111 1111",), ("card 4111-1111-1111-1112",)],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, "text string").coalesce(1) \
            .write.parquet(f"{src}/b{i}.parquet")

    monitor = StreamingPiiMonitor(max_ratio=0.0)
    stream = (spark.readStream.schema("text string")
              .option("maxFilesPerTrigger", 1).parquet(src + "/*.parquet"))
    q = monitor.attach(stream.writeStream).trigger(availableNow=True).start()
    q.awaitTermination(180)

    st = monitor.status()
    assert st["n_docs"] == 6
    # the Luhn-invalid card must NOT count — 1 email + 1 valid card
    assert st["docs_with_pii"] == 2
    assert st["total_pii"] == 2
    assert st["pii_ratio"] == pytest.approx(2 / 6)
    # both PII-carrying batches alerted (release-gate max_ratio=0)
    assert [b for b, _, _ in monitor.alerts] == [1, 2]


def test_streaming_pii_rate_metrics_windowed(spark, tmp_path):
    from term_spark.streaming import pii_rate_metrics
    src = str(tmp_path / "pii_win_src")
    os.makedirs(src)
    rows = [
        ("2024-01-01 00:00:10", "contact bob@example.com"),
        ("2024-01-01 00:00:20", "clean"),
        ("2024-01-01 00:01:10", "clean"),
        ("2024-01-01 00:01:20", "clean"),
    ]
    spark.createDataFrame(rows, "ts string, text string") \
        .selectExpr("CAST(ts AS TIMESTAMP) AS ts", "text") \
        .coalesce(1).write.parquet(f"{src}/b0.parquet")

    stream = spark.readStream.schema("ts timestamp, text string") \
        .parquet(src + "/*.parquet")
    out = pii_rate_metrics(stream, "ts", window="1 minute")
    # complete mode: append would withhold windows the 10-minute
    # watermark hasn't closed yet (none, with a 90-second stream)
    q = (out.writeStream.format("memory").queryName("pii_win")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = {r["window"]["start"].minute: r
           for r in spark.sql("SELECT * FROM pii_win").collect()}
    assert got[0]["n_docs"] == 2 and got[0]["docs_with_pii"] == 1
    assert got[0]["pii_ratio"] == pytest.approx(0.5)
    assert got[1]["n_docs"] == 2 and got[1]["docs_with_pii"] == 0


def test_streaming_distinct_monitor_tracks_and_alerts(spark, tmp_path):
    from term_spark.streaming import StreamingDistinctMonitor
    src = str(tmp_path / "dist_src")
    os.makedirs(src)
    # batch 0: users 0..9; batch 1: users 5..14 (overlap!); batch 2: 15..39
    batches = [range(0, 10), range(5, 15), range(15, 40)]
    for i, rng in enumerate(batches):
        spark.createDataFrame([(u, "x") for u in rng],
                              "user_id long, k string").coalesce(1) \
            .write.parquet(f"{src}/b{i}.parquet")

    alerts = []
    monitor = StreamingDistinctMonitor(
        ["user_id", "k"], max_distinct={"user_id": 30},
        on_alert=lambda b, c, e: alerts.append((b, c, e)))
    stream = (spark.readStream.schema("user_id long, k string")
              .option("maxFilesPerTrigger", 1).parquet(src + "/*.parquet"))
    q = monitor.attach(stream.writeStream).trigger(availableNow=True).start()
    q.awaitTermination(180)

    est = monitor.estimates()
    # sparse-mode HLL at this size is exact: the 5-user overlap between
    # batches 0 and 1 must NOT double-count (the idempotence property)
    assert est["user_id"] == 40
    assert est["k"] == 1
    assert monitor.n_rows == 45
    # the cap tripped exactly once, on the batch that crossed 30
    assert [(c) for _, c, _ in alerts] == ["user_id"]
    assert alerts[0][2] == 40


def test_streaming_distinct_monitor_validates_inputs(spark):
    from term_spark.streaming import StreamingDistinctMonitor
    with pytest.raises(ValueError, match="empty column list"):
        StreamingDistinctMonitor([])
    with pytest.raises(ValueError, match="untracked"):
        StreamingDistinctMonitor(["a"], max_distinct={"b": 10})


def test_streaming_quantile_monitor_tracks_and_alerts(spark, tmp_path):
    from term_spark.streaming import StreamingQuantileMonitor
    src = str(tmp_path / "q_src")
    os.makedirs(src)
    # batches 0-1: lengths ~ U[100, 300); batch 2: boilerplate flood
    # (2000 of 2400 rows are 12 chars -> the MEDIAN collapses to 12)
    import itertools
    batches = [
        [(i, 100 + (i * 37) % 200) for i in range(200)],
        [(i, 100 + (i * 53) % 200) for i in range(200)],
        [(i, 12) for i in range(2000)],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, "doc_id long, n_chars long") \
            .coalesce(1).write.parquet(f"{src}/b{i}.parquet")

    alerts = []
    monitor = StreamingQuantileMonitor(
        ["n_chars"], bounds={"n_chars": (0.5, 50.0, 1000.0)},
        on_alert=lambda b, c, q, e: alerts.append((c, q, e)))
    stream = (spark.readStream.schema("doc_id long, n_chars long")
              .option("maxFilesPerTrigger", 1).parquet(src + "/*.parquet"))
    q = monitor.attach(stream.writeStream).trigger(availableNow=True).start()
    q.awaitTermination(180)

    assert monitor.n_rows == 2400
    est = monitor.quantiles([0.5, 0.95])["n_chars"]
    assert est[0.5] < 50.0          # the flood dragged the median under the floor
    assert est[0.95] > 50.0         # the tail still reads the real docs
    assert len(alerts) == 1 and alerts[0][0] == "n_chars"
    # replayed batch ids fold exactly once (at-least-once safety)
    before = monitor.quantiles([0.5])["n_chars"][0.5]
    df = spark.createDataFrame(batches[0], "doc_id long, n_chars long")
    monitor.foreach_batch(df, 0)    # same id as the first batch -> no-op
    assert monitor.n_rows == 2400
    assert monitor.quantiles([0.5])["n_chars"][0.5] == before
    # compaction keeps readings close and memory O(k)
    monitor.compact()
    assert all(len(v) == 1 for v in monitor._states.values())
    after = monitor.quantiles([0.5])["n_chars"][0.5]
    assert abs(after - before) <= 0.05 * max(abs(before), 1.0)


def test_streaming_quantile_monitor_validates_inputs(spark):
    from term_spark.streaming import StreamingQuantileMonitor
    with pytest.raises(ValueError, match="empty column list"):
        StreamingQuantileMonitor([])
    with pytest.raises(ValueError, match="untracked"):
        StreamingQuantileMonitor(["a"], bounds={"b": (0.5, 0, 1)})
    with pytest.raises(ValueError, match="bounds"):
        StreamingQuantileMonitor(["a"], bounds={"a": (1.5, 0, 1)})


def test_quantile_monitor_failed_batch_retry_is_folded(spark):
    """Exactly-once under failure (round-13 fix): a batch whose fold
    THROWS must not be marked seen — Spark's retry (same batch_id)
    must fold it, while a retry of a SUCCESSFUL batch stays a no-op."""
    from term_spark.streaming import StreamingQuantileMonitor
    monitor = StreamingQuantileMonitor(["v"], k=16)
    good = spark.createDataFrame([(float(i),) for i in range(10)],
                                 "v double")

    class _Boom(Exception):
        pass

    class _FailingDF:
        def agg(self, *a, **k):
            raise _Boom()

    import pytest
    with pytest.raises(_Boom):
        monitor.foreach_batch(_FailingDF(), 0)
    assert monitor.n_rows == 0
    monitor.foreach_batch(good, 0)        # retry of the failed batch
    assert monitor.n_rows == 10
    monitor.foreach_batch(good, 0)        # replay of a folded batch
    assert monitor.n_rows == 10


def test_streaming_embedding_quality_monitor_alerts_and_replay(spark, tmp_path):
    """The streaming form of has_valid_embeddings (round 14): exact
    running counters, alert on the tipping batch, replayed batch ids
    fold exactly once, and the bad-vector predicate is the SAME one
    the batch gate uses."""
    from term_spark.streaming import StreamingEmbeddingQualityMonitor
    src = str(tmp_path / "emb_src")
    os.makedirs(src)
    batches = [
        [(1, [0.6, 0.8]), (2, [1.0, 0.0])],               # b0 clean
        [(3, [float("nan"), 1.0]), (4, [0.0, 1.0])],      # b1: 1 bad
        [(5, None), (6, [0.0, 0.0])],                     # b2: 2 bad
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, "vec_id long, embedding array<double>") \
            .coalesce(1).write.parquet(f"{src}/b{i}.parquet")

    monitor = StreamingEmbeddingQualityMonitor(expect_dim=2)
    stream = (spark.readStream.schema("vec_id long, embedding array<double>")
              .option("maxFilesPerTrigger", 1).parquet(src + "/*.parquet"))
    q = monitor.attach(stream.writeStream).trigger(availableNow=True).start()
    q.awaitTermination(180)

    st = monitor.status()
    assert st["n_vecs"] == 6 and st["n_bad"] == 3
    assert st["bad_ratio"] == pytest.approx(0.5)
    assert [b for b, _, _ in monitor.alerts] == [1, 2]

    # replayed batch id is a no-op (exactly-once)
    replay = spark.createDataFrame(batches[1],
                                   "vec_id long, embedding array<double>")
    monitor.foreach_batch(replay, 1)
    assert monitor.status()["n_vecs"] == 6

    with pytest.raises(ValueError, match="max_bad_ratio"):
        StreamingEmbeddingQualityMonitor(max_bad_ratio=1.5)
