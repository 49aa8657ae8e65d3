"""Property-based tests (hypothesis) — the reference's pattern
(tests/property_tests.rs:16-41): generate data with controlled
null-fraction / match-rate, compute the expected metric independently
in Python, compare exactly (fp tolerance where float arithmetic is
involved). Categories: completeness, size, statistics (n−1 stddev),
patterns with controlled match rates, uniqueness, multi-constraint
suite consistency.
"""

import math
import statistics

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from term_spark import Assertion, Check, Level, Status, ValidationSuite

SET = settings(max_examples=12, deadline=None,
               suppress_health_check=[HealthCheck.function_scoped_fixture])


def run_metric(spark, df, check):
    result = ValidationSuite.builder("prop").with_check(check).run(spark, df)
    return result.report.outcomes[0].result


@given(values=st.lists(st.one_of(st.none(), st.floats(allow_nan=False,
                                                      allow_infinity=False,
                                                      width=32)),
                       min_size=1, max_size=60))
@SET
def test_completeness_matches_python(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "x double")
    expected = sum(1 for v in values if v is not None) / len(values)
    res = run_metric(spark, df, Check("c").completeness("x", Assertion.between(0, 1)))
    assert res.metric == pytest.approx(expected, abs=1e-12)


@given(values=st.lists(st.floats(min_value=-1e6, max_value=1e6,
                                 allow_nan=False), min_size=2, max_size=50))
@SET
def test_stddev_is_sample_stddev(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "x double")
    expected = statistics.stdev(values)  # n−1, like the reference pins
    res = run_metric(spark, df,
                     Check("c").has_standard_deviation("x", Assertion.ge(0)))
    if math.isclose(expected, 0.0, abs_tol=1e-12):
        assert (res.metric or 0.0) == pytest.approx(0.0, abs=1e-9)
    else:
        assert res.metric == pytest.approx(expected, rel=1e-9)


@given(n_match=st.integers(0, 30), n_miss=st.integers(0, 30))
@SET
def test_format_match_rate_controlled(spark, n_match, n_miss):
    if n_match + n_miss == 0:
        return
    rows = [("a@x.com",)] * n_match + [("not-an-email",)] * n_miss
    df = spark.createDataFrame(rows, "email string")
    expected = n_match / (n_match + n_miss)
    res = run_metric(spark, df,
                     Check("c").validates_email("email", Assertion.between(0, 1)))
    assert res.metric == pytest.approx(expected, abs=1e-12)


@given(dup_groups=st.lists(st.integers(1, 5), min_size=1, max_size=20))
@SET
def test_uniqueness_and_uvr_match_python(spark, dup_groups):
    rows = []
    for gi, count in enumerate(dup_groups):
        rows += [(f"v{gi}",)] * count
    df = spark.createDataFrame(rows, "x string")
    total = sum(dup_groups)
    distinct = len(dup_groups)
    once = sum(1 for c in dup_groups if c == 1)

    res = run_metric(spark, df, Check("c").validates_distinctness(
        "x", Assertion.between(0, 1)))
    assert res.metric == pytest.approx(distinct / total, abs=1e-12)

    res = run_metric(spark, df, Check("c").validates_unique_value_ratio(
        "x", Assertion.between(0, 1)))
    assert res.metric == pytest.approx(once / total, abs=1e-12)


@given(values=st.lists(st.integers(-1000, 1000), min_size=1, max_size=60))
@SET
def test_multi_constraint_consistency(spark, values):
    """All metrics from ONE fused pass must equal independently computed
    values — the scan-sharing must not cross-contaminate metrics."""
    df = spark.createDataFrame([(float(v),) for v in values], "x double")
    n = len(values)
    check = (Check("c", Level.ERROR)
             .has_size(Assertion.eq(n))
             .has_min("x", Assertion.eq(min(values)))
             .has_max("x", Assertion.eq(max(values)))
             .has_sum("x", Assertion.eq(float(sum(values))))
             .has_mean("x", Assertion.custom(
                 lambda m, e=sum(values) / n: math.isclose(m, e, rel_tol=1e-9,
                                                           abs_tol=1e-9),
                 "mean matches"))
             .satisfies("x >= 0", Assertion.eq(
                 sum(1 for v in values if v >= 0) / n)))
    result = ValidationSuite.builder("prop").with_check(check).run(spark, df)
    assert result.passed, result.report.to_json(2)
    assert result.report.num_spark_jobs == 1


# ---------------------------------------------------------------------------
# Quantile-sketch merge error bound (kll_sketch.rs:161-166 posture):
# merged per-partition states must land within the analyzer's stated
# eps = 2/k + 1/accuracy normalized rank error of the exact quantile.
# The per-slice grids here are built exactly in Python (accuracy -> inf),
# isolating the merge algebra; the Spark end-to-end path is covered in
# tests/test_quantile_grouped.py::test_quantile_sketch_error_bound.
# ---------------------------------------------------------------------------

def _exact_grid(values, k):
    """Exact equi-depth stratum-midpoint grid (what percentile_approx
    produces as accuracy -> inf): grid[j] = quantile((j+0.5)/k)."""
    s = sorted(values)
    n = len(s)
    return [s[min(int((j + 0.5) / k * n), n - 1)] for j in range(k)]


def _rank_error(union_sorted, estimate, q):
    """Normalized distance from q of the estimate's rank interval."""
    import bisect as _b
    n = len(union_sorted)
    lo = _b.bisect_left(union_sorted, estimate) / n
    hi = _b.bisect_right(union_sorted, estimate) / n
    if lo <= q <= hi:
        return 0.0
    return min(abs(q - lo), abs(q - hi))


@given(slices=st.lists(
    st.lists(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False,
                       allow_infinity=False),
             min_size=1, max_size=120),
    min_size=1, max_size=5),
    q=st.sampled_from([0.05, 0.25, 0.5, 0.75, 0.95]))
@SET
def test_quantile_merge_error_bound(slices, q):
    from term_spark.analyzers.base import AnalyzerState
    from term_spark.analyzers.quantile_sketch import QuantileSketchAnalyzer

    k = 50
    an = QuantileSketchAnalyzer("x", k=k)
    states = [AnalyzerState(n=len(sl), mn=min(sl), mx=max(sl),
                            grid=_exact_grid(sl, k))
              for sl in slices]
    merged = an.merge_states(states)
    union = sorted(v for sl in slices for v in sl)
    assert merged["n"] == len(union)
    est = an.quantile_from_state(merged, q)
    # grid build quantizes each slice to ceil-rank atoms: one extra
    # element of slack per slice on top of the analytical bound
    eps = 2.0 / k + (len(slices) + 1) / len(union)
    assert _rank_error(union, est, q) <= eps, (q, est, eps)


@given(
    left=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 50)),
                  min_size=1, max_size=15),
    right=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 50)),
                   min_size=1, max_size=15),
)
@SET
def test_asof_join_matches_pandas_merge_asof(spark, left, right):
    """asof_join == pandas merge_asof(by=key, direction='backward')
    on random key/timestamp layouts, including ties and no-match rows."""
    import pandas as pd

    from term_spark.operators.temporal import asof_join

    # dedupe right on (key, ts): merge_asof picks the LAST among equal
    # timestamps, the union idiom the last in window order — make the
    # match unambiguous the same way the contract query does
    right_dd = {}
    for k, t in right:
        right_dd[(k, t)] = max(right_dd.get((k, t), -1), k * 1000 + t)
    rrows = [(k, float(t), v) for (k, t), v in sorted(right_dd.items())]
    lrows = [(i, k, float(t)) for i, (k, t) in enumerate(left)]

    ldf = spark.createDataFrame(lrows, "row_id long, k long, t double")
    rdf = spark.createDataFrame(rrows, "k long, t double, payload long")
    got = {r["row_id"]: r["payload_r"]
           for r in asof_join(ldf, rdf, on="k", left_ts="t",
                              right_ts="t").collect()}

    lp = pd.DataFrame(lrows, columns=["row_id", "k", "t"]).sort_values("t",
                                                                       kind="stable")
    rp = pd.DataFrame(rrows, columns=["k", "t", "payload"]).sort_values("t",
                                                                        kind="stable")
    merged = pd.merge_asof(lp, rp, on="t", by="k", direction="backward")
    for _, row in merged.iterrows():
        expect = None if pd.isna(row["payload"]) else int(row["payload"])
        assert got[int(row["row_id"])] == expect, (row["row_id"], dict(row))


@given(pans=st.lists(st.integers(10**14, 10**16 - 1), min_size=1, max_size=25))
@SET
def test_luhn_column_matches_python(spark, pans):
    """JVM-side Luhn (split/reverse/transform/aggregate) vs an
    independent Python implementation over random 15/16-digit runs."""
    import pyspark.sql.functions as F
    from term_spark.operators.pii import luhn_valid

    def luhn_py(s: str) -> bool:
        total = 0
        for i, ch in enumerate(reversed(s)):
            d = int(ch)
            if i % 2 == 1:
                d *= 2
                if d > 9:
                    d -= 9
            total += d
        return total % 10 == 0

    rows = [(i, str(p)) for i, p in enumerate(pans)]
    df = spark.createDataFrame(rows, "id long, pan string")
    got = {r["id"]: r["ok"]
           for r in df.select("id", luhn_valid(F.col("pan")).alias("ok")).collect()}
    expect = {i: luhn_py(s) for i, s in rows}
    assert got == expect


def _py_ks(ref, cur):
    """Independent exact two-sample KS over pooled distinct values."""
    keys = sorted(set(ref) | set(cur))
    best = 0.0
    cr = cc = 0
    for k in keys:
        cr += sum(1 for v in ref if v == k)
        cc += sum(1 for v in cur if v == k)
        best = max(best, abs(cr / len(ref) - cc / len(cur)))
    return best


@given(ref=st.lists(st.integers(min_value=-20, max_value=20),
                    min_size=1, max_size=40),
       cur=st.lists(st.integers(min_value=-20, max_value=20),
                    min_size=1, max_size=40))
@SET
def test_ks_statistic_matches_python(spark, ref, cur):
    from term_spark.operators.drift import ks_statistic
    rdf = spark.createDataFrame([(float(v),) for v in ref], "v double")
    cdf = spark.createDataFrame([(float(v),) for v in cur], "v double")
    row = ks_statistic(rdf, cdf, "v").collect()[0]
    assert row["ks"] == pytest.approx(_py_ks(ref, cur), abs=1e-6)


@given(texts=st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
             min_size=1, max_size=4).map("\n".join),
    min_size=1, max_size=12))
@SET
def test_dedup_lines_matches_python(spark, texts):
    from collections import Counter

    from term_spark.operators.text import dedup_lines
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    freq = Counter(line for t in texts for line in t.split("\n"))
    expected = {i: "\n".join(l for l in t.split("\n") if freq[l] < 2)
                for i, t in enumerate(texts)}
    expected = {i: t for i, t in expected.items() if t}
    cleaned, _ = dedup_lines(df)
    got = {r["doc_id"]: r["text"] for r in cleaned.collect()}
    assert got == expected


@given(budget=st.integers(min_value=1, max_value=30),
       sizes=st.lists(st.integers(min_value=1, max_value=8),
                      min_size=1, max_size=15))
@SET
def test_token_budget_matches_python(spark, budget, sizes):
    import hashlib

    from term_spark.operators.curation import token_budget_sample
    rows = [(i, " ".join(["w"] * n), "s") for i, n in enumerate(sizes)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    order = sorted(range(len(sizes)),
                   key=lambda i: (hashlib.md5(f"term:{i}".encode()).hexdigest(), i))
    kept, cum = set(), 0
    for i in order:
        cum += sizes[i]
        if cum > budget:
            break
        kept.add(i)
    got = {r["doc_id"] for r in
           token_budget_sample(df, budget, by="source").collect()}
    assert got == kept


@given(payload=st.binary(max_size=256))
@settings(max_examples=300, deadline=None)
def test_parse_image_header_total_on_arbitrary_bytes(payload):
    """The stdlib header codec is TOTAL: any byte string — empty,
    truncated signatures, corrupt JPEG marker streams, random noise —
    returns None or a well-formed dict, never raises (at corpus scale
    corrupt payloads are data, not exceptions)."""
    from term_spark.operators.multimodal import parse_image_header
    out = parse_image_header(payload)
    if out is not None:
        assert set(out) == {"mime", "width", "height", "depth"}
        assert out["mime"] in ("image/png", "image/jpeg", "image/gif")
        for k in ("width", "height"):
            assert out[k] is None or 0 <= out[k] <= 0xFFFFFFFF


@given(prefix=st.sampled_from([b"\xff\xd8", b"\x89PNG\r\n\x1a\n",
                               b"GIF89a", b"GIF87a"]),
       tail=st.binary(max_size=64))
@settings(max_examples=200, deadline=None)
def test_parse_image_header_recognized_signatures_keep_mime(prefix, tail):
    """A recognized signature always yields its mime, however corrupt
    the rest of the stream — degradation is 'truncated' (NULL dims),
    never a crash or a misdetected format."""
    from term_spark.operators.multimodal import parse_image_header
    out = parse_image_header(prefix + tail)
    assert out is not None
    expected = {b"\xff\xd8": "image/jpeg", b"\x89PNG\r\n\x1a\n": "image/png",
                b"GIF89a": "image/gif", b"GIF87a": "image/gif"}[prefix]
    assert out["mime"] == expected


@given(payload=st.binary(max_size=256))
@settings(max_examples=300, deadline=None)
def test_parse_media_header_total_on_arbitrary_bytes(payload):
    """The unified media codec (images + WAV + MP4) is TOTAL like the
    image one: any byte string returns None or a well-formed facet
    dict, never raises."""
    from term_spark.operators.multimodal import parse_media_header
    out = parse_media_header(payload)
    if out is not None:
        assert set(out) == {"mime", "width", "height", "depth",
                            "duration_ms", "sample_rate", "channels"}
        assert out["mime"] in ("image/png", "image/jpeg", "image/gif",
                               "audio/wav", "video/mp4")
        for k in ("width", "height", "duration_ms", "sample_rate",
                  "channels"):
            assert out[k] is None or out[k] >= 0


@given(sig=st.sampled_from([b"RIFF\x00\x00\x00\x00WAVE",
                            b"\x00\x00\x00\x10ftypisom"]),
       tail=st.binary(max_size=96))
@settings(max_examples=200, deadline=None)
def test_parse_media_header_av_signatures_keep_mime(sig, tail):
    """Recognized WAV/MP4 signatures always yield their mime; corrupt
    chunk/box streams degrade to NULL facets, never crash or switch
    format."""
    from term_spark.operators.multimodal import parse_media_header
    out = parse_media_header(sig + tail)
    assert out is not None
    expected = "audio/wav" if sig.startswith(b"RIFF") else "video/mp4"
    assert out["mime"] == expected


def test_parse_wav_rejects_undersized_fmt_chunk():
    """A corrupt fmt chunk DECLARING size < 16 must not have its
    16-byte field block unpacked — the bytes after the short payload
    belong to the NEXT chunk, and reading them would surface garbage
    sample_rate/channels as a plausible header (the WAV sibling of the
    JPEG seg_len < 2 guard)."""
    import struct

    from term_spark.operators.multimodal import _parse_wav

    # fmt declares 4 payload bytes, then a data chunk whose header
    # bytes would be misread as fmt fields if the guard were missing
    fmt_short = b"fmt " + struct.pack("<I", 4) + b"\x01\x00\x02\x00"
    data = b"data" + struct.pack("<I", 64000)
    b = b"RIFF" + struct.pack("<I", 36) + b"WAVE" + fmt_short + data
    out = _parse_wav(b)
    assert out is not None and out["mime"] == "audio/wav"
    assert out["sample_rate"] is None
    assert out["channels"] is None
    assert out["depth"] is None

    # a WELL-formed fmt (size 16) still parses
    fmt_ok = b"fmt " + struct.pack("<I", 16) + struct.pack(
        "<HHIIHH", 1, 2, 16000, 64000, 4, 16)
    good = b"RIFF" + struct.pack("<I", 48) + b"WAVE" + fmt_ok + data
    ok = _parse_wav(good)
    assert ok["channels"] == 2 and ok["sample_rate"] == 16000
    assert ok["duration_ms"] == 1000


@given(values=st.lists(st.floats(min_value=-1e5, max_value=1e5,
                                 allow_nan=False, allow_infinity=False),
                       min_size=8, max_size=60),
       k=st.integers(2, 6))
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_equidepth_partitions_every_row_exactly_once(spark, values, k):
    """Property (round 13): equi-depth buckets partition the data —
    counts sum to n, no row lost to an edge, depths are rank-balanced
    (each ≤ ceil(n/k) + ties' slack — with heavy ties a bucket can
    legitimately hold more, so we only pin the partition property and
    monotone edges)."""
    from term_spark.operators.histogram import equidepth_histogram
    df = spark.createDataFrame([(float(v),) for v in values], "v double")
    rows = equidepth_histogram(df, "v", buckets=k).collect()
    assert sum(r["n"] for r in rows) == len(values)
    los = [r["lo"] for r in rows]
    his = [r["hi"] for r in rows]
    assert los == sorted(los) and his == sorted(his)
    assert all(r["hi"] >= r["lo"] for r in rows)
    assert min(los) == min(values) and max(his) == max(values)


@given(names=st.lists(
    st.sampled_from(["acme corp", "acmee corp", "acm corp", "zen corp",
                     "acme labs", "solo ring"]),
    min_size=1, max_size=40))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_fuzzy_canonicalize_is_total_and_count_preserving(spark, names):
    """Property (round 13): canonicalization maps EVERY distinct value
    exactly once, preserves the row-count mass, and every canonical is
    itself a dictionary value whose count equals canonical_n."""
    from term_spark.operators.fuzzy import fuzzy_canonicalize
    df = spark.createDataFrame([(n,) for n in names], "v string")
    rows = fuzzy_canonicalize(df, "v", max_distance=2).collect()
    from collections import Counter
    counts = Counter(names)
    assert {r["name"] for r in rows} == set(counts)
    assert sum(r["n"] for r in rows) == len(names)
    for r in rows:
        assert r["n"] == counts[r["name"]]
        assert r["canonical"] in counts
        assert r["canonical_n"] == counts[r["canonical"]]
        # the elected canonical is never lighter than the name itself
        assert r["canonical_n"] >= r["n"] or r["canonical"] == r["name"]
