"""Benchmark harness: headline = a 20-constraint validation suite over
lineitem at $SPARK_GRAFT_SF_DIR (default sf0.1, ~600k rows), executed as
the engine's fused scan-sharing plan (1 Spark job for all scalar
metrics). Mirrors BASELINE.md's "1M rows × 20 constraints" workload.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _wait_for_quiet(threshold: float = 2.0, threshold_5m: float = 3.0,
                    cap_sec: float = 150.0) -> dict:
    """Block until BOTH the 1-minute loadavg drops below ``threshold``
    and the 5-minute loadavg below ``threshold_5m`` (cap ``cap_sec``),
    so the headline numbers are taken on a quiet machine.

    Round-2 and round-4 both recorded headline samples under leftover
    load (pytest/driver runs just before) that the artifact's own stamp
    exposed; the stamp alone doesn't prevent it.  Round 5 measured why
    the 1-minute gate alone is not enough: with load1 at 1.86 but
    load5 near 3 (a 32-thread Spark job had JUST exited), every
    CPU-heavy query read 2-3× slow (minhash 5.75 s vs 1.54 s clean) —
    the 1-minute average decays past the gate while real contention is
    still draining.  Returns the quiet-gate outcome: the loadavgs the
    measurement actually started under, how long we waited, and
    ``contended`` when the cap expired first — a self-identifying
    artifact either way.

    The cap must outlast the 1-minute EWMA's decay: falling from
    loadavg 8 (a just-finished test suite) to 2 on an idle box takes
    ~60·ln(4) ≈ 83 s, so a 60 s cap would mark honest runs contended.
    The 5-minute EWMA decays slower, so a heavy just-exited job can
    exhaust the cap — that run is then marked contended, which is the
    correct verdict for it.
    """
    t0 = time.monotonic()
    load1, load5, _ = os.getloadavg()
    while ((load1 >= threshold or load5 >= threshold_5m)
           and time.monotonic() - t0 < cap_sec):
        time.sleep(2.0)
        load1, load5, _ = os.getloadavg()
    waited = time.monotonic() - t0
    contended = load1 >= threshold or load5 >= threshold_5m
    if contended:
        print(f"bench: WARNING loadavg {load1:.2f}/{load5:.2f} (1m/5m) still "
              f">= {threshold}/{threshold_5m} after {waited:.0f}s wait — "
              "numbers marked contended", file=sys.stderr)
    return {"loadavg_1m": round(load1, 2), "loadavg_5m": round(load5, 2),
            "quiet_wait_sec": round(waited, 1), "contended": contended}


def _count_java_procs() -> int:
    """Java processes currently alive (incl. our own driver JVM).

    Any value > 1 during the measured window means a concurrent Spark
    JVM is contending for the same cores and every number is suspect
    (round-2's 2x artifact inflation).  Stamped into the payload so a
    contaminated run is self-identifying.
    """
    n = 0
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/comm") as f:
                if f.read().strip() == "java":
                    n += 1
        except OSError:
            continue
    return n


def build_suite():
    from term_spark import Assertion, Check, Level, ValidationSuite

    check = (Check("lineitem_20", Level.ERROR)
             .has_size(Assertion.gt(0))
             .is_complete("l_orderkey").is_complete("l_partkey")
             .is_complete("l_suppkey").is_complete("l_quantity")
             .has_min("l_quantity", Assertion.ge(1))
             .has_max("l_quantity", Assertion.le(50))
             .has_mean("l_quantity", Assertion.between(20, 30))
             .has_sum("l_extendedprice", Assertion.gt(0))
             .has_standard_deviation("l_quantity", Assertion.gt(0))
             .has_variance("l_quantity", Assertion.gt(0))
             .value_range("l_discount", 0.0, 0.1)
             .is_contained_in("l_returnflag", ["R", "A", "N"])
             .is_contained_in("l_linestatus", ["O", "F"])
             .satisfies("l_extendedprice >= 0", 1.0)
             .satisfies("l_tax >= 0", 1.0)
             .uniqueness(["l_orderkey", "l_linenumber"], 0.5)
             .has_approx_count_distinct("l_orderkey", Assertion.gt(100))
             .has_approx_quantile("l_quantity", 0.5, Assertion.between(20, 30))
             .has_correlation("l_quantity", "l_extendedprice",
                              Assertion.between(-1, 1)))
    return check


def main() -> None:
    from term_spark import ValidationSuite
    from term_spark.queries import QUERIES
    from term_spark.session import get_spark
    from term_spark.sources import read_parquet

    # quiet-gate BEFORE the JVM exists: from here on our own 32-thread
    # stages dominate loadavg, so this is the only honest sample point
    quiet = _wait_for_quiet()

    spark = get_spark("term_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    lineitem = read_parquet(spark, f"{SF_DIR}/lineitem.parquet")
    lineitem.count()  # warm: file listing, footer reads, JIT

    suite = ValidationSuite.builder("bench_suite").with_check(build_suite())
    jvm_gc = spark.sparkContext._jvm.System.gc

    # steady-state: warm-up run, then best-of-2 with forced GC — the
    # SAME discipline as every per-query number below.  A single un-GC'd
    # sample in a long-lived 32-thread JVM can carry 2x GC debt from the
    # warm-up and misrepresent the engine (round-2 lesson).
    suite.run(spark, lineitem)
    suite_sec = float("inf")
    for _ in range(3):  # headline gets one extra sample — it IS the metric
        jvm_gc()
        t0 = time.perf_counter()
        result = suite.run(spark, lineitem)
        suite_sec = min(suite_sec, time.perf_counter() - t0)
        assert result.passed, result.report.to_json()

    per_query = {"suite_20_constraints": round(suite_sec, 4)}

    bench_queries = [
        "pricing_summary", "stats_quantity", "histogram_returnflag",
        "entropy_returnflag", "unique_value_ratio_custkey",
        "fk_orders_customer", "join_coverage_lineitem_orders",
        "cross_table_sum_orders_lineitem", "max_time_gap_events",
        "corr_quantity_price", "mutual_information_lineitem",
        "sessionize_events", "top_customers_revenue",
        # LLM-data operators over documents/embeddings
        "dedup_exact_docs", "ngram_jaccard_pairs", "minhash_lsh_candidates",
        "simhash_docs", "cosine_topk_embeddings",
        # round-4 curation additions
        "repetition_docs", "packing_stats_docs", "semantic_dedup_embeddings",
        "source_mixing_docs",
        # round-4 window/reshape/drift family (regressions here were
        # invisible to BENCH_r04 — judge ask #8)
        "asof_click_error", "range_join_events", "rolling_daily_events",
        "pivot_returnflag_linestatus", "top3_customers_per_segment",
        "unpivot_pricing", "rollup_pricing", "median_by_returnflag",
        "benford_acctbal", "drift_psi_quantity",
        # round-5 additions: drift companions, curation stages, robust
        # outliers, snapshot gates
        "drift_ks_quantity", "drift_chi2_returnflag", "drift_js_quantity",
        "line_dedup_summary_docs", "token_budget_sample_docs",
        "text_cleaning_docs", "outlier_mad_acctbal",
        "dominant_value_orderstatus", "drift_psi_by_returnflag",
        "quality_model_docs", "unigram_surprisal_docs",
    ]
    for name in bench_queries:
        fn = QUERIES[name]
        fn(spark, SF_DIR).collect()  # warm (codegen compile, JIT)
        # steady-state = best of 2: a single sample in a long-lived
        # 32-thread JVM carries GC debt from whichever query ran before
        best = float("inf")
        for _ in range(2):
            jvm_gc()
            t0 = time.perf_counter()
            fn(spark, SF_DIR).collect()
            best = min(best, time.perf_counter() - t0)
        per_query[name] = round(best, 4)

    sf = 0.1
    if "sf" in SF_DIR:
        try:
            sf = float(SF_DIR.rstrip("/").split("sf")[-1])
        except ValueError:
            pass

    other_jvms = _count_java_procs() - 1  # minus our own driver JVM
    if other_jvms > 0:
        print(f"bench: WARNING {other_jvms} concurrent JVM(s) detected — "
              "numbers are contaminated; rerun alone", file=sys.stderr)
    payload = {
        "metric": "suite_20_constraints_wall_sec",
        "value": round(suite_sec, 4),
        "unit": "sec",
        "queries": per_query,
        "sf": sf,
        "env": {
            # loadavg at the quiet-gate (pre-JVM): the machine state the
            # measurements actually started under — sampling here at the
            # END would mostly measure our own finished stages
            **quiet,
            "other_jvms": other_jvms,
        },
    }

    # sf1 crossover point (BASELINE.md extrapolation): generated once by
    # scripts/make_sf1.py; measured only when present so the default
    # bench stays fast.
    sf1_dir = os.environ.get(
        "SPARK_GRAFT_SF1_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "benchdata", "sf1"))
    if os.path.isdir(sf1_dir):
        li1 = read_parquet(spark, f"{sf1_dir}/lineitem.parquet")
        li1.count()
        suite.run(spark, li1)  # warm
        best = float("inf")
        for _ in range(3):  # headline crossover point — extra sample
            jvm_gc()
            t0 = time.perf_counter()
            result1 = suite.run(spark, li1)
            best = min(best, time.perf_counter() - t0)
            assert result1.passed, result1.report.to_json()
        sf1 = {"suite_20_constraints": round(best, 4)}
        # dedup scale point (50k docs): the numbers COVERAGE.md cites
        # must live in the bench artifact, not prose.
        for name in ("pricing_summary", "cross_table_sum_orders_lineitem",
                     "fk_orders_customer", "join_coverage_lineitem_orders",
                     "unique_value_ratio_custkey", "max_time_gap_events",
                     "dedup_exact_docs", "minhash_lsh_candidates",
                     # round-4 window/reshape/drift scale points: the
                     # partition-parallel window and bins-bounded drift
                     # shapes must show the same flat 10x slope
                     "asof_click_error", "rolling_daily_events",
                     "pivot_returnflag_linestatus", "drift_psi_quantity",
                     "top3_customers_per_segment",
                     # round-5 scale points: KS's distributed prefix-sum
                     # and line dedup's explode+join must hold the slope
                     "drift_ks_quantity", "line_dedup_summary_docs",
                     "outlier_mad_acctbal"):
            fn = QUERIES[name]
            fn(spark, sf1_dir).collect()  # warm
            best = float("inf")
            for _ in range(2):
                jvm_gc()
                t0 = time.perf_counter()
                fn(spark, sf1_dir).collect()
                best = min(best, time.perf_counter() - t0)
            sf1[name] = round(best, 4)
        payload["sf1"] = sf1

    print(json.dumps(payload))


if __name__ == "__main__":
    main()
