"""Registry-ordering invariants for the driver's correctness gate.

The driver checks only the FIRST 50 entries of ``queries()`` against the
DuckDB oracles.  Round 4 shipped 12 operator families outside that window
(local parity only); round 5 added ten new families that landed at
registry positions 50-59 (again outside).  Round 6 institutes a
ROTATION POLICY, which this test pins:

* a query with TWO consecutive green driver rows (r04+r05 in
  CORRECTNESS_r0{4,5}.json) whose family keeps another in-window
  representative rotates to the tail;
* its freed slot goes to a family that has never had a driver row;
* every family retains at least one driver-green row in the rolling
  r04–r06 record (either it stays in-window, or it rotated out with a
  double-green history AND a same-family query remains in-window).

Extend ``FAMILY_REPRESENTATIVES`` when a new family lands; demote only
double-green queries when the registry outgrows the window.
"""

from term_spark.queries import ORACLES, QUERIES

WINDOW = 50

# One representative query per operator family that MUST sit inside the
# driver's correctness window.  Extend this list when a new family lands.
FAMILY_REPRESENTATIVES = {
    # core analyzers
    "size_lineitem", "completeness_customer", "stats_quantity",
    "distinctness_orders", "unique_value_ratio_custkey",
    "compliance_discount", "format_orderpriority", "length_customer_name",
    "datatype_detection", "histogram_returnflag", "entropy_returnflag",
    "grouped_completeness_events", "mutual_information_lineitem",
    "corr_quantity_price", "quantile_exact_quantity", "profile_customer",
    # multi-table
    "fk_orders_customer", "join_coverage_lineitem_orders",
    "cross_table_sum_orders_lineitem",
    # temporal / windows / reshape
    "max_time_gap_events", "sessionize_events",
    "asof_click_error", "range_join_events", "rolling_daily_events",
    "top_customers_revenue", "top3_customers_per_segment",
    "pivot_returnflag_linestatus", "unpivot_pricing", "rollup_pricing",
    "median_by_returnflag", "pricing_summary",
    # drift / distribution (round-5 drift companions promoted round 6)
    "benford_acctbal", "drift_psi_quantity", "drift_ks_quantity",
    "drift_chi2_returnflag", "drift_js_quantity", "drift_psi_by_returnflag",
    # robust outliers / snapshot gates (round-5, promoted round 6)
    "outlier_mad_acctbal", "dominant_value_orderstatus",
    # LLM data pipeline
    "dedup_exact_docs", "ngram_jaccard_pairs", "minhash_lsh_candidates",
    "cosine_topk_embeddings", "semantic_dedup_embeddings",
    "line_dedup_summary_docs", "packing_stats_docs",
    # round-5 curation/text stages promoted round 6
    "token_budget_sample_docs", "text_cleaning_docs", "quality_model_docs",
    "unigram_surprisal_docs",
}

# Rotated out in round 6 under the double-green policy: each had green
# rows in BOTH CORRECTNESS_r04 and r05, and each family keeps an
# in-window representative (or gained round-5 members that are now in).
ROTATED_OUT_R6 = {
    "text_quality", "repetition_docs", "source_mixing_docs",
    "split_counts_docs", "neardup_components", "simhash_near_pairs",
    "business_hours_events", "spearman_quantity_price",
    "numeric_histogram_quantity", "grouped_stats_mktsegment",
}


def test_every_family_inside_driver_window():
    window = set(list(QUERIES)[:WINDOW])
    missing = FAMILY_REPRESENTATIVES - window
    assert not missing, f"operator families outside driver window: {sorted(missing)}"


def test_round5_families_promoted():
    # The ten round-5 families that had no driver row through r05 must
    # now be inside the window (VERDICT r05 next-round item #2).
    window = set(list(QUERIES)[:WINDOW])
    promoted = {
        "drift_ks_quantity", "drift_chi2_returnflag", "drift_js_quantity",
        "drift_psi_by_returnflag", "token_budget_sample_docs",
        "text_cleaning_docs", "outlier_mad_acctbal",
        "dominant_value_orderstatus", "quality_model_docs",
        "unigram_surprisal_docs",
    }
    assert promoted <= window, f"missing: {sorted(promoted - window)}"


def test_rotated_out_queries_left_the_window():
    window = set(list(QUERIES)[:WINDOW])
    still_in = ROTATED_OUT_R6 & window
    assert not still_in, f"rotated-out queries still in window: {sorted(still_in)}"


def test_window_is_fully_oracle_backed():
    # Every in-window query must have a DuckDB oracle so the driver records
    # a full rows+schema+hash row (not a weaker rows-only check).
    window = list(QUERIES)[:WINDOW]
    unbacked = [k for k in window if k not in ORACLES]
    assert not unbacked, f"in-window queries without oracles: {unbacked}"


def test_tail_queries_still_registered():
    # Demoted ≠ dropped: tail variants stay runnable and oracle-backed
    # (except approx_distinct_orderkey, rows-only by design).
    tail = list(QUERIES)[WINDOW:]
    assert len(QUERIES) >= 70
    for k in tail:
        assert callable(QUERIES[k])
        if k != "approx_distinct_orderkey":
            assert k in ORACLES, k
