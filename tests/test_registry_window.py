"""Registry-ordering invariants for the driver's correctness gate.

The driver checks only the FIRST 50 entries of ``queries()`` against the
DuckDB oracles.  Round 4 shipped 12 operator families outside that window
(local parity only); this test pins the fix so new registrations cannot
silently push an operator family back out.
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
    "spearman_quantity_price", "corr_quantity_price",
    "quantile_exact_quantity", "numeric_histogram_quantity",
    "profile_customer", "grouped_stats_mktsegment",
    # multi-table (temporal_ordering demoted round 5: no distinct family
    # row of its own; fk/join_coverage/cross_table keep the family green)
    "fk_orders_customer", "join_coverage_lineitem_orders",
    "cross_table_sum_orders_lineitem",
    # temporal / windows / reshape
    "business_hours_events", "max_time_gap_events", "sessionize_events",
    "asof_click_error", "range_join_events", "rolling_daily_events",
    "top_customers_revenue", "top3_customers_per_segment",
    "pivot_returnflag_linestatus", "unpivot_pricing", "rollup_pricing",
    "median_by_returnflag", "pricing_summary",
    # drift / distribution
    "benford_acctbal", "drift_psi_quantity",
    # round-5 promotion: line-level dedup is a new dedup-family row
    "line_dedup_summary_docs",
    # LLM data pipeline
    "dedup_exact_docs", "ngram_jaccard_pairs", "minhash_lsh_candidates",
    "simhash_near_pairs", "cosine_topk_embeddings", "neardup_components",
    "split_counts_docs", "repetition_docs", "packing_stats_docs",
    "semantic_dedup_embeddings", "source_mixing_docs", "text_quality",
}


def test_every_family_inside_driver_window():
    window = set(list(QUERIES)[:WINDOW])
    missing = FAMILY_REPRESENTATIVES - window
    assert not missing, f"operator families outside driver window: {sorted(missing)}"


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
    assert len(QUERIES) >= 62
    for k in tail:
        assert callable(QUERIES[k])
        if k != "approx_distinct_orderkey":
            assert k in ORACLES, k
