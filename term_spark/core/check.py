"""Check — named group of constraints with a severity level, plus the
fluent builder API.

Parity: /root/reference/term-guard/src/core/check.rs:146-156 (model) and
the ~60 builder methods grepped at check.rs:321-2305 plus
builder_extensions.rs (CompletenessOptions:14, StatisticalOptions:85,
statistics():203, primary_key:276, email:309, url:335, phone:361,
contains_ssn:399, value_range:423). Method names port snake_case →
snake_case almost verbatim (SURVEY §2.12).
"""

from __future__ import annotations

from typing import Callable, List, Mapping, Optional, Sequence

from ..operators.completeness import (CompletenessConstraint,
                                      MultiColumnCompletenessConstraint)
from ..operators.compliance import (ContainmentConstraint, SatisfiesConstraint,
                                    ValueRangeConstraint)
from ..operators.datatype import (ConsistentDataTypeConstraint,
                                  DataTypeDistributionConstraint)
from ..operators.entropy import (EntropyConstraint, MutualInformationConstraint,
                                 SpearmanConstraint)
from ..operators.format import FormatConstraint, FormatOptions
from ..operators.grouped import GroupedCompletenessConstraint, GroupingConfig
from ..operators.histogram import HistogramConstraint
from ..operators.length import LengthConstraint
from ..operators.multitable import (CrossTableSumConstraint, ForeignKeyConstraint,
                                    JoinCoverageConstraint)
from ..operators.size import ColumnCountConstraint, SizeConstraint
from ..operators.statistics import (ApproxCountDistinctConstraint,
                                    CorrelationConstraint, CovarianceConstraint,
                                    MultiStatisticConstraint, QuantileConstraint,
                                    StatisticConstraint)
from ..operators.temporal import (BusinessHoursConstraint, DateRangeConstraint,
                                  MaxTimeGapConstraint, TemporalOrderingConstraint)
from ..operators.uniqueness import UniquenessConstraint, UniqueValueRatioConstraint
from .assertion import Assertion
from .constraint import Constraint
from .level import DEFAULT_LEVEL, Level
from .logical import LogicalOperator


class Check:
    def __init__(self, name: str, level: Level = DEFAULT_LEVEL,
                 table: Optional[str] = None, description: str = "",
                 where: Optional[str] = None):
        from ..functions.security import validate_sql_expression

        self.name = name
        self.level = level
        self.table = table  # None → suite default table
        self.description = description
        # row-scope filter: constraints validate only matching rows; the
        # executor fuses per (table, where) pair — the reference
        # optimizer's grouping key (optimizer/combiner.rs:34-143,
        # predicate pushdown at optimizer/executor.rs:195-232). Catalyst
        # pushes the filter into the scan.
        self.where = validate_sql_expression(where) if where else None
        self.constraints: List[Constraint] = []

    # ---- generic ----------------------------------------------------
    def with_constraint(self, constraint: Constraint) -> "Check":
        self.constraints.append(constraint)
        return self

    def where_rows(self, predicate: str) -> "Check":
        from ..functions.security import validate_sql_expression

        self.where = validate_sql_expression(predicate)
        return self

    def build(self) -> "Check":  # fluent terminator, parity with check.rs:2305
        return self

    # ---- size / schema ----------------------------------------------
    def has_size(self, assertion) -> "Check":
        return self.with_constraint(SizeConstraint(Assertion.coerce(assertion)))

    def has_column_count(self, assertion) -> "Check":
        return self.with_constraint(ColumnCountConstraint(Assertion.coerce(assertion)))

    # ---- completeness -----------------------------------------------
    def is_complete(self, column: str) -> "Check":
        return self.with_constraint(CompletenessConstraint(column))

    def completeness(self, column: str, assertion) -> "Check":
        return self.with_constraint(CompletenessConstraint(column, Assertion.coerce(assertion)))

    has_completeness = completeness

    def any_complete(self, columns: Sequence[str]) -> "Check":
        return self.with_constraint(
            MultiColumnCompletenessConstraint(list(columns), LogicalOperator.any()))

    def at_least_complete(self, columns: Sequence[str], n: int) -> "Check":
        return self.with_constraint(
            MultiColumnCompletenessConstraint(list(columns), LogicalOperator.at_least(n)))

    def exactly_complete(self, columns: Sequence[str], n: int) -> "Check":
        return self.with_constraint(
            MultiColumnCompletenessConstraint(list(columns), LogicalOperator.exactly(n)))

    def grouped_completeness(self, column: str, group_by, assertion,
                             config: GroupingConfig = GroupingConfig()) -> "Check":
        return self.with_constraint(GroupedCompletenessConstraint(
            column, group_by, Assertion.coerce(assertion), config))

    # ---- uniqueness family -------------------------------------------
    def uniqueness(self, columns, threshold: float = 1.0,
                   strategy: str = "exact", approx_rsd: float = 0.02) -> "Check":
        """``strategy='approx'`` rides HLL++ (±``approx_rsd``, default
        2%) instead of an exact distinct shuffle — opt in when the
        table is large and the threshold tolerates the error."""
        return self.with_constraint(UniquenessConstraint(
            columns, "full", threshold=threshold,
            strategy=strategy, approx_rsd=approx_rsd))

    validates_uniqueness = uniqueness

    def is_unique(self, column: str) -> "Check":
        return self.uniqueness([column] if isinstance(column, str) else column, 1.0)

    def validates_distinctness(self, columns, assertion,
                               strategy: str = "exact",
                               approx_rsd: float = 0.02) -> "Check":
        return self.with_constraint(
            UniquenessConstraint(columns, "distinctness",
                                 Assertion.coerce(assertion),
                                 strategy=strategy, approx_rsd=approx_rsd))

    def validates_unique_value_ratio(self, columns, assertion) -> "Check":
        return self.with_constraint(
            UniqueValueRatioConstraint(columns, Assertion.coerce(assertion)))

    def validates_primary_key(self, *columns) -> "Check":
        return self.with_constraint(UniquenessConstraint(list(columns), "primary_key"))

    primary_key = validates_primary_key

    def validates_uniqueness_with_nulls(self, columns, threshold: float = 1.0,
                                        null_handling: str = "include") -> "Check":
        mode = {"include": "include_nulls", "distinct": "distinct_nulls"}[null_handling]
        return self.with_constraint(UniquenessConstraint(columns, mode, threshold=threshold))

    def has_approx_count_distinct(self, column: str, assertion, rsd: float = 0.05) -> "Check":
        return self.with_constraint(
            ApproxCountDistinctConstraint(column, Assertion.coerce(assertion), rsd))

    # ---- statistics ---------------------------------------------------
    def statistic(self, column: str, stat: str, assertion) -> "Check":
        return self.with_constraint(StatisticConstraint(column, stat, Assertion.coerce(assertion)))

    def has_min(self, column: str, assertion) -> "Check":
        return self.statistic(column, "min", assertion)

    def has_max(self, column: str, assertion) -> "Check":
        return self.statistic(column, "max", assertion)

    def has_mean(self, column: str, assertion) -> "Check":
        return self.statistic(column, "mean", assertion)

    def has_sum(self, column: str, assertion) -> "Check":
        return self.statistic(column, "sum", assertion)

    def has_standard_deviation(self, column: str, assertion) -> "Check":
        return self.statistic(column, "stddev", assertion)

    def has_balanced_keys(self, key_cols,
                          max_key_share: float = 0.05) -> "Check":
        """Join-skew gate: the hottest value of a prospective
        join/groupBy key must own at most ``max_key_share`` of the
        rows — fail the suite before the straggler, then fix with
        plans.skew salting/bucketing."""
        from ..operators.uniqueness import KeySkewConstraint
        return self.with_constraint(KeySkewConstraint(
            key_cols, max_key_share))

    def has_bounded_join_cardinality(self, left_table: str, left_key: str,
                                     right_table: str, right_key: str,
                                     max_rows: float, k: int = 256) -> "Check":
        """Join-explosion pre-flight: sketch both key columns (MG + KMV,
        4 bounded jobs, no join executed) and fail when |left ⋈ right|
        is PROVABLY above ``max_rows`` — the lower bound is one-sided,
        so a failure is a proof and names the keys to salt."""
        from ..operators.multitable import JoinCardinalityConstraint
        return self.with_constraint(JoinCardinalityConstraint(
            left_table, left_key, right_table, right_key, max_rows, k))

    def has_no_heavy_hitters(self, column: str, max_ratio: float = 0.5,
                             k=None) -> "Check":
        """Sketch tier of ``has_balanced_keys`` for columns whose
        distinct count makes the exact groupBy the dominant cost
        (100 TB token/id streams): a k-counter Misra-Gries pass
        (map-only, <= (k+1) rows per partition cross the wire) fails
        the suite when any single value PROVABLY exceeds ``max_ratio``
        of rows. One-sided: no false positives; detection guaranteed
        above max_ratio + 1/(k+1)."""
        from ..analyzers.heavy_hitters import HeavyHitterConstraint
        return self.with_constraint(HeavyHitterConstraint(
            column, max_ratio, k))

    def has_no_heavy_hitters_by(self, group_column: str, column: str,
                                max_ratio: float = 0.5, k=None) -> "Check":
        """Grouped form of ``has_no_heavy_hitters`` (round 11): one
        map-only ``mg_sketch_by`` pass fails the suite when any
        GROUP's single value provably exceeds ``max_ratio`` of that
        group's rows — the per-source/per-language dominance screen
        for streams whose distinct count rules out the exact grouped
        runner. One-sided per group; the message names the offending
        (group, value) pairs."""
        from ..analyzers.heavy_hitters import GroupedHeavyHitterConstraint
        return self.with_constraint(GroupedHeavyHitterConstraint(
            group_column, column, max_ratio, k))

    def has_low_churn(self, ref_df, keys, compare_cols=None,
                      max_changed_ratio: float = 0.2,
                      max_added_ratio: float = 0.2,
                      max_removed_ratio: float = 0.2) -> "Check":
        """Snapshot churn gate: changed/added/removed shares vs a
        reference snapshot must each stay within their caps — catches
        the full-table rewrite a row count alone misses."""
        from ..operators.multitable import DatasetChurnConstraint
        return self.with_constraint(DatasetChurnConstraint(
            ref_df, keys, compare_cols, max_changed_ratio,
            max_added_ratio, max_removed_ratio))

    def has_custom_aggregate(self, expression: str, assertion,
                             description: str = "") -> "Check":
        """Escape hatch: gate any (screened) SQL aggregate expression
        — e.g. ``sum(revenue)/sum(cost)`` — fused into the suite's
        shared single-pass aggregation."""
        from ..operators.statistics import CustomAggregateConstraint
        return self.with_constraint(CustomAggregateConstraint(
            expression, Assertion.coerce(assertion), description))

    def has_skewness(self, column: str, assertion) -> "Check":
        return self.statistic(column, "skewness", assertion)

    def has_kurtosis(self, column: str, assertion) -> "Check":
        return self.statistic(column, "kurtosis", assertion)

    def has_variance(self, column: str, assertion) -> "Check":
        return self.statistic(column, "variance", assertion)

    def statistics(self, column: str, assertions: Mapping[str, object]) -> "Check":
        return self.with_constraint(MultiStatisticConstraint(
            column, {k: Assertion.coerce(v) for k, v in assertions.items()}))

    def has_approx_quantile(self, column: str, q: float, assertion,
                            accuracy: int = 1000) -> "Check":
        """Approximate-quantile gate; ``accuracy`` = inverse rank-error
        bound (default 0.1% — far tighter than the reference KLL's
        ~11.7% at k=200, and 2.6x cheaper per scan than 10000)."""
        return self.with_constraint(
            QuantileConstraint(column, q, Assertion.coerce(assertion),
                               "approx", accuracy=accuracy))

    def has_exact_quantile(self, column: str, q: float, assertion) -> "Check":
        return self.with_constraint(
            QuantileConstraint(column, q, Assertion.coerce(assertion), "exact"))

    def has_quantile(self, column: str, q: float, assertion, mode: str = "auto") -> "Check":
        return self.with_constraint(
            QuantileConstraint(column, q, Assertion.coerce(assertion), mode))

    def has_median(self, column: str, assertion, mode: str = "approx") -> "Check":
        return self.with_constraint(
            QuantileConstraint(column, 0.5, Assertion.coerce(assertion), mode))

    def has_correlation(self, column_a: str, column_b: str, assertion) -> "Check":
        return self.with_constraint(
            CorrelationConstraint(column_a, column_b, Assertion.coerce(assertion)))

    def has_covariance(self, column_a: str, column_b: str, assertion) -> "Check":
        return self.with_constraint(
            CovarianceConstraint(column_a, column_b, Assertion.coerce(assertion)))

    def has_spearman_correlation(self, column_a: str, column_b: str, assertion) -> "Check":
        return self.with_constraint(
            SpearmanConstraint(column_a, column_b, Assertion.coerce(assertion)))

    def has_mutual_information(self, column_a: str, column_b: str, assertion,
                               bins: int = 10) -> "Check":
        return self.with_constraint(
            MutualInformationConstraint(column_a, column_b, Assertion.coerce(assertion), bins))

    def has_entropy(self, column: str, assertion, max_unique: int = 10000) -> "Check":
        return self.with_constraint(
            EntropyConstraint(column, Assertion.coerce(assertion), max_unique))

    def has_benford_distribution(self, column: str, assertion=None) -> "Check":
        """First-digit distribution close to Benford's law (metric =
        total variation distance; default assertion TVD <= 0.05)."""
        from ..operators.statistics import BenfordConstraint
        return self.with_constraint(BenfordConstraint(column, assertion))

    def has_no_pii(self, column: str, kinds=None, max_ratio: float = 0.0) -> "Check":
        """Release gate over a text column: the share of rows containing
        structured PII (emails, phones, SSNs, Luhn-valid card numbers,
        IPs — or the subset in ``kinds``) must not exceed ``max_ratio``.
        Rides the shared fused aggregation (codegen regex, no extra
        scan)."""
        from ..operators.pii import PiiConstraint
        return self.with_constraint(PiiConstraint(column, kinds, max_ratio))

    def has_acceptable_badwords_ratio(self, column: str, terms,
                                      max_ratio: float = 0.0) -> "Check":
        """C4-style blocklist gate: the share of rows whose text
        contains a whole-word blocklisted term (case-insensitive, one
        compiled alternation — no join, no per-term passes) must not
        exceed ``max_ratio``. Rides the shared fused aggregation."""
        from ..operators.pii import BadwordsConstraint
        return self.with_constraint(
            BadwordsConstraint(column, terms, max_ratio))

    def has_no_blocked_domains(self, column: str, blocked_domains,
                               max_ratio: float = 0.0,
                               match_subdomains: bool = True) -> "Check":
        """Web-curation gate: the share of rows citing a URL on a
        blocked domain (or subdomain) must not exceed ``max_ratio``.
        Pure JVM expression (regex extract + array exists), rides the
        shared fused aggregation; ``pii.blocklist_filter`` is the
        dropping twin."""
        from ..operators.pii import BlockedDomainsConstraint
        return self.with_constraint(BlockedDomainsConstraint(
            column, blocked_domains, max_ratio, match_subdomains))

    def has_stable_distribution(self, ref_df, column: str,
                                max_psi: float = 0.25, bins: int = 10,
                                lo=None, hi=None) -> "Check":
        """Distribution drift gate: PSI of ``column`` against the
        ``ref_df`` snapshot must stay under ``max_psi`` (0.25 = the
        classic drifted line; use 0.1 for the stricter stable gate).
        Runs as its own bins-bounded job (needs the second table)."""
        from ..operators.statistics import DistributionStabilityConstraint
        return self.with_constraint(DistributionStabilityConstraint(
            column, ref_df, max_psi, bins, lo, hi))

    def has_low_ks_drift(self, ref_df, column: str, max_stat: float = 0.1,
                         bins=None, lo=None, hi=None) -> "Check":
        """Two-sample Kolmogorov–Smirnov drift gate: sup-distance
        between the column's empirical CDF and the ``ref_df``
        snapshot's must stay under ``max_stat``. Exact over distinct
        values; pass ``bins``+``lo``+``hi`` to pre-quantize a
        high-cardinality continuous column."""
        from ..operators.drift import KsDriftConstraint
        return self.with_constraint(
            KsDriftConstraint(column, ref_df, max_stat, bins, lo, hi))

    def has_low_js_divergence(self, ref_df, column: str, max_js: float = 0.1,
                              bins: int = 10, lo=None, hi=None) -> "Check":
        """Jensen–Shannon divergence gate (log2, in [0,1]) over
        equi-width buckets vs the ``ref_df`` snapshot. ``lo``/``hi``
        are required (they fix the bucket domain without a min/max
        scan)."""
        from ..operators.drift import JsDriftConstraint
        return self.with_constraint(
            JsDriftConstraint(column, ref_df, max_js, bins, lo, hi))

    def has_functional_dependency(self, determinant, dependent: str,
                                  assertion=None) -> "Check":
        """Functional-dependency audit: ``determinant → dependent``
        conformance (share of determinant groups mapping to ONE
        dependent value) must satisfy the assertion (default: holds
        exactly). The denormalization-consistency check (zip→state,
        product→category)."""
        from ..operators.uniqueness import FunctionalDependencyConstraint
        return self.with_constraint(FunctionalDependencyConstraint(
            determinant, dependent, assertion))

    def has_readable_text(self, column: str = "text",
                          min_ease: float = 10.0, max_ease: float = 125.0,
                          min_ratio: float = 0.9) -> "Check":
        """Corpus readability gate: the share of non-blank documents
        with Flesch Reading Ease inside ``[min_ease, max_ease]`` must
        be at least ``min_ratio``. Rides the fused aggregation (two
        count expressions, no extra scan)."""
        from ..operators.text import ReadabilityConstraint
        return self.with_constraint(ReadabilityConstraint(
            column, min_ease, max_ease, min_ratio))

    def passes_gopher_rules(self, column: str = "text",
                            min_pass_ratio: float = 0.5,
                            **rule_overrides) -> "Check":
        """Gopher pretraining-filter gate (Rae et al. 2021 bundle:
        word-count band, mean-word-length band, symbol/bullet/ellipsis
        ratios, alphabetic-word ratio): the share of documents passing
        the rule conjunction must be at least ``min_pass_ratio``.
        Rides the fused aggregation (two count expressions, no extra
        scan); thresholds tunable via ``rule_overrides``
        (see text.GOPHER_DEFAULTS)."""
        from ..operators.text import GopherQualityConstraint
        return self.with_constraint(GopherQualityConstraint(
            column, min_pass_ratio, **rule_overrides))

    def has_low_wasserstein_drift(self, ref_df, column: str,
                                  max_w1_norm: float = 0.05,
                                  bins: int = 10, lo=None, hi=None) -> "Check":
        """Wasserstein-1 (earth mover's) drift gate over equi-width
        buckets vs the ``ref_df`` snapshot, normalized to the bucket
        domain (in [0,1]) — weighs how FAR mass moved, not just how
        much. ``lo``/``hi`` are required (they fix the bucket domain
        without a min/max scan)."""
        from ..operators.drift import W1DriftConstraint
        return self.with_constraint(
            W1DriftConstraint(column, ref_df, max_w1_norm, bins, lo, hi))

    def has_no_outliers(self, column: str, k: float = 3.0,
                        max_ratio: float = 0.0, mode: str = "exact") -> "Check":
        """Robust outlier gate: the share of rows outside the
        median ± k·1.4826·MAD fence must not exceed ``max_ratio``.
        Median/MAD resist the masking that lets outliers inflate a
        mean/stddev fence past themselves. Runs as its own three-pass
        job (the fence depends on two sequential median scalars)."""
        from ..operators.statistics import RobustOutlierConstraint
        return self.with_constraint(
            RobustOutlierConstraint(column, k, max_ratio, mode))

    def has_no_anomaly(self, metric_name: str, metric_expr, detector,
                       repository, tags=None) -> "Check":
        """The scalar ``metric_expr`` (any aggregate column, e.g.
        ``F.count(F.lit(1))`` for row count) must not be anomalous
        against its own ``repository`` history under ``detector``
        (ZScore / RelativeRateOfChange / AbsoluteChange /
        SeasonalComparison). Rides the fused aggregation; pair with
        ``ValidationSuite.run_and_store`` so history accumulates."""
        from ..analyzers.anomaly import AnomalyConstraint
        return self.with_constraint(AnomalyConstraint(
            metric_name, metric_expr, detector, repository, tags))

    def has_no_dominant_value(self, column: str,
                              max_share: float = 0.9) -> "Check":
        """The single most frequent non-null value must not cover more
        than ``max_share`` of the column — catches default-value
        pollution (an upstream bug stamping one placeholder) long
        before averages move. One grouped count + 1-row reduction."""
        from ..operators.histogram import DominantValueConstraint
        return self.with_constraint(DominantValueConstraint(column, max_share))

    def has_same_schema_as(self, ref_df, ignore_nullability: bool = True,
                           allow_extra: bool = False) -> "Check":
        """Schema must match the reference snapshot's (name + type;
        ``allow_extra`` tolerates additive columns). Pure metadata —
        zero scan — so put it first in any suite: it catches producer
        changes before value-level checks can."""
        from ..operators.multitable import SchemaMatchConstraint
        return self.with_constraint(
            SchemaMatchConstraint(ref_df, ignore_nullability, allow_extra))

    def has_row_count_ratio(self, ref_df, min_ratio: float = 0.5,
                            max_ratio: float = 2.0) -> "Check":
        """Row count relative to a reference snapshot must land in
        [min_ratio, max_ratio] — the partition-to-partition volume
        gate. Two 1-row counts."""
        from ..operators.multitable import RowCountRatioConstraint
        return self.with_constraint(
            RowCountRatioConstraint(ref_df, min_ratio, max_ratio))

    def has_low_contamination(self, eval_df, text_col: str = "text",
                              id_col: str = "doc_id", k: int = 8,
                              per_doc_threshold: float = 0.1,
                              max_doc_ratio: float = 0.0) -> "Check":
        """Benchmark-contamination release gate: the fraction of docs
        whose eval-set ``k``-gram overlap exceeds
        ``per_doc_threshold`` must stay within ``max_doc_ratio``
        (default 0 — no contaminated doc ships). Runs as its own
        shingle-join job (needs the eval table)."""
        from ..operators.curation import ContaminationConstraint
        return self.with_constraint(ContaminationConstraint(
            eval_df, text_col, id_col, k, per_doc_threshold, max_doc_ratio))

    def has_low_semantic_contamination(self, eval_df, cosine_threshold: float = 0.8,
                                       id_col: str = "vec_id",
                                       vec_col: str = "embedding",
                                       eval_id_col: str = "vec_id",
                                       eval_vec_col: str = "embedding",
                                       max_doc_ratio: float = 0.0) -> "Check":
        """Embedding decontamination gate (the semantic twin of
        ``has_low_contamination``): the share of training vectors whose
        cosine to any benchmark vector reaches ``cosine_threshold``
        must stay within ``max_doc_ratio``. Benchmark broadcasts,
        training streams map-only — catches paraphrases the n-gram
        tier misses."""
        from ..operators.similarity import SemanticContaminationConstraint
        return self.with_constraint(SemanticContaminationConstraint(
            eval_df, cosine_threshold, id_col, vec_col, eval_id_col,
            eval_vec_col, max_doc_ratio))

    def has_min_label_agreement(self, k: int = 3,
                                min_agreement: float = 0.5,
                                id_col: str = "vec_id",
                                vec_col: str = "embedding",
                                label_col: str = "label",
                                method: str = "auto",
                                exact_row_limit: int | None = None,
                                n_planes: int = 8) -> "Check":
        """Label-noise gate over a labeled embedding table: every
        label's mean k-NN agreement (fraction of nearest neighbors
        sharing the label) must reach ``min_agreement``; the metric is
        the worst label's agreement and the failure names it.
        ``method="auto"`` (default) runs the exact all-pairs form only
        up to ``exact_row_limit`` rows (default
        ``LABEL_AGREEMENT_EXACT_ROW_LIMIT`` = 100k) and the LSH
        candidate path beyond — the gate never plans an unguarded n²
        self-join."""
        from ..operators.similarity import (
            LABEL_AGREEMENT_EXACT_ROW_LIMIT, LabelAgreementConstraint)
        if exact_row_limit is None:
            exact_row_limit = LABEL_AGREEMENT_EXACT_ROW_LIMIT
        return self.with_constraint(LabelAgreementConstraint(
            k, min_agreement, id_col, vec_col, label_col,
            method=method, exact_row_limit=exact_row_limit,
            n_planes=n_planes))

    def has_low_duplication(self, column: str = "text",
                            max_ratio: float = 0.0,
                            assertion=None) -> "Check":
        """Corpus-duplication release gate: the share of rows whose
        NORMALIZED text fingerprint occurs 2+ times must stay within
        ``max_ratio`` (default 0 — no exact duplicates ship).  The
        suite-level form of dedup_exact; runs as its own
        fingerprint-groupBy job."""
        from ..operators.dedup import DuplicationConstraint
        return self.with_constraint(
            DuplicationConstraint(column, max_ratio, assertion))

    def has_low_substring_duplication(self, column: str = "text",
                                      id_column: str = "doc_id",
                                      k: int = 10, min_count: int = 2,
                                      max_ratio: float = 0.0,
                                      assertion=None) -> "Check":
        """Exact-substring duplication release gate: the share of
        corpus tokens inside a duplicated >=``k``-token span (Lee et
        al. 2021 ExactSubstr semantics) must stay within
        ``max_ratio``.  The finest tier of the duplication-gate
        family — catches boilerplate/template repetition the
        fingerprint gate averages away; runs as its own
        gram-frequency job."""
        from ..operators.text import SubstringDuplicationConstraint
        return self.with_constraint(SubstringDuplicationConstraint(
            column, id_column, k, min_count, max_ratio, assertion))

    def has_stable_distribution_by(self, ref_df, column: str, group_col: str,
                                   max_psi: float = 0.25, bins: int = 10,
                                   lo=None, hi=None,
                                   on_missing: str = "ignore") -> "Check":
        """Per-segment drift gate: the WORST per-``group_col`` PSI of
        ``column`` vs the ``ref_df`` snapshot must stay under
        ``max_psi`` — catches a drifted segment the corpus-level PSI
        averages away. ``lo``/``hi`` are required (shared bucket
        domain is what makes group scores comparable); failure names
        the worst group. ``on_missing='fail'`` also fails when a group
        exists in only one snapshot."""
        from ..operators.drift import GroupedPsiDriftConstraint
        return self.with_constraint(GroupedPsiDriftConstraint(
            column, group_col, ref_df, max_psi, bins, lo, hi, on_missing))

    def has_stable_timeline(self, ref_df, column: str, time_col: str,
                            max_psi: float = 0.25, bins: int = 10,
                            lo=None, hi=None,
                            granularity: str = "day") -> "Check":
        """Temporal drift gate: the WORST per-period (day/hour/week)
        PSI of ``column`` vs the ``ref_df`` snapshot must stay under
        ``max_psi`` — catches the single drifted dump a whole-corpus
        PSI averages away; failure names the period.  ``lo``/``hi``
        are required (one shared bucket domain is what makes period
        scores comparable)."""
        from ..operators.drift import TimelinePsiDriftConstraint
        return self.with_constraint(TimelinePsiDriftConstraint(
            column, time_col, ref_df, max_psi, bins, lo, hi, granularity))

    def has_valid_embeddings(self, column: str = "embedding",
                             expect_dim=None, require_unit_norm: bool = False,
                             norm_tol: float = 1e-3,
                             max_bad_ratio: float = 0.0) -> "Check":
        """Embedding hygiene gate: the fraction of rows whose vector is
        unusable for vector math (NULL, wrong dimension, NaN/Inf
        element, zero norm; optionally norm outside 1 ± ``norm_tol``)
        must stay within ``max_bad_ratio`` — the release screen in
        front of every ANN/cosine tier, one map-only pass riding the
        suite's fused aggregation."""
        from ..operators.similarity import EmbeddingQualityConstraint
        return self.with_constraint(EmbeddingQualityConstraint(
            column, expect_dim, require_unit_norm, norm_tol, max_bad_ratio))

    def has_canonical_keys(self, column: str, max_ratio: float = 0.01,
                           max_distance: int = 2, block=None) -> "Check":
        """Fuzzy-fragmentation gate: the row-weighted fraction of
        values that are not their own fuzzy canonical (most frequent
        name within ``max_distance`` in their block) must stay under
        ``max_ratio`` — catches a label column silently splitting
        groupBy/join keys.  Failure names the heaviest fragmented
        value and its canonical."""
        from ..operators.fuzzy import FuzzyFragmentationConstraint
        return self.with_constraint(FuzzyFragmentationConstraint(
            column, max_ratio, max_distance, block))

    def has_stable_categories(self, ref_df, column: str,
                              max_v: float = 0.1) -> "Check":
        """Categorical drift gate: Cramér's V of the column's category
        distribution vs the ``ref_df`` snapshot must stay under
        ``max_v`` (χ² itself scales with row count; V does not)."""
        from ..operators.drift import CategoricalDriftConstraint
        return self.with_constraint(
            CategoricalDriftConstraint(column, ref_df, max_v))

    # ---- predicate / containment ---------------------------------------
    def satisfies(self, predicate: str, assertion=1.0, description: str = "") -> "Check":
        return self.with_constraint(
            SatisfiesConstraint(predicate, Assertion.coerce(assertion), description))

    def is_contained_in(self, column: str, values: Sequence, assertion=1.0,
                        allow_nulls: bool = False) -> "Check":
        return self.with_constraint(ContainmentConstraint(
            column, values, Assertion.coerce(assertion), allow_nulls))

    def value_range(self, column: str, lo: float, hi: float, assertion=1.0) -> "Check":
        return self.with_constraint(
            ValueRangeConstraint(column, lo, hi, Assertion.coerce(assertion)))

    def is_non_negative(self, column: str, assertion=1.0) -> "Check":
        return self.satisfies(f"`{column}` >= 0", assertion, f"{column} >= 0")

    def is_positive(self, column: str, assertion=1.0) -> "Check":
        return self.satisfies(f"`{column}` > 0", assertion, f"{column} > 0")

    # ---- length ---------------------------------------------------------
    def length(self, column: str, length_assertion, ratio_assertion=1.0) -> "Check":
        return self.with_constraint(LengthConstraint(
            column, Assertion.coerce(length_assertion), Assertion.coerce(ratio_assertion)))

    def has_min_length(self, column: str, n: int, ratio_assertion=1.0) -> "Check":
        return self.length(column, Assertion.ge(n), ratio_assertion)

    def has_max_length(self, column: str, n: int, ratio_assertion=1.0) -> "Check":
        return self.length(column, Assertion.le(n), ratio_assertion)

    def has_length_between(self, column: str, lo: int, hi: int, ratio_assertion=1.0) -> "Check":
        return self.length(column, Assertion.between(lo, hi), ratio_assertion)

    def has_exact_length(self, column: str, n: int, ratio_assertion=1.0) -> "Check":
        return self.length(column, Assertion.eq(n), ratio_assertion)

    def is_not_empty(self, column: str, ratio_assertion=1.0) -> "Check":
        return self.length(column, Assertion.ge(1), ratio_assertion)

    # ---- format / regex ---------------------------------------------------
    def has_format(self, column: str, format_type: str, assertion=1.0,
                   options: FormatOptions = FormatOptions(), **kw) -> "Check":
        return self.with_constraint(FormatConstraint(
            column, format_type=format_type, assertion=Assertion.coerce(assertion),
            options=options, **kw))

    def validates_regex(self, column: str, pattern: str, assertion=1.0,
                        options: FormatOptions = FormatOptions()) -> "Check":
        return self.with_constraint(FormatConstraint(
            column, pattern=pattern, assertion=Assertion.coerce(assertion), options=options))

    def validates_email(self, column: str, assertion=1.0, **kw) -> "Check":
        return self.has_format(column, "email", assertion, **kw)

    def validates_url(self, column: str, assertion=1.0, allow_localhost=False, **kw) -> "Check":
        return self.has_format(column, "url", assertion, allow_localhost=allow_localhost, **kw)

    def validates_credit_card(self, column: str, assertion=1.0, **kw) -> "Check":
        return self.has_format(column, "credit_card", assertion, **kw)

    def validates_phone(self, column: str, assertion=1.0, country=None, **kw) -> "Check":
        return self.has_format(column, "phone", assertion, country=country, **kw)

    def validates_postal_code(self, column: str, country: str, assertion=1.0, **kw) -> "Check":
        return self.has_format(column, "postal_code", assertion, country=country, **kw)

    def validates_uuid(self, column: str, assertion=1.0, **kw) -> "Check":
        return self.has_format(column, "uuid", assertion, **kw)

    def validates_ipv4(self, column: str, assertion=1.0, **kw) -> "Check":
        return self.has_format(column, "ipv4", assertion, **kw)

    def validates_ipv6(self, column: str, assertion=1.0, **kw) -> "Check":
        return self.has_format(column, "ipv6", assertion, **kw)

    def validates_json(self, column: str, assertion=1.0, **kw) -> "Check":
        return self.has_format(column, "json", assertion, **kw)

    def validates_iso8601_datetime(self, column: str, assertion=1.0, **kw) -> "Check":
        return self.has_format(column, "iso8601_datetime", assertion, **kw)

    def contains_ssn(self, column: str, assertion=0.0, **kw) -> "Check":
        # detection: assert the *fraction matching* (default: none allowed)
        return self.has_format(column, "ssn", assertion, **kw)

    # ---- data type ----------------------------------------------------------
    def has_consistent_data_type(self, column: str, expected_type: str,
                                 assertion=1.0) -> "Check":
        return self.with_constraint(ConsistentDataTypeConstraint(
            column, expected_type, Assertion.coerce(assertion)))

    def has_data_type_distribution(self, column: str, assertion_fn) -> "Check":
        return self.with_constraint(DataTypeDistributionConstraint(column, assertion_fn))

    # ---- histogram -------------------------------------------------------------
    def has_histogram(self, column: str, assertion_fn: Callable, max_buckets: int = 1000) -> "Check":
        return self.with_constraint(HistogramConstraint(column, assertion_fn,
                                                        max_buckets=max_buckets))

    def has_histogram_with_description(self, column: str, assertion_fn: Callable,
                                       description: str, max_buckets: int = 1000) -> "Check":
        return self.with_constraint(HistogramConstraint(
            column, assertion_fn, description, max_buckets))

    # ---- multi-table ----------------------------------------------------------
    def foreign_key(self, child_table: str, child_column: str, parent_table: str,
                    parent_column: str, allow_nulls: bool = True,
                    max_violations: int = 100) -> "Check":
        return self.with_constraint(ForeignKeyConstraint(
            child_table, child_column, parent_table, parent_column,
            allow_nulls, max_violations))

    def join_coverage(self, left_table: str, left_column: str, right_table: str,
                      right_column: str, assertion, direction: str = "left") -> "Check":
        return self.with_constraint(JoinCoverageConstraint(
            left_table, left_column, right_table, right_column,
            Assertion.coerce(assertion), direction))

    def cross_table_sum(self, left_table: str, left_expr: str, right_table: str,
                        right_expr: str, tolerance: float = 0.0,
                        group_by=None) -> "Check":
        return self.with_constraint(CrossTableSumConstraint(
            left_table, left_expr, right_table, right_expr, tolerance, group_by))

    # ---- temporal ----------------------------------------------------------------
    def temporal_ordering(self, before_column: str, after_column: str,
                          allow_equal: bool = True, tolerance_seconds: int = 0,
                          assertion=None) -> "Check":
        return self.with_constraint(TemporalOrderingConstraint(
            before_column, after_column, allow_equal, tolerance_seconds,
            assertion=assertion))

    def within_business_hours(self, timestamp_column: str, start_hour: int = 9,
                              end_hour: int = 17, weekdays_only: bool = True,
                              assertion=None) -> "Check":
        return self.with_constraint(BusinessHoursConstraint(
            timestamp_column, start_hour, end_hour, weekdays_only, assertion))

    def within_date_range(self, timestamp_column: str, min_date=None, max_date=None,
                          assertion=None) -> "Check":
        return self.with_constraint(DateRangeConstraint(
            timestamp_column, min_date, max_date, assertion))

    def has_max_time_gap(self, timestamp_column: str, max_gap_seconds: float,
                         group_by=None, assertion=None) -> "Check":
        return self.with_constraint(MaxTimeGapConstraint(
            timestamp_column, max_gap_seconds, group_by, assertion))
