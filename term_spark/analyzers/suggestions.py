"""Constraint suggestions from column profiles.

Parity: /root/reference/term-guard/src/analyzers/suggestions.rs:1-60 —
rule trait + SuggestionEngine; rules consume ColumnProfile and emit
suggested constraints with confidence + rationale. Pure Python.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import List, Optional

from .profiler import NUMERIC_TYPES, ColumnProfile, TableProfile


@dataclass
class Suggestion:
    column: str
    constraint: str          # builder method name on Check
    args: dict
    confidence: float
    rationale: str

    def apply_to(self, check):
        """Apply to a Check builder; returns the check. ``_pos`` in
        args carries positional arguments (for varargs builders)."""
        kwargs = {k: v for k, v in self.args.items() if k != "_pos"}
        getattr(check, self.constraint)(*self.args.get("_pos", []), **kwargs)
        return check


class SuggestionRule:
    name = "rule"

    def evaluate(self, profile: ColumnProfile, table: TableProfile) -> List[Suggestion]:
        raise NotImplementedError


class CompletenessRule(SuggestionRule):
    """Fully-complete columns → is_complete; nearly complete →
    completeness ≥ observed (with head-room)."""

    name = "completeness"

    def evaluate(self, p, table):
        if table.num_rows == 0:
            return []
        if p.completeness == 1.0:
            return [Suggestion(p.column, "is_complete", {"column": p.column},
                               1.0, "column had no NULLs in the profiled data")]
        if p.completeness >= 0.9:
            bound = round(max(0.0, p.completeness - 0.05), 2)
            from ..core.assertion import Assertion
            return [Suggestion(p.column, "completeness",
                               {"column": p.column, "assertion": Assertion.ge(bound)},
                               0.8,
                               f"observed completeness {p.completeness:.3f}; "
                               f"suggest ≥ {bound}")]
        return []


class UniquenessRule(SuggestionRule):
    name = "uniqueness"

    def evaluate(self, p, table):
        if table.num_rows == 0 or p.non_null == 0:
            return []
        # approx_distinct within HLL error of row count → candidate key
        # (default approx_count_distinct rsd is 5%, so allow 10%)
        if p.completeness == 1.0 and \
                abs(p.approx_distinct - table.num_rows) / table.num_rows < 0.10:
            return [Suggestion(p.column, "validates_primary_key",
                               {"_pos": [p.column]}, 0.75,
                               f"~{p.approx_distinct} distinct of "
                               f"{table.num_rows} rows (within HLL error)")]
        return []


class ContainmentRule(SuggestionRule):
    name = "containment"

    def evaluate(self, p, table):
        if p.histogram and 1 < len(p.histogram) <= 20:
            values = sorted(p.histogram)
            return [Suggestion(p.column, "is_contained_in",
                               {"column": p.column, "values": values},
                               0.85,
                               f"only {len(values)} distinct values observed")]
        return []


class ValueRangeRule(SuggestionRule):
    name = "value_range"

    def evaluate(self, p, table):
        if p.min is not None and p.max is not None and p.min < p.max:
            # temporal profiles carry ISO-string min/max (profiler pass
            # 3) — the right constraint there is date_range, not a
            # numeric value_range
            if p.spark_type in ("timestamp", "timestamp_ntz", "date"):
                return [Suggestion(p.column, "within_date_range",
                                   {"timestamp_column": p.column,
                                    "min_date": p.min, "max_date": p.max},
                                   0.6,
                                   f"observed range [{p.min}, {p.max}]")]
            return [Suggestion(p.column, "value_range",
                               {"column": p.column, "lo": p.min, "hi": p.max},
                               0.6,
                               f"observed range [{p.min}, {p.max}]")]
        return []


class TypeConsistencyRule(SuggestionRule):
    name = "type_consistency"

    def evaluate(self, p, table):
        if p.inferred_type in ("integer", "float", "decimal", "date",
                               "datetime", "time", "boolean") and \
                p.inferred_confidence >= 0.9:
            expected = "float" if p.inferred_type == "decimal" else p.inferred_type
            return [Suggestion(p.column, "has_consistent_data_type",
                               {"column": p.column, "expected_type": expected},
                               p.inferred_confidence,
                               f"inferred {p.inferred_type} at "
                               f"{p.inferred_confidence:.2f} confidence")]
        return []


class DominantValueRule(SuggestionRule):
    """Round-5 rule: a low-cardinality column whose top value already
    covers a large-but-not-total share gets a has_no_dominant_value
    gate with headroom — the profile-derived default-value-pollution
    tripwire. A share near 1.0 gets nothing (the gate would be
    vacuous; containment already pins near-constant columns)."""

    name = "dominant_value"

    def evaluate(self, p, table):
        if not p.histogram:
            return []
        total = sum(p.histogram.values())
        if total == 0:
            return []
        share = max(p.histogram.values()) / total
        if share >= 0.9:
            return []
        bound = round(min(0.95, share + 0.1), 2)
        return [Suggestion(p.column, "has_no_dominant_value",
                           {"column": p.column, "max_share": bound},
                           0.7,
                           f"top value covers {share:.3f} of rows; gate at "
                           f"{bound} catches a placeholder flood")]


class RobustOutlierRule(SuggestionRule):
    """Round-5 rule: numeric columns with real spread get a
    has_no_outliers MAD gate at a loose k — tolerated ratio derived
    from the profiled tails (p25/p75 spread vs min/max)."""

    name = "robust_outliers"

    def evaluate(self, p, table):
        if (p.spark_type not in NUMERIC_TYPES or p.stddev is None
                or not p.stddev or p.quantiles is None):
            return []
        q1, q3 = p.quantiles.get("p25"), p.quantiles.get("p75")
        if q1 is None or q3 is None or q3 <= q1:
            return []
        return [Suggestion(p.column, "has_no_outliers",
                           {"column": p.column, "k": 6.0, "max_ratio": 0.01},
                           0.5,
                           f"numeric spread observed (IQR [{q1}, {q3}]); "
                           "loose MAD fence flags gross corruption only")]


def _looks_like_prose(p: ColumnProfile, min_tokens: float = 20.0) -> bool:
    """Free-text detection from the profile: a string column whose
    sampled values average ≥ ``min_tokens`` whitespace tokens and whose
    sampled-type inference says "text" (not numeric/date/categorical).
    Short identifier-ish strings (names, codes, addresses) miss the
    token bar; low-cardinality enums miss the inference."""
    return (p.spark_type == "string"
            and p.inferred_type == "text"
            and not p.is_low_cardinality
            and (p.avg_tokens or 0.0) >= min_tokens)


class ReadableTextRule(SuggestionRule):
    """Round-8 rule: document-shaped string columns get a loose
    has_readable_text gate — most docs must score a plausible Flesch
    ease, screening mojibake/garbage floods without pinning style.
    The 0.5 ratio is deliberately 'gross corruption only', the text
    sibling of RobustOutlierRule's loose MAD fence."""

    name = "readable_text"

    def evaluate(self, p, table):
        if not _looks_like_prose(p):
            return []
        return [Suggestion(p.column, "has_readable_text",
                           {"column": p.column, "min_ratio": 0.5},
                           0.7,
                           f"prose-like column (~{p.avg_tokens:.0f} tokens/"
                           "value sampled); loose readability floor flags "
                           "an encoding/garbage flood")]


class GopherQualityRule(SuggestionRule):
    """Round-8 rule: document-shaped string columns get a loose
    passes_gopher_rules gate (pretraining filter bundle) — a corpus
    where under 30% of docs clear the canonical word-count/symbol/
    bullet screens has a pipeline problem, whatever its domain."""

    name = "gopher_quality"

    def evaluate(self, p, table):
        if not _looks_like_prose(p):
            return []
        return [Suggestion(p.column, "passes_gopher_rules",
                           {"column": p.column, "min_pass_ratio": 0.3},
                           0.7,
                           f"prose-like column (~{p.avg_tokens:.0f} tokens/"
                           "value sampled); loose Gopher-bundle floor "
                           "catches boilerplate/fragment floods")]


class BalancedKeysRule(SuggestionRule):
    """Round-8 rule: a key-named high-cardinality column that is NOT
    unique (the foreign-key side of a join) gets a has_balanced_keys
    skew gate at the default 5% cap — the profile-derived pre-flight
    for the straggler that only shows up at shuffle time.  Unique
    columns are skipped (UniquenessRule pins them as primary keys;
    their max share is 1/n by construction)."""

    name = "balanced_keys"

    # key-name heuristic (round-8 review hardened): 'key' as a SUFFIX
    # is safe modulo a small English stoplist (l_orderkey, o_custkey,
    # partition_key — vs monkey/turkey), while 'id' as a bare suffix
    # is not (paid, valid, grid, rapid), so 'id(s)' requires a ^ or _
    # boundary (doc_id, user_ids, id).
    _KEY_NAME = re.compile(r"(?:keys?|(?:^|_)ids?)$", re.IGNORECASE)
    _KEY_STOPLIST = re.compile(
        r"(?:mon|don|tur|whis|joc|hoc|lac)keys?$", re.IGNORECASE)

    def evaluate(self, p, table):
        if (table.num_rows == 0 or p.non_null == 0
                or p.is_low_cardinality
                or not self._KEY_NAME.search(p.column)
                or self._KEY_STOPLIST.search(p.column)):
            return []
        distinct_ratio = p.approx_distinct / table.num_rows
        if distinct_ratio >= 0.9:      # unique — primary-key territory
            return []
        return [Suggestion(p.column, "has_balanced_keys",
                           {"key_cols": [p.column]}, 0.7,
                           f"key-named column with ~{p.approx_distinct} "
                           f"distinct of {table.num_rows} rows — join-skew "
                           "gate before this key reaches a 100 TB shuffle")]


class LowContaminationRule(SuggestionRule):
    """Round-8 rule, opt-in: given an eval/benchmark table, suggest a
    has_low_contamination release gate on every document-shaped
    column.  NOT in DEFAULT_RULES — the eval set cannot be derived
    from a profile; construct the rule with it and append:
    ``SuggestionEngine(DEFAULT_RULES + [LowContaminationRule(eval_df)])``.
    """

    name = "low_contamination"

    def __init__(self, eval_df, id_col: str = "doc_id", k: int = 8,
                 per_doc_threshold: float = 0.1,
                 max_doc_ratio: float = 0.0):
        self.eval_df = eval_df
        self.id_col = id_col
        self.k = k
        self.per_doc_threshold = per_doc_threshold
        self.max_doc_ratio = max_doc_ratio

    def evaluate(self, p, table):
        if not _looks_like_prose(p):
            return []
        return [Suggestion(p.column, "has_low_contamination",
                           {"eval_df": self.eval_df, "text_col": p.column,
                            "id_col": self.id_col, "k": self.k,
                            "per_doc_threshold": self.per_doc_threshold,
                            "max_doc_ratio": self.max_doc_ratio},
                           0.8,
                           "an eval set was provided; no training doc "
                           f"may overlap it above {self.per_doc_threshold:,g}"
                           " k-gram share")]


DEFAULT_RULES = [CompletenessRule(), UniquenessRule(), ContainmentRule(),
                 ValueRangeRule(), TypeConsistencyRule(),
                 DominantValueRule(), RobustOutlierRule(),
                 ReadableTextRule(), GopherQualityRule(),
                 BalancedKeysRule()]


class SuggestionEngine:
    def __init__(self, rules: Optional[List[SuggestionRule]] = None):
        self.rules = rules if rules is not None else list(DEFAULT_RULES)

    def suggest(self, profile: TableProfile) -> List[Suggestion]:
        out: List[Suggestion] = []
        for col_profile in profile.columns.values():
            for rule in self.rules:
                out.extend(rule.evaluate(col_profile, profile))
        out.sort(key=lambda s: -s.confidence)
        return out

    def suggest_check(self, profile: TableProfile, name: str = "suggested",
                      min_confidence: float = 0.7):
        """Materialize suggestions into a runnable Check."""
        from ..core.check import Check
        check = Check(name)
        for s in self.suggest(profile):
            if s.confidence >= min_confidence:
                s.apply_to(check)
        return check
