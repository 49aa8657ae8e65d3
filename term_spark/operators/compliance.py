"""Predicate-compliance constraints: `satisfies` (custom SQL), value
containment, and value-range checks.

Parity:
- /root/reference/term-guard/src/constraints/custom_sql.rs:204-209 —
  ``COUNT(CASE WHEN (pred) THEN 1 END) / COUNT(*)`` with the security
  screen (security.rs:284) applied to the predicate text;
- analyzers/advanced/compliance.rs:153-159 (same ratio shape);
- containment (`o_orderstatus IN ('O','F','P')`) is the reference's
  values.rs conditional-count pattern (values.rs:245-252).
"""

from __future__ import annotations

from typing import Dict, Mapping, Sequence

import pyspark.sql.functions as F

from ..core.assertion import Assertion
from ..core.constraint import Constraint, metric_alias
from ..core.result import ConstraintResult
from ..functions.security import validate_identifier, validate_sql_expression


class SatisfiesConstraint(Constraint):
    """Ratio of rows satisfying an arbitrary (screened) boolean SQL expr."""

    name = "satisfies"

    def __init__(self, predicate: str, assertion: Assertion, description: str = ""):
        self.predicate = validate_sql_expression(predicate)
        self.assertion = Assertion.coerce(assertion)
        self.description = description or predicate
        self.column = None
        self._hit = metric_alias("satisfies", predicate)
        self._sz = metric_alias("size")

    def scalar_metrics(self, df) -> Dict[str, "F.Column"]:
        # NULL predicate result counts as non-satisfying (CASE WHEN NULL
        # THEN 1 END → NULL → not counted), matching the reference.
        return {
            self._hit: F.count(F.when(F.expr(self.predicate), 1)),
            self._sz: F.count(F.lit(1)),
        }

    def row_predicate(self):
        # NULL predicate result = non-satisfying, same as the metric
        return F.coalesce(F.expr(self.predicate), F.lit(False))

    def row_label(self):
        return f"satisfies({self.description})"

    def result_from_metrics(self, metrics: Mapping[str, object]) -> ConstraintResult:
        ratio = float(metrics[self._hit]) / float(metrics[self._sz])
        if self.assertion.evaluate(ratio):
            return ConstraintResult.success(ratio)
        return ConstraintResult.failure(
            ratio,
            f"'{self.description}' satisfied by {ratio:.3f} of rows; requires "
            f"{self.assertion.describe()}")


class ContainmentConstraint(Constraint):
    """Ratio of rows whose value is in the allowed set (NULL fails
    unless ``allow_nulls``)."""

    name = "contained_in"

    def __init__(self, column: str, allowed_values: Sequence, assertion: Assertion = None,
                 allow_nulls: bool = False):
        self.column = validate_identifier(column)
        self.allowed_values = list(allowed_values)
        self.allow_nulls = allow_nulls
        self.assertion = Assertion.coerce(assertion) if assertion is not None else Assertion.eq(1.0)
        self._hit = metric_alias("contained", column, tuple(self.allowed_values), allow_nulls)
        self._sz = metric_alias("size")

    def scalar_metrics(self, df) -> Dict[str, "F.Column"]:
        col = F.col(self.column)
        pred = col.isin(self.allowed_values)
        if self.allow_nulls:
            pred = pred | col.isNull()
        return {
            self._hit: F.count(F.when(pred, 1)),
            self._sz: F.count(F.lit(1)),
        }

    def row_predicate(self):
        col = F.col(self.column)
        pred = col.isin(self.allowed_values)
        if self.allow_nulls:
            pred = pred | col.isNull()
        # NULL isin → NULL; the metric's count(when) treats it as a
        # miss, so the row form coalesces to False identically
        return F.coalesce(pred, F.lit(False))

    def result_from_metrics(self, metrics: Mapping[str, object]) -> ConstraintResult:
        ratio = float(metrics[self._hit]) / float(metrics[self._sz])
        if self.assertion.evaluate(ratio):
            return ConstraintResult.success(ratio)
        return ConstraintResult.failure(
            ratio,
            f"{ratio:.3f} of {self.column} values contained in allowed set; "
            f"requires {self.assertion.describe()}")


class ValueRangeConstraint(Constraint):
    """Ratio of non-null values within [lo, hi] (builder_extensions.rs:423)."""

    name = "value_range"

    def __init__(self, column: str, lo: float, hi: float, assertion: Assertion = None):
        self.column = validate_identifier(column)
        self.lo, self.hi = float(lo), float(hi)
        self.assertion = Assertion.coerce(assertion) if assertion is not None else Assertion.eq(1.0)
        self._hit = metric_alias("in_range", column, lo, hi)
        self._nn = metric_alias("non_null", column)

    def scalar_metrics(self, df) -> Dict[str, "F.Column"]:
        col = F.col(self.column)
        return {
            self._hit: F.count(F.when(col.between(self.lo, self.hi), 1)),
            self._nn: F.count(col),
        }

    def row_predicate(self):
        # NULLs pass: absence is completeness's finding, not a range
        # violation (the metric likewise counts non-null rows only)
        col = F.col(self.column)
        return col.isNull() | col.between(self.lo, self.hi)

    def result_from_metrics(self, metrics: Mapping[str, object]) -> ConstraintResult:
        nn = float(metrics[self._nn])
        if nn == 0:
            return ConstraintResult.skipped(f"{self.column} has no non-null values")
        ratio = float(metrics[self._hit]) / nn
        if self.assertion.evaluate(ratio):
            return ConstraintResult.success(ratio)
        return ConstraintResult.failure(
            ratio,
            f"{ratio:.3f} of {self.column} within [{self.lo}, {self.hi}]; "
            f"requires {self.assertion.describe()}")
