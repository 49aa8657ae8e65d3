"""Completeness constraints (single and multi-column).

Parity: /root/reference/term-guard/src/constraints/completeness.rs:158-163
(``COUNT(*), COUNT(col)`` → ratio; empty ⇒ Skipped at 170-201) and the
multi-column logical-operator variants (core/logical.rs, builders
``any_complete``/``at_least_complete``/``exactly_complete``,
core/check.rs). Grouped completeness lives in operators/grouped.py.
"""

from __future__ import annotations

from typing import Dict, List, Mapping, Optional

import pyspark.sql.functions as F

from ..core.assertion import Assertion
from ..core.constraint import Constraint, metric_alias
from ..core.result import ConstraintResult
from ..functions.security import validate_identifier


def _completeness_aliases(column: str):
    return metric_alias("non_null", column), metric_alias("size")


class CompletenessConstraint(Constraint):
    name = "completeness"

    def __init__(self, column: str, assertion: Assertion = None):
        self.column = validate_identifier(column)
        # default: fully complete (is_complete)
        self.assertion = Assertion.coerce(assertion) if assertion is not None else Assertion.eq(1.0)
        self._nn, self._sz = _completeness_aliases(column)

    def scalar_metrics(self, df) -> Dict[str, "F.Column"]:
        return {
            self._nn: F.count(F.col(self.column)),
            self._sz: F.count(F.lit(1)),
        }

    def row_predicate(self):
        return F.col(self.column).isNotNull()

    def result_from_metrics(self, metrics: Mapping[str, object]) -> ConstraintResult:
        total = float(metrics[self._sz])
        ratio = float(metrics[self._nn]) / total
        if self.assertion.evaluate(ratio):
            return ConstraintResult.success(ratio)
        return ConstraintResult.failure(
            ratio,
            f"Completeness {ratio:.3f} does not satisfy {self.assertion.describe()} "
            f"for column {self.column}")


class MultiColumnCompletenessConstraint(Constraint):
    """Combine per-column completeness outcomes with a logical operator.

    Each column "passes" when its completeness satisfies ``per_column``
    (default: fully complete); the metric reported is the fraction of
    passing columns.
    """

    name = "multi_column_completeness"

    def __init__(self, columns: List[str], operator, per_column: Optional[Assertion] = None):
        from ..core.logical import LogicalOperator

        self.columns = [validate_identifier(c) for c in columns]
        self.column = ",".join(self.columns)
        if not isinstance(operator, LogicalOperator):
            raise TypeError("operator must be a LogicalOperator")
        self.operator = operator
        self.per_column = Assertion.coerce(per_column) if per_column is not None else Assertion.eq(1.0)
        self._sz = metric_alias("size")
        self._aliases = {c: metric_alias("non_null", c) for c in self.columns}

    def scalar_metrics(self, df) -> Dict[str, "F.Column"]:
        exprs = {self._sz: F.count(F.lit(1))}
        for c, a in self._aliases.items():
            exprs[a] = F.count(F.col(c))
        return exprs

    def result_from_metrics(self, metrics: Mapping[str, object]) -> ConstraintResult:
        total = float(metrics[self._sz])
        outcomes = [
            self.per_column.evaluate(float(metrics[a]) / total)
            for a in self._aliases.values()
        ]
        frac = sum(outcomes) / len(outcomes) if outcomes else 1.0
        if self.operator.evaluate(outcomes):
            return ConstraintResult.success(frac)
        return ConstraintResult.failure(
            frac,
            f"{sum(outcomes)}/{len(outcomes)} columns complete; requires "
            f"{self.operator.describe()} of [{self.column}]")
