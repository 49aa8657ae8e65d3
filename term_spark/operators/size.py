"""Size and column-count constraints.

Parity: /root/reference/term-guard/src/constraints/size.rs:66
(``SELECT COUNT(*)``) and constraints/column_count.rs:56 (schema
introspection, no scan).
"""

from __future__ import annotations

from typing import Dict, Mapping

import pyspark.sql.functions as F

from ..core.assertion import Assertion
from ..core.constraint import Constraint, EngineContext, metric_alias
from ..core.result import ConstraintResult


class SizeConstraint(Constraint):
    name = "size"

    def __init__(self, assertion: Assertion):
        self.assertion = Assertion.coerce(assertion)
        self._alias = metric_alias("size")

    def scalar_metrics(self, df) -> Dict[str, "F.Column"]:
        return {self._alias: F.count(F.lit(1))}

    def result_from_metrics(self, metrics: Mapping[str, object]) -> ConstraintResult:
        size = float(metrics[self._alias])
        if self.assertion.evaluate(size):
            return ConstraintResult.success(size)
        return ConstraintResult.failure(
            size, f"Size {size:.0f} does not satisfy {self.assertion.describe()}")


class ColumnCountConstraint(Constraint):
    """Schema-only check — performs no Spark job at all."""

    name = "column_count"

    def __init__(self, assertion: Assertion):
        self.assertion = Assertion.coerce(assertion)

    def evaluate(self, ctx: EngineContext) -> ConstraintResult:
        n = float(len(ctx.df(self.table).columns))
        if self.assertion.evaluate(n):
            return self._finish(ConstraintResult.success(n))
        return self._finish(ConstraintResult.failure(
            n, f"Column count {n:.0f} does not satisfy {self.assertion.describe()}"))
