"""String-length constraints.

Parity: /root/reference/term-guard/src/constraints/length.rs:150-175 —
ratio = COUNT(CASE WHEN <length condition> OR col IS NULL THEN 1 END) /
COUNT(*); note NULLs count as VALID in the reference's length family.
Builders: has_min_length / has_max_length / has_length_between /
has_exact_length / is_not_empty (core/check.rs).
"""

from __future__ import annotations

from typing import Dict, Mapping

import pyspark.sql.functions as F

from ..core.assertion import Assertion
from ..core.constraint import Constraint, metric_alias
from ..core.result import ConstraintResult
from ..functions.security import validate_identifier


class LengthConstraint(Constraint):
    name = "length"

    def __init__(self, column: str, length_assertion: Assertion,
                 ratio_assertion: Assertion = None, null_is_valid: bool = True):
        self.column = validate_identifier(column)
        self.length_assertion = Assertion.coerce(length_assertion)
        self.ratio_assertion = (Assertion.coerce(ratio_assertion)
                                if ratio_assertion is not None else Assertion.eq(1.0))
        self.null_is_valid = null_is_valid
        self._hit = metric_alias("length", column, self.length_assertion, null_is_valid)
        self._sz = metric_alias("size")

    def _condition(self) -> "F.Column":
        ln = F.char_length(F.col(self.column).cast("string"))
        a = self.length_assertion
        if a.op == "eq":
            cond = ln == int(a.value)
        elif a.op == "ne":
            cond = ln != int(a.value)
        elif a.op == "gt":
            cond = ln > int(a.value)
        elif a.op == "ge":
            cond = ln >= int(a.value)
        elif a.op == "lt":
            cond = ln < int(a.value)
        elif a.op == "le":
            cond = ln <= int(a.value)
        elif a.op == "between":
            cond = ln.between(int(a.value), int(a.upper))
        elif a.op == "not_between":
            cond = ~ln.between(int(a.value), int(a.upper))
        else:
            raise ValueError(f"length does not support assertion op {a.op!r}")
        if self.null_is_valid:
            cond = cond | F.col(self.column).isNull()
        return cond

    def scalar_metrics(self, df) -> Dict[str, "F.Column"]:
        return {
            self._hit: F.count(F.when(self._condition(), 1)),
            self._sz: F.count(F.lit(1)),
        }

    def row_predicate(self):
        return F.coalesce(self._condition(), F.lit(False))

    def result_from_metrics(self, metrics: Mapping[str, object]) -> ConstraintResult:
        ratio = float(metrics[self._hit]) / float(metrics[self._sz])
        if self.ratio_assertion.evaluate(ratio):
            return ConstraintResult.success(ratio)
        return ConstraintResult.failure(
            ratio,
            f"{ratio:.3f} of {self.column} satisfies length "
            f"{self.length_assertion.describe()}; requires "
            f"{self.ratio_assertion.describe()}")
