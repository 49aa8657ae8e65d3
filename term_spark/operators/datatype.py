"""Data-type consistency and type-distribution detection.

Parity: /root/reference/term-guard/src/constraints/consistency.rs:66-87
(regex CASE classification into integer/float/boolean/date/datetime/
time/text + GROUP BY detected_type ORDER BY count DESC) and
analyzers/advanced/data_type.rs:129-141 (TRY_CAST-based buckets).
"""

from __future__ import annotations

from typing import Dict, Mapping

import pyspark.sql.functions as F

from ..core.assertion import Assertion
from ..core.constraint import Constraint, EngineContext, metric_alias
from ..core.result import ConstraintResult
from ..functions.security import validate_identifier

# Regex classifiers (consistency.rs:66-87), lookaround-free so they work
# identically in Java regex and DuckDB.
TYPE_PATTERNS = [
    ("integer", r"^[+-]?\d+$"),
    ("float", r"^[+-]?(\d+\.\d*|\.\d+|\d+)([eE][+-]?\d+)?$"),
    ("boolean", r"^(true|false|TRUE|FALSE|True|False|0|1|yes|no|YES|NO)$"),
    ("datetime", r"^\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}(:\d{2})?(\.\d+)?([Zz]|[+-]\d{2}:?\d{2})?$"),
    ("date", r"^\d{4}-\d{2}-\d{2}$"),
    ("time", r"^\d{2}:\d{2}(:\d{2})?(\.\d+)?$"),
]


def classify_expr(column: str) -> "F.Column":
    """CASE chain assigning each non-null value a detected type label;
    NULL stays NULL (rlike(NULL) is NULL, so without the explicit guard
    every branch would fall through and mislabel NULL as 'text').

    'float' intentionally also matches integer text in the reference's
    ordering; we test integer first so integers classify as integer.
    """
    col = F.col(column).cast("string")
    expr = F.when(col.isNull(), F.lit(None))
    for label, pat in TYPE_PATTERNS:
        expr = expr.when(col.rlike(pat), label)
    return expr.otherwise("text")


class ConsistentDataTypeConstraint(Constraint):
    """Ratio of non-null values whose detected type == expected."""

    name = "consistent_data_type"

    def __init__(self, column: str, expected_type: str, assertion: Assertion = None):
        valid = {t for t, _ in TYPE_PATTERNS} | {"text"}
        if expected_type not in valid:
            raise ValueError(f"expected_type must be one of {sorted(valid)}")
        self.column = validate_identifier(column)
        self.expected_type = expected_type
        self.assertion = Assertion.coerce(assertion) if assertion is not None else Assertion.eq(1.0)
        self._hit = metric_alias("dtype", column, expected_type)
        self._nn = metric_alias("non_null", column)

    def scalar_metrics(self, df) -> Dict[str, "F.Column"]:
        match = classify_expr(self.column) == self.expected_type
        nn = F.col(self.column).isNotNull()
        return {
            self._hit: F.count(F.when(nn & match, 1)),
            self._nn: F.count(F.col(self.column)),
        }

    def result_from_metrics(self, metrics: Mapping[str, object]) -> ConstraintResult:
        nn = float(metrics[self._nn])
        if nn == 0:
            return ConstraintResult.skipped(f"{self.column} has no non-null values")
        ratio = float(metrics[self._hit]) / nn
        if self.assertion.evaluate(ratio):
            return ConstraintResult.success(ratio)
        return ConstraintResult.failure(
            ratio,
            f"{ratio:.3f} of {self.column} detected as {self.expected_type}; "
            f"requires {self.assertion.describe()}")


class DataTypeDistributionConstraint(Constraint):
    """GroupBy detected type; assertion receives the distribution dict."""

    name = "data_type_distribution"

    def __init__(self, column: str, assertion_fn):
        self.column = validate_identifier(column)
        self.assertion_fn = assertion_fn

    def evaluate(self, ctx: EngineContext) -> ConstraintResult:
        df = ctx.df(self.table)
        rows = (df.filter(F.col(self.column).isNotNull())
                  .groupBy(classify_expr(self.column).alias("detected_type"))
                  .agg(F.count(F.lit(1)).alias("cnt"))
                  .orderBy(F.desc("cnt"))
                  .collect())
        if not rows:
            return self._finish(ConstraintResult.skipped())
        dist = {r["detected_type"]: r["cnt"] for r in rows}
        total = sum(dist.values())
        shares = {k: v / total for k, v in dist.items()}
        try:
            ok = bool(self.assertion_fn(shares))
        except Exception as exc:
            return self._finish(ConstraintResult.error(f"assertion raised: {exc}"))
        dominant = max(shares.values())
        if ok:
            return self._finish(ConstraintResult.success(dominant))
        return self._finish(ConstraintResult.failure(
            dominant, f"type distribution {shares} rejected by assertion"))
