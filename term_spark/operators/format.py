"""Format (regex) validation constraints.

Parity: /root/reference/term-guard/src/constraints/format.rs:740-800 —
metric = COUNT(CASE WHEN col ~ pattern [OR col IS NULL] THEN 1 END) /
COUNT(*); options: case_sensitive (``~`` vs ``~*``), trim_before_check,
null_is_valid. Patterns live in functions/formats.py (ported from
format.rs:252-296). Spark-side case-insensitivity uses the Java-regex
``(?i)`` inline flag.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Mapping, Optional

import pyspark.sql.functions as F

from ..core.assertion import Assertion
from ..core.constraint import Constraint, metric_alias
from ..core.result import ConstraintResult
from ..functions import formats
from ..functions.security import validate_identifier, validate_regex_pattern


@dataclass(frozen=True)
class FormatOptions:
    case_sensitive: bool = True
    trim_before_check: bool = False
    null_is_valid: bool = False


def pattern_for(format_type: str, country: Optional[str] = None,
                allow_localhost: bool = False) -> str:
    ft = format_type.lower()
    if ft == "url":
        return formats.URL_ALLOW_LOCALHOST if allow_localhost else formats.URL
    if ft == "phone":
        return formats.phone_pattern(country)
    if ft == "postal_code":
        return formats.postal_code_pattern(country)
    if ft in formats.FORMAT_PATTERNS:
        return formats.FORMAT_PATTERNS[ft]
    raise ValueError(f"unknown format type {format_type!r}")


class FormatConstraint(Constraint):
    def __init__(self, column: str, pattern: str = None, format_type: str = None,
                 assertion: Assertion = None, options: FormatOptions = FormatOptions(),
                 country: Optional[str] = None, allow_localhost: bool = False):
        if (pattern is None) == (format_type is None):
            raise ValueError("provide exactly one of pattern / format_type")
        self.column = validate_identifier(column)
        self.format_type = format_type or "regex"
        self.pattern = validate_regex_pattern(
            pattern if pattern is not None
            else pattern_for(format_type, country, allow_localhost))
        self.options = options
        self.name = f"format_{self.format_type}" if format_type else "format"
        self.assertion = Assertion.coerce(assertion) if assertion is not None else Assertion.eq(1.0)
        self._hit = metric_alias("format", column, self.pattern, options)
        self._sz = metric_alias("size")

    def _match_predicate(self) -> "F.Column":
        col = F.col(self.column).cast("string")
        if self.options.trim_before_check:
            col = F.trim(col)
        pat = self.pattern if self.options.case_sensitive else f"(?i){self.pattern}"
        pred = col.rlike(pat)
        if self.options.null_is_valid:
            pred = pred | F.col(self.column).isNull()
        return pred

    def row_predicate(self):
        return F.coalesce(self._match_predicate(), F.lit(False))

    def scalar_metrics(self, df) -> Dict[str, "F.Column"]:
        return {
            self._hit: F.count(F.when(self._match_predicate(), 1)),
            self._sz: F.count(F.lit(1)),
        }

    def result_from_metrics(self, metrics: Mapping[str, object]) -> ConstraintResult:
        ratio = float(metrics[self._hit]) / float(metrics[self._sz])
        if self.assertion.evaluate(ratio):
            return ConstraintResult.success(ratio)
        return ConstraintResult.failure(
            ratio,
            f"{ratio:.3f} of {self.column} matches {self.name}; requires "
            f"{self.assertion.describe()}")
