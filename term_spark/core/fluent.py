"""Multi-table fluent DSL.

Parity: /root/reference/term-guard/src/core/fluent_builder.rs:8-31 —
``validate_tables(...).join_on(...).ensure_referential_integrity()
.expect_join_coverage(p).and_validate_tables(...)
.ensure_sum_consistency(...).group_by(...).with_tolerance(...)
.and_validate_temporal(...).ensure_ordering(a,b)
.within_business_hours(...)`` — a thin sentence-like layer that
assembles the same multi-table constraints as Check.
"""

from __future__ import annotations

from typing import Optional, Tuple

from .assertion import Assertion
from .check import Check
from .level import DEFAULT_LEVEL, Level
from .suite import ValidationSuite


class MultiTableCheck:
    def __init__(self, name: str = "multi_table", level: Level = DEFAULT_LEVEL):
        self._check = Check(name, level)
        self._left: Optional[str] = None
        self._right: Optional[str] = None
        self._on: Optional[Tuple[str, str]] = None
        self._sum_exprs: Optional[Tuple[str, str]] = None
        self._sum_group: Optional[Tuple[str, str]] = None
        self._sum_tol: float = 0.0
        self._temporal_table: Optional[str] = None

    # ---- table pair stage -------------------------------------------
    def validate_tables(self, child: str, parent: str) -> "MultiTableCheck":
        self._left, self._right = child, parent
        return self

    def join_on(self, child_column: str, parent_column: str) -> "MultiTableCheck":
        self._on = (child_column, parent_column)
        return self

    def ensure_referential_integrity(self, allow_nulls: bool = True) -> "MultiTableCheck":
        self._require_join()
        self._check.foreign_key(self._left, self._on[0], self._right,
                                self._on[1], allow_nulls)
        return self

    def expect_join_coverage(self, threshold: float,
                             direction: str = "left") -> "MultiTableCheck":
        self._require_join()
        self._check.join_coverage(self._left, self._on[0], self._right,
                                  self._on[1], Assertion.ge(threshold), direction)
        return self

    def expect_bounded_join_size(self, max_rows: float,
                                 k: int = 256) -> "MultiTableCheck":
        """Sketch pre-flight on the declared join: fail when
        |child ⋈ parent| is PROVABLY above ``max_rows`` (one-sided MG
        lower bound — a failure names the keys to salt), without ever
        running the join."""
        self._require_join()
        self._check.has_bounded_join_cardinality(
            self._left, self._on[0], self._right, self._on[1], max_rows, k)
        return self

    def and_validate_tables(self, child: str, parent: str) -> "MultiTableCheck":
        return self.validate_tables(child, parent)

    # ---- sum-consistency stage ---------------------------------------
    def ensure_sum_consistency(self, left_expr: str, right_expr: str) -> "MultiTableCheck":
        self._require_tables()
        self._sum_exprs = (left_expr, right_expr)
        self._flush_sum()
        return self

    def group_by(self, left_key: str, right_key: str) -> "MultiTableCheck":
        self._sum_group = (left_key, right_key)
        self._flush_sum(replace=True)
        return self

    def with_tolerance(self, tolerance: float) -> "MultiTableCheck":
        self._sum_tol = float(tolerance)
        self._flush_sum(replace=True)
        return self

    def _flush_sum(self, replace: bool = False):
        if not self._sum_exprs:
            return
        if replace and self._check.constraints and \
                self._check.constraints[-1].name == "cross_table_sum":
            self._check.constraints.pop()
        self._check.cross_table_sum(self._left, self._sum_exprs[0],
                                    self._right, self._sum_exprs[1],
                                    self._sum_tol, self._sum_group)

    # ---- temporal stage ----------------------------------------------
    def and_validate_temporal(self, table: str) -> "MultiTableCheck":
        self._temporal_table = table
        return self

    def ensure_ordering(self, before_column: str, after_column: str,
                        allow_equal: bool = True) -> "MultiTableCheck":
        from ..operators.temporal import TemporalOrderingConstraint
        con = TemporalOrderingConstraint(before_column, after_column, allow_equal)
        con.table = self._temporal_table
        return self._add(con)

    def within_business_hours(self, timestamp_column: str, start_hour: int = 9,
                              end_hour: int = 17,
                              weekdays_only: bool = True) -> "MultiTableCheck":
        from ..operators.temporal import BusinessHoursConstraint
        con = BusinessHoursConstraint(timestamp_column, start_hour, end_hour,
                                      weekdays_only)
        con.table = self._temporal_table
        return self._add(con)

    # ---- build -------------------------------------------------------
    def build(self) -> Check:
        return self._check

    def to_suite(self, name: str = "multi_table_suite") -> ValidationSuite:
        return ValidationSuite.builder(name).with_check(self._check)

    # ---- helpers -----------------------------------------------------
    def _add(self, con) -> "MultiTableCheck":
        self._check.with_constraint(con)
        return self

    def _require_tables(self):
        if not (self._left and self._right):
            raise ValueError("call validate_tables(child, parent) first")

    def _require_join(self):
        self._require_tables()
        if not self._on:
            raise ValueError("call join_on(child_col, parent_col) first")


def validate_tables(child: str, parent: str, name: str = "multi_table",
                    level: Level = Level.ERROR) -> MultiTableCheck:
    """Entry point mirroring the reference's free function."""
    return MultiTableCheck(name, level).validate_tables(child, parent)
