"""Multi-table constraints: foreign key, join coverage, cross-table sum.

Parity:
- ForeignKeyConstraint — /root/reference/term-guard/src/constraints/
  foreign_key.rs:151-207: orphan count via child LEFT JOIN parent WHERE
  parent.pk IS NULL → COUNT(*), COUNT(DISTINCT child.fk); options
  allow_nulls (:97) and bounded violation examples (LIMIT, default 100,
  :89). Spark idiom: ``left_anti`` join (the reference's NOT-EXISTS
  strategy flag, :106, is the same plan shape).
- JoinCoverageConstraint — constraints/join_coverage.rs:213-275: Left /
  Right / Bidirectional (LEAST of both) match rates; unmatched-key
  examples (:311-321).
- CrossTableSumConstraint — constraints/cross_table_sum.rs:202-283:
  ungrouped = two scalar SUMs + tolerance; grouped = per-table GROUP BY
  sums FULL OUTER JOINed on the group key, count of violating groups +
  MAX difference; violation listing ordered by diff DESC + LIMIT
  (:365-385).

Scale posture: FK/coverage are shuffle joins on the key — Catalyst/AQE
pick broadcast automatically when the parent side is small; counts use
map-side partial aggregation. Violation samples are LIMIT-bounded before
collect. The distinct-orphan count and the grouped-sum join shuffle once
on the join/group key each.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import pyspark.sql.functions as F

from ..core.assertion import Assertion
from ..core.constraint import Constraint, EngineContext
from ..core.result import ConstraintResult
from ..functions.security import validate_identifier, validate_identifiers

DEFAULT_MAX_VIOLATIONS = 100  # foreign_key.rs:89


class ForeignKeyConstraint(Constraint):
    name = "foreign_key"

    def __init__(self, child_table: str, child_column: str, parent_table: str,
                 parent_column: str, allow_nulls: bool = True,
                 max_violations: int = DEFAULT_MAX_VIOLATIONS):
        self.child_table = child_table
        self.child_column = validate_identifier(child_column)
        self.parent_table = parent_table
        self.parent_column = validate_identifier(parent_column)
        self.allow_nulls = allow_nulls
        self.max_violations = max_violations
        self.column = child_column
        self.table = child_table
        self.violation_examples: List = []

    def evaluate(self, ctx: EngineContext) -> ConstraintResult:
        child = ctx.df(self.child_table)
        parent = ctx.df(self.parent_table).select(self.parent_column).distinct()
        fk = F.col(self.child_column)
        child_keys = child.select(self.child_column)
        if self.allow_nulls:
            child_keys = child_keys.filter(fk.isNotNull())
        total = child.count()
        if total == 0:
            return self._finish(ConstraintResult.skipped())
        orphans = child_keys.join(
            parent, child_keys[self.child_column] == parent[self.parent_column],
            "left_anti")
        agg = orphans.agg(
            F.count(F.lit(1)).alias("orphan_rows"),
            F.count_distinct(fk).alias("orphan_keys")).collect()[0]
        orphan_rows = int(agg["orphan_rows"])
        if orphan_rows == 0:
            return self._finish(ConstraintResult.success(0.0))
        self.violation_examples = [
            r[self.child_column]
            for r in orphans.select(self.child_column).distinct()
                            .limit(self.max_violations).collect()]
        ratio = orphan_rows / total
        return self._finish(ConstraintResult.failure(
            ratio,
            f"{orphan_rows} rows ({int(agg['orphan_keys'])} distinct "
            f"{self.child_column} values) in {self.child_table} have no match "
            f"in {self.parent_table}.{self.parent_column}; examples: "
            f"{self.violation_examples[:10]}"))


class JoinCoverageConstraint(Constraint):
    """Match-rate between two tables; direction left|right|bidirectional."""

    name = "join_coverage"

    def __init__(self, left_table: str, left_column: str, right_table: str,
                 right_column: str, assertion: Assertion,
                 direction: str = "left",
                 max_violations: int = DEFAULT_MAX_VIOLATIONS):
        if direction not in ("left", "right", "bidirectional"):
            raise ValueError("direction must be left|right|bidirectional")
        self.left_table = left_table
        self.left_column = validate_identifier(left_column)
        self.right_table = right_table
        self.right_column = validate_identifier(right_column)
        self.direction = direction
        self.assertion = Assertion.coerce(assertion)
        self.max_violations = max_violations
        self.column = f"{left_column}~{right_column}"
        self.table = left_table
        self.violation_examples: List = []

    @staticmethod
    def _match_rate(src, src_col: str, dst, dst_col: str) -> Tuple[float, int]:
        total = src.count()
        if total == 0:
            return 1.0, 0
        matched = src.select(src_col).join(
            dst.select(dst_col).distinct(),
            F.col(src_col) == F.col(dst_col), "left_semi").count()
        return matched / total, total

    def evaluate(self, ctx: EngineContext) -> ConstraintResult:
        left = ctx.df(self.left_table)
        right = ctx.df(self.right_table)
        if self.direction == "left":
            rate, total = self._match_rate(left, self.left_column, right, self.right_column)
        elif self.direction == "right":
            rate, total = self._match_rate(right, self.right_column, left, self.left_column)
        else:
            l_rate, lt = self._match_rate(left, self.left_column, right, self.right_column)
            r_rate, rt = self._match_rate(right, self.right_column, left, self.left_column)
            rate, total = min(l_rate, r_rate), lt + rt  # LEAST (join_coverage.rs:267)
        if total == 0:
            return self._finish(ConstraintResult.skipped())
        if self.assertion.evaluate(rate):
            return self._finish(ConstraintResult.success(rate))
        # bounded unmatched-key examples (join_coverage.rs:311-321)
        src, src_col, dst, dst_col = (
            (left, self.left_column, right, self.right_column)
            if self.direction != "right"
            else (right, self.right_column, left, self.left_column))
        self.violation_examples = [
            r[src_col] for r in src.select(src_col).join(
                dst.select(dst_col).distinct(),
                F.col(src_col) == F.col(dst_col), "left_anti")
            .distinct().limit(self.max_violations).collect()]
        return self._finish(ConstraintResult.failure(
            rate,
            f"join coverage ({self.direction}) {rate:.3f} between "
            f"{self.left_table}.{self.left_column} and "
            f"{self.right_table}.{self.right_column} does not satisfy "
            f"{self.assertion.describe()}; unmatched examples: "
            f"{self.violation_examples[:10]}"))


class CrossTableSumConstraint(Constraint):
    """Sum reconciliation across two tables, optionally per group."""

    name = "cross_table_sum"

    def __init__(self, left_table: str, left_expr: str, right_table: str,
                 right_expr: str, tolerance: float = 0.0,
                 group_by: Optional[Tuple[str, str]] = None,
                 max_violations: int = DEFAULT_MAX_VIOLATIONS):
        from ..functions.security import validate_sql_expression

        self.left_table = left_table
        self.left_expr = validate_sql_expression(left_expr)
        self.right_table = right_table
        self.right_expr = validate_sql_expression(right_expr)
        self.tolerance = float(tolerance)
        self.group_by = group_by  # (left_key, right_key) or None
        if group_by:
            validate_identifiers(group_by)
        self.max_violations = max_violations
        self.column = None
        self.table = left_table
        self.violating_groups: List = []

    def evaluate(self, ctx: EngineContext) -> ConstraintResult:
        left = ctx.df(self.left_table)
        right = ctx.df(self.right_table)
        if not self.group_by:
            ls = left.agg(F.coalesce(F.sum(F.expr(self.left_expr)), F.lit(0.0))
                          .alias("s")).collect()[0]["s"]
            rs = right.agg(F.coalesce(F.sum(F.expr(self.right_expr)), F.lit(0.0))
                           .alias("s")).collect()[0]["s"]
            diff = abs(float(ls) - float(rs))
            if diff <= self.tolerance:
                return self._finish(ConstraintResult.success(diff))
            return self._finish(ConstraintResult.failure(
                diff,
                f"sum({self.left_expr})={ls} vs sum({self.right_expr})={rs} "
                f"differ by {diff} > tolerance {self.tolerance}"))

        lk, rk = self.group_by
        lsum = left.groupBy(F.col(lk).alias("grp")).agg(
            F.sum(F.expr(self.left_expr)).alias("left_sum"))
        rsum = right.groupBy(F.col(rk).alias("grp")).agg(
            F.sum(F.expr(self.right_expr)).alias("right_sum"))
        joined = lsum.join(rsum, "grp", "full_outer").select(
            "grp",
            F.coalesce("left_sum", F.lit(0.0)).alias("left_sum"),
            F.coalesce("right_sum", F.lit(0.0)).alias("right_sum"),
        ).withColumn("diff", F.abs(F.col("left_sum") - F.col("right_sum")))
        agg = joined.agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.count(F.when(F.col("diff") > self.tolerance, 1)).alias("violations"),
            F.max("diff").alias("max_diff")).collect()[0]
        if agg["n_groups"] == 0:
            return self._finish(ConstraintResult.skipped())
        violations = int(agg["violations"])
        if violations == 0:
            return self._finish(ConstraintResult.success(0.0))
        self.violating_groups = (
            joined.filter(F.col("diff") > self.tolerance)
                  .orderBy(F.desc("diff")).limit(self.max_violations).collect())
        return self._finish(ConstraintResult.failure(
            float(violations),
            f"{violations}/{int(agg['n_groups'])} groups violate sum "
            f"consistency (max diff {float(agg['max_diff']):.4f} > tolerance "
            f"{self.tolerance})"))
