"""Logical operators for combining per-column boolean outcomes.

Parity: /root/reference/term-guard/src/core/logical.rs:32-43 (variants)
and 69-89 (evaluation; vacuous truth for empty input at 70-78).
Used by multi-column completeness (`any_complete` / `at_least_complete`
/ `exactly_complete`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence


@dataclass(frozen=True)
class LogicalOperator:
    kind: str  # all | any | exactly | at_least | at_most
    n: int = 0

    @staticmethod
    def all() -> "LogicalOperator":
        return LogicalOperator("all")

    @staticmethod
    def any() -> "LogicalOperator":
        return LogicalOperator("any")

    @staticmethod
    def exactly(n: int) -> "LogicalOperator":
        return LogicalOperator("exactly", n)

    @staticmethod
    def at_least(n: int) -> "LogicalOperator":
        return LogicalOperator("at_least", n)

    @staticmethod
    def at_most(n: int) -> "LogicalOperator":
        return LogicalOperator("at_most", n)

    def evaluate(self, outcomes: Sequence[bool]) -> bool:
        # Vacuous-truth semantics for empty input (logical.rs:70-78):
        # All/AtMost succeed on empty; Any/Exactly(>0)/AtLeast(>0) fail.
        passed = sum(1 for o in outcomes if o)
        if self.kind == "all":
            return passed == len(outcomes)
        if self.kind == "any":
            return passed >= 1
        if self.kind == "exactly":
            return passed == self.n
        if self.kind == "at_least":
            return passed >= self.n
        if self.kind == "at_most":
            return passed <= self.n
        raise ValueError(f"unknown logical operator {self.kind!r}")

    def describe(self) -> str:
        if self.kind in ("all", "any"):
            return self.kind
        return f"{self.kind}({self.n})"
