"""Assertion DSL applied to numeric metrics.

Parity: /root/reference/term-guard/src/constraints/assertion.rs:27-61 —
Equals/NotEquals/GreaterThan/GreaterThanOrEqual/LessThan/LessThanOrEqual/
Between/NotBetween with a 1e-10 epsilon on (in)equality. We add
``custom`` (a Python callable) which also backs histogram assertion
closures (check.rs:725-733).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

EPSILON = 1e-10  # assertion.rs:49


@dataclass(frozen=True)
class Assertion:
    op: str
    value: Optional[float] = None
    upper: Optional[float] = None
    fn: Optional[Callable[[float], bool]] = field(default=None, compare=False)
    description_override: Optional[str] = None

    # ---- factories -------------------------------------------------
    @staticmethod
    def eq(value: float) -> "Assertion":
        return Assertion("eq", float(value))

    @staticmethod
    def ne(value: float) -> "Assertion":
        return Assertion("ne", float(value))

    @staticmethod
    def gt(value: float) -> "Assertion":
        return Assertion("gt", float(value))

    @staticmethod
    def ge(value: float) -> "Assertion":
        return Assertion("ge", float(value))

    @staticmethod
    def lt(value: float) -> "Assertion":
        return Assertion("lt", float(value))

    @staticmethod
    def le(value: float) -> "Assertion":
        return Assertion("le", float(value))

    @staticmethod
    def between(lo: float, hi: float) -> "Assertion":
        return Assertion("between", float(lo), float(hi))

    @staticmethod
    def not_between(lo: float, hi: float) -> "Assertion":
        return Assertion("not_between", float(lo), float(hi))

    @staticmethod
    def custom(fn: Callable[[float], bool], description: str = "custom assertion") -> "Assertion":
        return Assertion("custom", fn=fn, description_override=description)

    # ---- coercion helper -------------------------------------------
    @staticmethod
    def coerce(value) -> "Assertion":
        """Accept an Assertion, a plain number (== equality), or a callable."""
        if isinstance(value, Assertion):
            return value
        if callable(value):
            return Assertion.custom(value)
        return Assertion.eq(float(value))

    # ---- evaluation -------------------------------------------------
    def evaluate(self, metric: float) -> bool:
        v = float(metric)
        if self.op == "eq":
            return abs(v - self.value) < EPSILON
        if self.op == "ne":
            return abs(v - self.value) >= EPSILON
        if self.op == "gt":
            return v > self.value
        if self.op == "ge":
            return v >= self.value or abs(v - self.value) < EPSILON
        if self.op == "lt":
            return v < self.value
        if self.op == "le":
            return v <= self.value or abs(v - self.value) < EPSILON
        if self.op == "between":
            return self.value <= v <= self.upper
        if self.op == "not_between":
            return not (self.value <= v <= self.upper)
        if self.op == "custom":
            return bool(self.fn(v))
        raise ValueError(f"unknown assertion op {self.op!r}")

    def describe(self) -> str:
        if self.description_override:
            return self.description_override
        sym = {
            "eq": "==", "ne": "!=", "gt": ">", "ge": ">=", "lt": "<", "le": "<=",
        }
        if self.op in sym:
            return f"{sym[self.op]} {self.value}"
        if self.op == "between":
            return f"between [{self.value}, {self.upper}]"
        if self.op == "not_between":
            return f"not between [{self.value}, {self.upper}]"
        return self.op
