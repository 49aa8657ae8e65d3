"""Result model: ConstraintResult / ValidationReport / ValidationResult.

Parity: /root/reference/term-guard/src/core/constraint.rs:13-48
(ConstraintResult with Success|Failure|Skipped and optional f64 metric),
core/result.rs:9-123 (ValidationReport { issues, metrics } and
ValidationResult Success/Failure). Failure ⇔ any Error-level constraint
failed (suite.rs:154-156,496-500). We add an ``ERROR`` status for
evaluation exceptions (the reference records these as failed constraint
executions with continue-on-error in the analyzer runner).
"""

from __future__ import annotations

import enum
import json
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

from .level import Level


class Status(enum.Enum):
    SUCCESS = "success"
    FAILURE = "failure"
    SKIPPED = "skipped"
    ERROR = "error"


@dataclass
class ConstraintResult:
    status: Status
    metric: Optional[float] = None
    message: str = ""
    name: str = ""
    column: Optional[str] = None

    @staticmethod
    def success(metric: Optional[float] = None, message: str = "") -> "ConstraintResult":
        return ConstraintResult(Status.SUCCESS, metric, message)

    @staticmethod
    def failure(metric: Optional[float] = None, message: str = "") -> "ConstraintResult":
        return ConstraintResult(Status.FAILURE, metric, message)

    @staticmethod
    def skipped(message: str = "No data to validate") -> "ConstraintResult":
        return ConstraintResult(Status.SKIPPED, None, message)

    @staticmethod
    def error(message: str) -> "ConstraintResult":
        return ConstraintResult(Status.ERROR, None, message)


@dataclass
class ValidationIssue:
    check: str
    constraint: str
    column: Optional[str]
    level: Level
    message: str
    metric: Optional[float] = None

    def to_dict(self) -> Dict[str, Any]:
        return {
            "check": self.check,
            "constraint": self.constraint,
            "column": self.column,
            "level": str(self.level),
            "message": self.message,
            "metric": self.metric,
        }


@dataclass
class ConstraintOutcome:
    """A constraint result annotated with its check context."""

    check: str
    level: Level
    result: ConstraintResult

    def to_dict(self) -> Dict[str, Any]:
        return {
            "check": self.check,
            "level": str(self.level),
            "constraint": self.result.name,
            "column": self.result.column,
            "status": self.result.status.value,
            "metric": self.result.metric,
            "message": self.result.message,
        }


@dataclass
class ValidationReport:
    suite: str
    outcomes: List[ConstraintOutcome] = field(default_factory=list)
    metrics: Dict[str, Any] = field(default_factory=dict)
    started_at: float = field(default_factory=time.time)
    duration_sec: float = 0.0
    num_spark_jobs: int = 0

    @property
    def issues(self) -> List[ValidationIssue]:
        return [
            ValidationIssue(
                check=o.check,
                constraint=o.result.name,
                column=o.result.column,
                level=o.level,
                message=o.result.message,
                metric=o.result.metric,
            )
            for o in self.outcomes
            if o.result.status in (Status.FAILURE, Status.ERROR)
        ]

    def counts(self) -> Dict[str, int]:
        c = {"success": 0, "failure": 0, "skipped": 0, "error": 0}
        for o in self.outcomes:
            c[o.result.status.value] += 1
        return c

    def to_dict(self) -> Dict[str, Any]:
        return {
            "suite": self.suite,
            "counts": self.counts(),
            "outcomes": [o.to_dict() for o in self.outcomes],
            "metrics": self.metrics,
            "duration_sec": self.duration_sec,
            "num_spark_jobs": self.num_spark_jobs,
        }

    def to_json(self, indent: Optional[int] = None) -> str:
        return json.dumps(self.to_dict(), indent=indent, default=str)


@dataclass
class ValidationResult:
    passed: bool
    report: ValidationReport

    @property
    def metrics(self) -> Dict[str, Any]:
        return self.report.metrics

    @staticmethod
    def from_report(report: ValidationReport) -> "ValidationResult":
        failed = any(
            o.level.fails_suite and o.result.status in (Status.FAILURE, Status.ERROR)
            for o in report.outcomes
        )
        return ValidationResult(passed=not failed, report=report)
