"""ValidationSuite — named group of checks; run() drives the
scan-sharing executor.

Parity: /root/reference/term-guard/src/core/suite.rs:41-54,399-500 —
suite = checks; run returns Success/Failure (Failure ⇔ any Error-level
constraint failed); default table "data" (suite.rs:549) overridable per
suite (suite.rs:582-585). Where the reference loops constraints
sequentially, one SQL query each (suite.rs:84), we fuse all scalar
constraints into one Spark job per table (plans/executor.py).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Mapping, Optional, Union

from .check import Check
from .result import ValidationResult

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession

DEFAULT_TABLE = "data"


class ValidationSuite:
    def __init__(self, name: str, default_table: str = DEFAULT_TABLE):
        self.name = name
        self.default_table = default_table
        self.checks: list = []

    @staticmethod
    def builder(name: str) -> "ValidationSuite":
        return ValidationSuite(name)

    def on_table(self, table: str) -> "ValidationSuite":
        self.default_table = table
        return self

    def with_check(self, check: Check) -> "ValidationSuite":
        self.checks.append(check)
        return self

    def run(self, spark: "SparkSession",
            data: Union["DataFrame", Mapping[str, "DataFrame"]],
            debug=None) -> ValidationResult:
        """Run all checks. Pass a ``telemetry.DebugContext`` as ``debug``
        to collect per-constraint timings, job descriptions, and an
        error report (debug_context.rs workflow)."""
        from ..plans.executor import SuiteRunner

        return SuiteRunner().run(self, spark, self._tables(data), debug=debug)

    def explain(self, spark: "SparkSession",
                data: Union["DataFrame", Mapping[str, "DataFrame"]],
                mode: str = "formatted") -> str:
        """Physical plans of the fused aggregation job(s) — the
        reference's explain_plan equivalent (optimizer/mod.rs:140-212).
        Use to confirm scan sharing / pushdown / codegen spans."""
        from ..plans.executor import SuiteRunner

        return SuiteRunner().explain(self, spark, self._tables(data), mode)

    def run_and_store(self, spark: "SparkSession", data, repository,
                      timestamp: float = None, **tags) -> ValidationResult:
        """Run, then persist numeric metrics to a MetricsRepository
        keyed by ResultKey(timestamp, tags) — the repository+anomaly
        workflow in one call."""
        from ..analyzers.base import MetricValue
        from ..repository import ResultKey

        result = self.run(spark, data)
        repository.save(
            ResultKey.of(timestamp, suite=self.name, **tags),
            {k: MetricValue.double(v) for k, v in result.metrics.items()
             if isinstance(v, (int, float))})
        return result

    def _tables(self, data) -> Mapping[str, "DataFrame"]:
        if hasattr(data, "sparkSession"):  # a bare DataFrame
            return {self.default_table: data}
        return dict(data)
