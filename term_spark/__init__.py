"""term_spark — a PySpark-native data-quality & analytics engine.

A from-scratch rebuild of the capabilities of withterm/term (a Rust
"Deequ without Spark" validation engine) as an idiomatic Spark library:
declarative checks compile to a minimal number of Spark jobs (one fused
``df.agg`` per table for all scalar metrics; one job per groupBy/join
signature), with Catalyst/AQE doing physical planning.
"""

from .core.assertion import Assertion
from .core.check import Check
from .core.constraint import Constraint, EngineContext
from .core.fluent import MultiTableCheck, validate_tables
from .core.level import Level
from .core.logical import LogicalOperator
from .core.multi_source import MultiSourceValidator
from .core.rows import annotate_rows, quarantine_rows
from .core.result import (ConstraintResult, Status, ValidationReport,
                          ValidationResult)
from .core.suite import ValidationSuite

__version__ = "0.1.0"

__all__ = [
    "Assertion", "Check", "Constraint", "EngineContext", "Level",
    "LogicalOperator", "ConstraintResult", "Status", "ValidationReport",
    "ValidationResult", "ValidationSuite", "MultiTableCheck",
    "validate_tables", "MultiSourceValidator",
]
