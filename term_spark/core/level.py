"""Severity levels for checks and constraints.

Parity: /root/reference/term-guard/src/core/level.rs:76-84 — three
levels, Warning is the default; only Error-level failures fail a suite.
"""

from __future__ import annotations

import enum


class Level(enum.Enum):
    INFO = "info"
    WARNING = "warning"
    ERROR = "error"

    @property
    def fails_suite(self) -> bool:
        return self is Level.ERROR

    def __str__(self) -> str:  # pragma: no cover - cosmetic
        return self.value


DEFAULT_LEVEL = Level.WARNING
