"""Telemetry hooks: OpenTelemetry-compatible spans per suite/check/
constraint, no-op without the SDK.

Parity: /root/reference/term-guard/src/telemetry.rs + span starts at
core/suite.rs:78-94,417-421 (BYO tracer). Gated behind an import-try —
the container has no OTel SDK; the span protocol is preserved so a
tracer can be injected.

Also includes DebugContext (core/debug_context.rs:129-131): rich
failure diagnostics collected during a run.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

try:  # pragma: no cover - optional dependency
    from opentelemetry import trace as _otel_trace
    _TRACER = _otel_trace.get_tracer("term_spark")
except ImportError:
    _TRACER = None


@contextlib.contextmanager
def span(name: str, **attributes):
    """OTel span when available; timing-only fallback otherwise."""
    if _TRACER is not None:  # pragma: no cover
        with _TRACER.start_as_current_span(name) as s:
            for k, v in attributes.items():
                s.set_attribute(k, v)
            yield s
        return
    yield None


@dataclass
class DebugEvent:
    at: float
    kind: str         # suite_start | check | constraint | sql | error
    name: str
    detail: Dict[str, Any] = field(default_factory=dict)


class DebugContext:
    """Collects per-run diagnostics (debug_context.rs DebugLevel model:
    off/basic/verbose)."""

    def __init__(self, level: str = "basic"):
        assert level in ("off", "basic", "verbose")
        self.level = level
        self.events: List[DebugEvent] = []

    def record(self, kind: str, name: str, **detail) -> None:
        if self.level == "off":
            return
        if self.level == "basic" and kind == "sql":
            return
        self.events.append(DebugEvent(time.time(), kind, name, detail))

    def error_report(self) -> List[Dict[str, Any]]:
        return [{"kind": e.kind, "name": e.name, **e.detail}
                for e in self.events if e.kind == "error"]
