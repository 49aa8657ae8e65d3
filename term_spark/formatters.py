"""Report formatters: JSON + human-readable, with minimal/detailed/ci
presets.

Parity: /root/reference/term-guard/src/formatters.rs:25-109 (configs),
:187 (JSON formatter), :267 (human formatter).
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Optional

from .core.result import Status, ValidationResult


@dataclass(frozen=True)
class FormatterConfig:
    show_successes: bool = True
    show_metrics: bool = True
    show_messages: bool = True
    color: bool = False

    @staticmethod
    def minimal() -> "FormatterConfig":
        return FormatterConfig(show_successes=False, show_metrics=False,
                               show_messages=True)

    @staticmethod
    def detailed() -> "FormatterConfig":
        return FormatterConfig(True, True, True)

    @staticmethod
    def ci() -> "FormatterConfig":
        return FormatterConfig(show_successes=False, show_metrics=True,
                               show_messages=True, color=False)


class JsonFormatter:
    def __init__(self, config: FormatterConfig = FormatterConfig.detailed(),
                 indent: Optional[int] = 2):
        self.config = config
        self.indent = indent

    def format(self, result: ValidationResult) -> str:
        d = result.report.to_dict()
        d["passed"] = result.passed
        if not self.config.show_successes:
            d["outcomes"] = [o for o in d["outcomes"] if o["status"] != "success"]
        if not self.config.show_metrics:
            d.pop("metrics", None)
        return json.dumps(d, indent=self.indent, default=str)


_STATUS_MARK = {Status.SUCCESS: "✓", Status.FAILURE: "✗",
                Status.SKIPPED: "-", Status.ERROR: "!"}


class HumanFormatter:
    def __init__(self, config: FormatterConfig = FormatterConfig.detailed()):
        self.config = config

    def format(self, result: ValidationResult) -> str:
        rep = result.report
        lines = [f"Suite '{rep.suite}': "
                 f"{'PASSED' if result.passed else 'FAILED'} "
                 f"({rep.duration_sec:.2f}s, {rep.num_spark_jobs} Spark jobs)"]
        counts = rep.counts()
        lines.append("  " + ", ".join(f"{k}: {v}" for k, v in counts.items() if v))
        current_check = None
        for o in rep.outcomes:
            if o.result.status == Status.SUCCESS and not self.config.show_successes:
                continue
            if o.check != current_check:
                current_check = o.check
                lines.append(f"  [{o.level}] {o.check}")
            mark = _STATUS_MARK[o.result.status]
            where = f" ({o.result.column})" if o.result.column else ""
            metric = (f" = {o.result.metric:.6g}"
                      if self.config.show_metrics and o.result.metric is not None
                      else "")
            msg = (f" — {o.result.message}"
                   if self.config.show_messages and o.result.message else "")
            lines.append(f"    {mark} {o.result.name}{where}{metric}{msg}")
        return "\n".join(lines)
