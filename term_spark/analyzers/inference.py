"""Logical type inference for string data.

Parity: /root/reference/term-guard/src/analyzers/inference.rs:1-70 —
classify string values into Integer/Float/Decimal/Date/DateTime/Time/
Boolean/Categorical/Text with confidence; sample_size 1000, confidence
threshold 0.7, categorical cardinality threshold 100. Pure Python over
a driver-side sample (the profiler supplies it).
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

SAMPLE_SIZE = 1000
CONFIDENCE_THRESHOLD = 0.7
CATEGORICAL_CARDINALITY = 100

_PATTERNS = [
    ("integer", re.compile(r"^[+-]?\d+$")),
    ("decimal", re.compile(r"^[+-]?\d+\.\d+$")),
    ("float", re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$")),
    ("boolean", re.compile(r"^(true|false|yes|no|0|1)$", re.IGNORECASE)),
    ("datetime", re.compile(
        r"^\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}(:\d{2})?(\.\d+)?([Zz]|[+-]\d{2}:?\d{2})?$")),
    ("date", re.compile(r"^\d{4}-\d{2}-\d{2}$")),
    ("time", re.compile(r"^\d{2}:\d{2}(:\d{2})?(\.\d+)?$")),
]


def classify_value(v: str) -> str:
    s = v.strip()
    for label, pat in _PATTERNS:
        if pat.match(s):
            return label
    return "text"


def infer_column_type(values: List[Optional[str]],
                      sample_size: int = SAMPLE_SIZE,
                      confidence_threshold: float = CONFIDENCE_THRESHOLD,
                      categorical_cardinality: int = CATEGORICAL_CARDINALITY,
                      ) -> Tuple[str, float]:
    """Returns (type, confidence). decimal folds into float when mixed;
    integer folds into float when mixed with float/decimal; low-
    cardinality text becomes categorical."""
    sample = [v for v in values[:sample_size] if v is not None and str(v).strip()]
    if not sample:
        return "text", 0.0
    counts: dict = {}
    for v in sample:
        counts[classify_value(str(v))] = counts.get(classify_value(str(v)), 0) + 1
    n = len(sample)

    # numeric folding: mixed integer/decimal/float columns promote to the
    # most general numeric type present
    num = counts.get("integer", 0) + counts.get("decimal", 0) + counts.get("float", 0)
    best, best_n = max(counts.items(), key=lambda kv: kv[1])
    if best in ("integer", "decimal", "float") and num > counts.get(best, 0):
        best = "decimal" if counts.get("decimal", 0) else "float"
        best_n = num
    conf = best_n / n
    if best == "text" or conf < confidence_threshold:
        distinct = len(set(sample))
        if distinct <= categorical_cardinality:
            return "categorical", len(sample) and 1.0 - distinct / n
        return "text", counts.get("text", 0) / n
    return best, conf
