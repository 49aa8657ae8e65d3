"""Row-level validation results: annotate each row with the
constraints it violates, route bad rows to quarantine.

The suite's aggregate protocol answers "does the DATASET pass?"; many
pipelines also need "WHICH rows fail, and send them elsewhere" —
deequ's row-level results / the classic quarantine pattern.  Every
constraint with an inherent row semantics (completeness, containment,
value range, format, length, satisfies) exposes
``Constraint.row_predicate()``; aggregate-only constraints (mean,
uniqueness, drift…) return None and are simply not row-attributable —
``annotate_rows`` skips them and reports which were skipped.

Scale: the annotation is a pure map-only projection (every predicate
is a codegen boolean over the row), so it pipelines with whatever scan
or write follows — no shuffle, no second pass, and the same columns
work inside ``foreachBatch`` for streaming quarantine.  At 100 TB the
split writes are two filtered passes over the SAME annotated frame;
with AQE both reuse the one upstream computation when it is
checkpointed/cached, or re-run the cheap map twice when not — either
beats collecting violations anywhere.

Reference: violation SAMPLING (bounded examples per constraint) lives
in the multitable operators; this module is the full-routing
complement (reference term-guard/src/constraints/mod.rs keeps only
aggregate outcomes).
"""

from __future__ import annotations

from typing import List, Tuple

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

VIOLATIONS_COL = "__violations"
PASSED_COL = "__passed"


def _row_rules(checks) -> Tuple[list, list]:
    """[(label, predicate Column)] over all row-expressible
    constraints; second list = names of constraints skipped (no row
    form)."""
    rules, skipped = [], []
    for check in checks:
        scope = F.expr(check.where) if check.where else None
        for c in check.constraints:
            pred = c.row_predicate()
            if pred is None:
                skipped.append(c.row_label())
                continue
            if scope is not None:
                # out-of-scope rows pass vacuously (same row scoping
                # the suite's fused agg applies via Check.where)
                pred = ~F.coalesce(scope, F.lit(False)) | pred
            rules.append((c.row_label(), pred))
    return rules, skipped


def annotate_rows(df: DataFrame, *checks) -> DataFrame:
    """Add ``__violations`` (array of violated-constraint labels) and
    ``__passed`` (no violations) to every row. Raises if no constraint
    in the checks has a row-level form."""
    rules, skipped = _row_rules(checks)
    if not rules:
        raise ValueError(
            "annotate_rows: no row-expressible constraints in the given "
            f"checks (skipped aggregate-only: {skipped})")
    tags = F.array_compact(F.array(*[
        F.when(~pred, F.lit(label)) for label, pred in rules]))
    return (df.withColumn(VIOLATIONS_COL, tags)
              .withColumn(PASSED_COL, F.size(VIOLATIONS_COL) == 0))


def quarantine_rows(df: DataFrame, *checks,
                    keep_annotations: bool = False
                    ) -> Tuple[DataFrame, DataFrame]:
    """Split ``df`` into (good, bad) by the row-expressible constraints
    of the given checks. ``bad`` always keeps ``__violations`` (that is
    the quarantine's triage key); ``good`` drops the annotation columns
    unless ``keep_annotations``."""
    ann = annotate_rows(df, *checks)
    good = ann.filter(F.col(PASSED_COL))
    if not keep_annotations:
        good = good.drop(VIOLATIONS_COL, PASSED_COL)
    bad = ann.filter(~F.col(PASSED_COL)).drop(PASSED_COL)
    return good, bad
