"""Misra-Gries heavy-hitter sketch — a mergeable frequency summary
with deterministic error bounds, the bounded-shuffle answer to "which
values dominate this column?" at 100 TB.

Reference role: the reference answers frequency questions exactly —
its histogram / top-k analyzers (term-guard/src/analyzers/advanced/histogram.rs)
group by the raw value, which shuffles one row per DISTINCT key. That
is the right plan when distinct counts are modest; over a 100 TB token
stream (billions of distinct tokens) the exact groupBy's shuffle IS
the job. This module is the sketch tier of the same question — the
relationship ``decontaminate_bloom`` has to the exact anti-join tier:
each partition keeps k counters and emits <= k+1 rows, so at most
(k+1) * n_partitions tiny rows ever cross the wire, and the driver
merge touches kilobytes regardless of corpus size.

Theory (public): Misra & Gries 1982 ("Finding repeated elements");
Metwally et al. 2005 (SpaceSaving); Agarwal et al. PODS'12 ("Mergeable
Summaries", Thm. 1) — a k-counter MG summary is MERGEABLE: add counts
item-wise, subtract the (k+1)-th largest total from every counter,
drop non-positive counters. The result is again a valid k-counter MG
summary of the combined stream, so shard-wise sketching is safe at any
fan-in and any merge-tree shape. Guarantees, with n = total counted
items (NULLs excluded), over ANY merge order:

- underestimate:       est(x) <= true(x)
- bounded error:       true(x) - est(x) <= floor(n / (k+1))
- no false negatives:  every x with true(x) > n/(k+1) has a counter.

The third is the heavy-hitter contract: choose k > 1/phi and every
value with frequency above phi*n is guaranteed present.

Spark-first realization: ``mapInPandas`` streams each partition's
Arrow batches through a k-counter dict (batch-local exact counts via
``value_counts`` — an exact count is itself a valid MG summary, so
absorbing it batch-wise is Agarwal's merge, not an approximation of
it), emits the partition summary plus one sentinel row carrying the
partition's item count, and the driver applies the same merge to the
<= (k+1) * P collected rows. No groupBy, no unbounded aggregation
state — the whole corpus pass is one map-only stage (same shape as
the Bloom decontamination scan).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Iterable, List, Optional, Tuple

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..core.constraint import Constraint, ConstraintResult, EngineContext
from ..functions.security import validate_identifier


@dataclass(frozen=True)
class MGSummary:
    """k-counter Misra-Gries summary of a stream of n items."""
    k: int
    n: int
    counters: Dict[str, int]

    @property
    def error_bound(self) -> int:
        """Max undercount of any estimate: floor(n / (k+1))."""
        return self.n // (self.k + 1)

    def estimate(self, item: str) -> int:
        """Lower bound on item's true count (0 if no counter held)."""
        return self.counters.get(item, 0)

    def top(self, limit: Optional[int] = None) -> List[Tuple[str, int]]:
        """(item, estimate) sorted by estimate desc, item asc."""
        rows = sorted(self.counters.items(), key=lambda kv: (-kv[1], kv[0]))
        return rows if limit is None else rows[:limit]


def _absorb(counters: Dict[str, int], batch: Iterable[Tuple[str, int]],
            k: int) -> None:
    """Agarwal et al. merge, in place: add ``batch`` counts item-wise;
    if more than k counters remain, subtract the (k+1)-th largest
    count from all and drop the non-positive ones. O(size) per call —
    no per-item decrement loops."""
    for item, c in batch:
        counters[item] = counters.get(item, 0) + int(c)
    if len(counters) > k:
        # (k+1)-th largest value among the counters
        vals = sorted(counters.values(), reverse=True)
        cut = vals[k]
        for item in list(counters):
            nc = counters[item] - cut
            if nc > 0:
                counters[item] = nc
            else:
                del counters[item]


def mg_merge(summaries: List[MGSummary]) -> MGSummary:
    """Merge shard summaries into one (all must share k). The merge
    law is Agarwal et al. Thm. 1 — the result is a valid MG summary of
    the concatenated shards, so the n/(k+1) bound holds on the TOTAL n."""
    if not summaries:
        raise ValueError("need at least one summary")
    k = summaries[0].k
    if any(s.k != k for s in summaries):
        raise ValueError("summaries must share the same k")
    counters: Dict[str, int] = {}
    n = 0
    for s in summaries:
        n += s.n
        _absorb(counters, s.counters.items(), k)
    return MGSummary(k=k, n=n, counters=counters)


def mg_sketch(df: DataFrame, column: str, k: int = 256) -> MGSummary:
    """Sketch a column's value frequencies in ONE map-only pass.

    Each partition emits its k-counter summary plus a sentinel row
    with its item count; the driver collects <= (k+1) * n_partitions
    rows and merges them. NULLs are excluded (consistent with the
    engine's other analyzers); values are counted as their string
    cast, so the sketch is type-agnostic the same way ``kmv_sketch``
    is.
    """
    validate_identifier(column)
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    src = (df.select(F.col(column).cast("string").alias("v"))
             .filter(F.col("v").isNotNull()))

    def sketch_partition(batches):
        import pandas as pd
        counters: Dict[str, int] = {}
        n = 0
        for pdf in batches:
            vals = pdf["v"]
            n += len(vals)
            _absorb(counters, vals.value_counts().items(), k)
        items = list(counters.keys())
        yield pd.DataFrame({
            "item": items + [None],
            "count": [counters[i] for i in items] + [0],
            "n": [0] * len(items) + [n],
        })

    rows = src.mapInPandas(
        sketch_partition, "item string, count long, n long").collect()
    counters: Dict[str, int] = {}
    total = 0
    for r in rows:
        if r["item"] is None:
            total += r["n"]
        else:
            counters[r["item"]] = counters.get(r["item"], 0) + r["count"]
    # partition summaries may overlap on items; the item-wise sum above
    # is the "add" half of the merge — one final trim completes it
    _absorb(counters, (), k)
    return MGSummary(k=k, n=total, counters=counters)


def mg_sketch_by(df: DataFrame, group_col: str, column: str,
                 k: int = 256) -> Dict[str, MGSummary]:
    """Per-group MG sketches in ONE map-only pass — the
    per-language/per-source dashboard form of ``mg_sketch`` (round 11;
    "what dominates this column WITHIN each source?").

    Each partition keeps an independent k-counter summary per group
    value it sees and emits <= (k+1) rows per (partition, group) —
    k counters plus one sentinel carrying that group's partition item
    count — so the collect is bounded by (k+1) * P * |groups| tiny
    rows and the driver state by O(k * |groups|): kilobytes for the
    dashboard cardinalities (languages, sources, shards) this exists
    for, at any corpus size.  The per-group merge is the SAME Agarwal
    et al. merge as the global sketch — groups never interact, so
    Thm. 1 applies group-wise and every ``MGSummary`` in the result
    carries the n/(k+1) bound on ITS OWN group's item count (proven
    under arbitrary sharding in tests/test_heavy_hitters.py).

    Groups are the group column's string cast; NULL groups and NULL
    values are excluded (consistent with ``mg_sketch`` / the grouped
    exact analyzers).  For unbounded group cardinality use the exact
    grouped runner instead — a sketch per group only helps when the
    group count is dashboard-sized.
    """
    validate_identifier(group_col)
    validate_identifier(column)
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    src = (df.select(F.col(group_col).cast("string").alias("g"),
                     F.col(column).cast("string").alias("v"))
             .filter(F.col("g").isNotNull() & F.col("v").isNotNull()))

    def sketch_partition(batches):
        import pandas as pd
        state: Dict[str, list] = {}  # g -> [counters, n]
        for pdf in batches:
            for g, vals in pdf.groupby("g", sort=False)["v"]:
                st = state.setdefault(g, [{}, 0])
                st[1] += len(vals)
                _absorb(st[0], vals.value_counts().items(), k)
        gs, items, counts, ns = [], [], [], []
        for g, (counters, n) in state.items():
            for item, c in counters.items():
                gs.append(g); items.append(item)
                counts.append(c); ns.append(0)
            gs.append(g); items.append(None); counts.append(0); ns.append(n)
        yield pd.DataFrame({"g": gs, "item": items, "count": counts,
                            "n": ns})

    rows = src.mapInPandas(
        sketch_partition, "g string, item string, count long, n long"
    ).collect()
    merged: Dict[str, list] = {}
    for r in rows:
        st = merged.setdefault(r["g"], [{}, 0])
        if r["item"] is None:
            st[1] += r["n"]
        else:
            st[0][r["item"]] = st[0].get(r["item"], 0) + r["count"]
    out: Dict[str, MGSummary] = {}
    for g, (counters, n) in merged.items():
        _absorb(counters, (), k)  # final trim completes the merge
        out[g] = MGSummary(k=k, n=n, counters=counters)
    return out


def heavy_hitters(df: DataFrame, column: str, min_ratio: float,
                  k: Optional[int] = None) -> List[Tuple[str, int, int]]:
    """Values GUARANTEED (no false negatives) to include every item
    with true frequency > min_ratio of non-null rows. Returns
    (item, est, err_bound) with est <= true <= est + err_bound,
    sorted by est desc. k defaults to the smallest counter budget
    whose n/(k+1) bound sits below the asked threshold (2x margin)."""
    if not 0.0 < min_ratio < 1.0:
        raise ValueError(f"min_ratio must be in (0, 1), got {min_ratio}")
    if k is None:
        k = max(8, int(2.0 / min_ratio))
    s = mg_sketch(df, column, k=k)
    if s.n == 0:
        return []
    bound = s.error_bound
    # est + bound >= true, so keep any item whose UPPER bound clears
    # the threshold — supersets the true heavy hitters, never misses
    thresh = min_ratio * s.n
    return [(item, est, bound) for item, est in s.top()
            if est + bound > thresh]


class HeavyHitterConstraint(Constraint):
    """``has_no_heavy_hitters``: fail when any single value's frequency
    provably exceeds ``max_ratio`` — the sketch tier of the exact
    ``has_balanced_keys`` gate (uniqueness.py key-skew report), for
    columns whose distinct count makes an exact groupBy the dominant
    cost.

    One-sided by construction: MG underestimates, so est/n > max_ratio
    PROVES a violation (no false positives). Detection is guaranteed
    once the true ratio exceeds max_ratio + 1/(k+1); a true ratio
    inside that band may pass — callers needing exact adjudication at
    the boundary should use the exact gate. Metric = largest estimate
    ratio observed.
    """

    name = "heavy_hitters"

    def __init__(self, column: str, max_ratio: float = 0.5,
                 k: Optional[int] = None):
        validate_identifier(column)
        if not 0.0 < max_ratio < 1.0:
            raise ValueError(f"max_ratio must be in (0, 1), got {max_ratio}")
        self.column = column
        self.max_ratio = float(max_ratio)
        # k sized so the detection band max_ratio..max_ratio + 1/(k+1)
        # is at most 10% of the threshold
        self.k = k if k is not None else max(8, int(10.0 / max_ratio))
        self.table = None

    def evaluate(self, ctx: EngineContext) -> ConstraintResult:
        df = ctx.df(self.table)
        s = mg_sketch(df, self.column, k=self.k)
        if s.n == 0:
            return self._finish(ConstraintResult.skipped())
        top = s.top(limit=1)
        worst_item, worst_est = top[0] if top else (None, 0)
        ratio = worst_est / s.n
        if ratio <= self.max_ratio:
            return self._finish(ConstraintResult.success(ratio))
        return self._finish(ConstraintResult.failure(
            ratio,
            f"value {worst_item!r} holds >= {ratio:.4f} of column "
            f"'{self.column}' (> max_ratio {self.max_ratio}; estimate "
            f"is a lower bound, undercount <= {s.error_bound} of "
            f"n={s.n})"))


class GroupedHeavyHitterConstraint(Constraint):
    """``has_no_heavy_hitters_by``: the grouped form of the sketch
    gate — fail when any GROUP's single value provably exceeds
    ``max_ratio`` of that group's rows (round 11; per-source/
    per-language dominance screens over streams whose distinct count
    rules out the exact grouped runner).  One map-only ``mg_sketch_by``
    pass; every per-group estimate is an underestimate against that
    group's own n, so the gate stays one-sided (a failure is a proof,
    detection guaranteed above max_ratio + 1/(k+1) per group).
    Metric = the worst group's estimate ratio; the failure message
    names the offending (group, value) pairs.
    """

    name = "grouped_heavy_hitters"

    def __init__(self, group_column: str, column: str,
                 max_ratio: float = 0.5, k: Optional[int] = None,
                 max_examples: int = 5):
        validate_identifier(group_column)
        validate_identifier(column)
        if not 0.0 < max_ratio < 1.0:
            raise ValueError(f"max_ratio must be in (0, 1), got {max_ratio}")
        self.group_column = group_column
        self.column = column
        self.max_ratio = float(max_ratio)
        self.k = k if k is not None else max(8, int(10.0 / max_ratio))
        self.max_examples = max_examples
        self.table = None

    def evaluate(self, ctx: EngineContext) -> ConstraintResult:
        df = ctx.df(self.table)
        sketches = mg_sketch_by(df, self.group_column, self.column, k=self.k)
        if not sketches:
            return self._finish(ConstraintResult.skipped())
        worst_ratio, offenders = 0.0, []
        for g, s in sorted(sketches.items()):
            if s.n == 0:
                continue
            top = s.top(limit=1)
            if not top:
                continue
            item, est = top[0]
            ratio = est / s.n
            worst_ratio = max(worst_ratio, ratio)
            if ratio > self.max_ratio:
                offenders.append((g, item, ratio, s.error_bound, s.n))
        if not offenders:
            return self._finish(ConstraintResult.success(worst_ratio))
        offenders.sort(key=lambda t: -t[2])
        shown = "; ".join(
            f"{self.group_column}={g!r}: {item!r} >= {ratio:.4f} "
            f"(undercount <= {bound} of n={n})"
            for g, item, ratio, bound, n in offenders[:self.max_examples])
        return self._finish(ConstraintResult.failure(
            worst_ratio,
            f"{len(offenders)} group(s) hold a value above max_ratio "
            f"{self.max_ratio} in column '{self.column}': {shown}"))


class MGFrequencyAnalyzer:
    """Analyzer-protocol wrapper for the MG sketch, so heavy-hitter
    state joins the engine's incremental-analysis algebra (the
    reference's compute-state / merge-states / metric triplet,
    term-guard/src/analyzers/traits.rs:64-148): sketch each day's
    partition ONCE, persist the k-counter state as JSON in a
    StateStore, and answer "what dominates the whole corpus?" by
    merging kilobyte states — O(today) scan cost, O(partitions)
    driver arithmetic, never a rescan.

    Unlike the fused-aggregate analyzers, MG state can't be expressed
    as agg Columns (the counter set is data-dependent), so this
    implements ``compute_state_from_df`` — the runners' direct-state
    path for exactly this analyzer shape. Metric = the top value's
    estimated share of rows (the dominance number
    ``has_no_heavy_hitters`` gates on); the full counter table rides
    in the state for callers needing the item list.
    """

    name = "mg_frequency"

    def __init__(self, column: str, k: int = 256):
        self.column = validate_identifier(column)
        if k < 2:
            raise ValueError(f"k must be >= 2, got {k}")
        self.k = int(k)

    def metric_key(self) -> str:
        return f"{self.name}.{self.column}"

    def compute_state_from_df(self, df: DataFrame) -> "AnalyzerState":
        from .base import AnalyzerState
        s = mg_sketch(df, self.column, k=self.k)
        return AnalyzerState(k=s.k, n=s.n, counters=dict(s.counters))

    def merge_states(self, states) -> "AnalyzerState":
        from .base import AnalyzerState
        merged = mg_merge([MGSummary(k=int(s["k"]), n=int(s["n"]),
                                     counters=dict(s["counters"]))
                           for s in states])
        return AnalyzerState(k=merged.k, n=merged.n,
                             counters=dict(merged.counters))

    def metric_from_state(self, state) -> "MetricValue":
        from .base import MetricValue
        n = int(state["n"])
        if n == 0:
            return MetricValue.double(0.0)
        top = max(state["counters"].values(), default=0)
        return MetricValue.double(top / n)

    @staticmethod
    def summary_from_state(state) -> MGSummary:
        return MGSummary(k=int(state["k"]), n=int(state["n"]),
                         counters=dict(state["counters"]))
