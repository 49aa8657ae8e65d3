"""KMV (k-minimum-values) distinct sketch — mergeable, and unlike the
HLL role it supports SET OPERATIONS between sketches: Jaccard,
intersection and union estimates across sources/snapshots without a
join ("how many documents do these two 100 TB dumps share?" from two
k-row summaries).

Reference role: the reference's approx-distinct analyzer family
(term-guard/src/analyzers/advanced/approx_count_distinct.rs) is union-only (HLL);
KMV is the classical alternative (Bar-Yossef et al. 2002;
Beyer et al. SIGMOD'07 "distinct-value synopses") whose sketches
intersect.  Public-theory implementation, Spark-first.

Spark-first realization: the sketch of a column is the k smallest
md5 hashes of its DISTINCT values.  That is exactly
``distinct -> orderBy(hash) -> limit(k)`` — Spark executes it as
TakeOrderedAndProject: each partition keeps its own k smallest, the
driver merges k-row slices — bounded memory everywhere, no
collect_set-style unbounded aggregation state.  The per-group variant
uses the engine's standard bounded window top-k.

Estimators (h = md5/2^128 ∈ [0,1), uniform):
- distinct:  exact ``len(hashes)`` while < k are held; else (k-1)/h_k
  (the k-th minimum of n uniforms sits at ≈ k/n).  Relative error
  ≈ 1/√(k-2) (Beyer et al.) — k=1024 → ~3%.
- union(A,B): distinct estimate of min-k(A ∪ B) — EXACTLY the sketch
  the union's raw data would have produced (min-k is a monoid).
- jaccard(A,B): among the union sketch's k values, the fraction
  present in BOTH input sketches (each union minimum is a uniform
  sample of A ∪ B; membership in both ⇔ the value is in A ∩ B).
- intersection: jaccard × union.

The merge law is EXACT, not approximate: min-k(A ∪ B) ==
min-k(min-k(A) ∪ min-k(B)) — pinned by tests, which makes shard-wise
sketching safe at any fan-in.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.security import validate_identifier

_MD5_SPAN = float(2 ** 128)


@dataclass(frozen=True)
class KMVSketch:
    k: int
    hashes: tuple  # sorted ascending md5 hex strings, len <= k

    @property
    def saturated(self) -> bool:
        return len(self.hashes) >= self.k


def _frac(h: str) -> float:
    return int(h, 16) / _MD5_SPAN


def kmv_sketch(df: DataFrame, column: str, k: int = 1024) -> KMVSketch:
    """Sketch a column's distinct values: one bounded Spark job
    (distinct → TakeOrderedAndProject k) — every partition retains at
    most k hashes, the driver merges k-row slices."""
    validate_identifier(column)
    if k < 8:
        raise ValueError(f"k must be >= 8, got {k}")
    rows = (df.filter(F.col(column).isNotNull())
              .select(F.md5(F.col(column).cast("string")).alias("h"))
              .distinct()
              .orderBy("h")
              .limit(k)
              .collect())
    return KMVSketch(k=k, hashes=tuple(r["h"] for r in rows))


def kmv_sketch_by(df: DataFrame, group_col: str, column: str,
                  k: int = 1024) -> DataFrame:
    """Per-group sketches as (group, hashes array<string>) — the
    engine's standard bounded window top-k; each output row is at most
    k hashes.  Feed rows to ``sketch_from_row`` and combine with
    ``kmv_merge``/``kmv_jaccard`` driver-side — no cross-group join
    ever runs.

    NULL groups are dropped alongside NULL values: a NULL source
    label is not a source, and letting one through would poison every
    downstream ``sorted(groups)`` with a None/str comparison.

    Scale contract — the bounded-top-k claim is STRUCTURAL, not an
    optimizer accident: the rank filter only prunes before the shuffle
    when Catalyst's ``WindowGroupLimit`` rule fires, and that rule is
    gated on ``spark.sql.optimizer.windowGroupLimitThreshold``
    (default 1000 — BELOW our default k of 1024, so out of the box
    the rule would silently NOT fire and every map task would ship its
    full distinct-hash set into one per-group sort).  We raise the
    threshold to cover ``k`` before planning.

    SESSION-WIDE SIDE EFFECT (deliberate, r13 advice): the raise is
    monotone (never lowered, only lifted to ``max(current, k)``) and
    is NOT restored afterwards.  It cannot be: Spark re-reads the conf
    every time a NEW QueryExecution optimizes this plan — the index
    build's ``.write`` path, a caller's join on the result, a cache
    materialization — so a try/finally restore would silently un-bound
    exactly the downstream plans the guarantee exists for.  The
    threshold only gates when Catalyst may prune rank filters BEFORE a
    shuffle; raising it from 1000 to ~1024 enables that prune for a
    slightly larger k and changes no query's results.  Callers who
    need the old value can snapshot
    ``spark.conf.get("spark.sql.optimizer.windowGroupLimitThreshold")``
    before calling.

    ``test_kmv.py::test_kmv_sketch_by_plan_has_partial_group_limit``
    pins the Partial group-limit node in the executed plan so a Spark
    upgrade or conf regression fails loudly instead of quietly
    un-bounding the build."""
    validate_identifier(group_col)
    validate_identifier(column)
    if k < 8:
        raise ValueError(f"k must be >= 8, got {k}")
    from pyspark.sql import Window
    spark = df.sparkSession
    thr_key = "spark.sql.optimizer.windowGroupLimitThreshold"
    try:
        cur = int(spark.conf.get(thr_key, "1000"))
    except Exception:
        cur = 1000
    if cur < k:
        spark.conf.set(thr_key, str(int(k)))
    base = (df.filter(F.col(column).isNotNull()
                      & F.col(group_col).isNotNull())
              .select(F.col(group_col).alias("grp"),
                      F.md5(F.col(column).cast("string")).alias("h")))
    # r15 (guide §2.4 remove shuffles outright): the old form ran a
    # standalone DISTINCT on (grp, h) — a full exchange of the whole
    # per-task-distinct hash set — before the top-k window's own
    # exchange.  dense_rank makes the dedup and the rank ONE pass: the
    # k smallest DISTINCT hashes are exactly the rows with
    # dense_rank <= k, and the Partial WindowGroupLimit prunes each
    # map task to those hashes (plus their in-task duplicates) BEFORE
    # the only remaining shuffle; collect_set dedupes what's left.
    # Sketch rows are byte-identical (same sorted distinct min-k set —
    # asserted against the old form on the sf10 shingle feed); plan
    # 2 Exchange -> 1, and on a real cluster the saved exchange is the
    # full distinct shingle-hash set of a 100 TB corpus.
    w = Window.partitionBy("grp").orderBy("h")
    return (base.withColumn("__rk", F.dense_rank().over(w))
                .filter(F.col("__rk") <= k)
                .groupBy("grp")
                .agg(F.array_sort(F.collect_set("h")).alias("hashes")))


def sketch_from_row(row, k: int) -> KMVSketch:
    """Adapt a ``kmv_sketch_by`` output row to a KMVSketch."""
    return KMVSketch(k=k, hashes=tuple(row["hashes"]))


def kmv_merge(sketches: List[KMVSketch]) -> KMVSketch:
    """Exact monoid merge: min-k of the union of the input sketches —
    identical to sketching the concatenated raw data."""
    if not sketches:
        raise ValueError("kmv_merge: no sketches")
    k = min(s.k for s in sketches)
    merged = sorted(set().union(*[s.hashes for s in sketches]))[:k]
    return KMVSketch(k=k, hashes=tuple(merged))


def kmv_distinct(sketch: KMVSketch) -> float:
    """Distinct-count estimate: exact while the sketch is unsaturated,
    else the (k-1)/h_k order-statistic estimator."""
    if not sketch.saturated:
        return float(len(sketch.hashes))
    return (sketch.k - 1) / _frac(sketch.hashes[-1])


def kmv_union(a: KMVSketch, b: KMVSketch) -> float:
    return kmv_distinct(kmv_merge([a, b]))


def kmv_jaccard(a: KMVSketch, b: KMVSketch) -> float:
    """J(A,B) estimate: among the union sketch's values (a uniform
    sample of A ∪ B), the fraction present in both input sketches."""
    u = kmv_merge([a, b])
    if not u.hashes:
        return 0.0
    sa, sb = set(a.hashes), set(b.hashes)
    both = sum(1 for h in u.hashes if h in sa and h in sb)
    return both / len(u.hashes)


def kmv_intersection(a: KMVSketch, b: KMVSketch) -> float:
    return kmv_jaccard(a, b) * kmv_union(a, b)
