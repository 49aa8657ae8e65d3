"""Histogram constraints (categorical + equi-width numeric) and the
driver-side Histogram API.

Parity:
- /root/reference/term-guard/src/constraints/histogram.rs:217-241 —
  value_counts GROUP BY col, totals incl. null count attached via CROSS
  JOIN (we use a window-free two-agg form), ORDER BY count DESC;
  Histogram API: most_common_ratio (:50), bucket_count (:60),
  is_roughly_uniform(factor) (:77); assertion = user closure
  (core/check.rs:725-733);
- analyzers/advanced/histogram.rs:185-194,281-291 — numeric equi-width
  buckets via FLOOR((x-min)/width) after a min/max pass.

Scale: groupBy is a two-stage hash aggregate; only ``max_buckets``
rows reach the driver (TakeOrderedAndProject top-k).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, List, Optional

import pyspark.sql.functions as F
from ..session import local_df

from ..core.constraint import Constraint, EngineContext
from ..core.result import ConstraintResult
from ..functions.security import validate_identifier

NULL_BUCKET = "NullValue"


@dataclass
class HistogramBucket:
    value: str
    count: int
    ratio: float


@dataclass
class Histogram:
    buckets: List[HistogramBucket]
    total_count: int

    def most_common_ratio(self) -> float:
        return self.buckets[0].ratio if self.buckets else 0.0

    def bucket_count(self) -> int:
        return len(self.buckets)

    def ratio_of(self, value: str) -> float:
        for b in self.buckets:
            if b.value == value:
                return b.ratio
        return 0.0

    def is_roughly_uniform(self, factor: float = 2.0) -> bool:
        counts = [b.count for b in self.buckets if b.value != NULL_BUCKET]
        if not counts:
            return True
        expected = sum(counts) / len(counts)
        return all(expected / factor <= c <= expected * factor for c in counts)


def compute_histogram(df, column: str, max_buckets: int = 1000) -> Histogram:
    """Categorical histogram: value → count/ratio, NULLs as a bucket."""
    validate_identifier(column)
    rows = (df.groupBy(
                F.coalesce(F.col(column).cast("string"), F.lit(NULL_BUCKET)).alias("value"))
              .agg(F.count(F.lit(1)).alias("cnt"))
              .orderBy(F.desc("cnt"), F.asc("value"))
              .limit(max_buckets)
              .collect())
    total = df.count()
    buckets = [HistogramBucket(r["value"], r["cnt"], r["cnt"] / total if total else 0.0)
               for r in rows]
    return Histogram(buckets, total)


def compute_numeric_histogram(df, column: str, num_buckets: int = 10):
    """Equi-width numeric histogram; one pass for min/max + one groupBy."""
    validate_identifier(column)
    col = F.col(column).cast("double")
    stats = df.agg(F.min(col).alias("mn"), F.max(col).alias("mx"),
                   F.count(col).alias("n")).collect()[0]
    if not stats["n"]:
        return Histogram([], 0), None, None
    mn, mx = float(stats["mn"]), float(stats["mx"])
    width = (mx - mn) / num_buckets if mx > mn else 1.0
    bucket = F.least(F.floor((col - F.lit(mn)) / F.lit(width)),
                     F.lit(num_buckets - 1)).cast("long")
    rows = (df.filter(col.isNotNull())
              .groupBy(bucket.alias("bucket"))
              .agg(F.count(F.lit(1)).alias("cnt"))
              .orderBy("bucket").collect())
    total = int(stats["n"])
    buckets = [HistogramBucket(str(r["bucket"]), r["cnt"], r["cnt"] / total) for r in rows]
    return Histogram(buckets, total), mn, mx


class HistogramConstraint(Constraint):
    """User closure over the computed Histogram (check.rs:725-733)."""

    name = "histogram"

    def __init__(self, column: str, assertion_fn: Callable[[Histogram], bool],
                 description: str = "", max_buckets: int = 1000):
        self.column = validate_identifier(column)
        self.assertion_fn = assertion_fn
        self.description = description
        self.max_buckets = max_buckets

    def evaluate(self, ctx: EngineContext) -> ConstraintResult:
        df = ctx.df(self.table)
        hist = compute_histogram(df, self.column, self.max_buckets)
        if hist.total_count == 0:
            return self._finish(ConstraintResult.skipped())
        try:
            ok = bool(self.assertion_fn(hist))
        except Exception as exc:
            return self._finish(ConstraintResult.error(f"histogram assertion raised: {exc}"))
        metric = hist.most_common_ratio()
        if ok:
            return self._finish(ConstraintResult.success(metric))
        desc = self.description or "histogram assertion"
        return self._finish(ConstraintResult.failure(
            metric,
            f"{desc} failed for {self.column} "
            f"({hist.bucket_count()} buckets, top ratio {metric:.3f})"))


def dominant_value_summary(df, column: str):
    """Exact most-frequent-value accounting WITHOUT collecting a
    histogram: one grouped count + a 1-row struct-max reduction (ties
    broken toward the larger value, so the result is deterministic on
    any executor layout). Returns one row: top_value (native type),
    top_count, total (non-null rows), n_distinct, top_share.

    The default-value-pollution detector: an upstream bug that stamps
    one placeholder into a column shows up as a share spike long
    before averages move. Scale: the groupBy is partial-aggregated on
    the column key; only one row ever reaches the driver."""
    validate_identifier(column)
    col = F.col(column)
    counts = (df.filter(col.isNotNull())
                .groupBy(col.alias("v"))
                .agg(F.count(F.lit(1)).alias("n")))
    return (counts.agg(F.max(F.struct(F.col("n"), F.col("v"))).alias("top"),
                       F.sum("n").alias("total"),
                       F.count(F.lit(1)).alias("n_distinct"))
            .select(F.col("top.v").alias("top_value"),
                    F.col("top.n").alias("top_count"),
                    "total", "n_distinct",
                    F.round(F.col("top.n") / F.col("total"), 6)
                     .alias("top_share")))


class DominantValueConstraint(Constraint):
    """``has_no_dominant_value``: the share of the single most frequent
    non-null value must not exceed ``max_share`` (default 0.9)."""

    name = "dominant_value"

    def __init__(self, column: str, max_share: float = 0.9):
        if not (0.0 < max_share <= 1.0):
            raise ValueError(f"max_share must be in (0,1], got {max_share}")
        self.column = validate_identifier(column)
        self.max_share = float(max_share)

    def evaluate(self, ctx: EngineContext) -> ConstraintResult:
        rows = dominant_value_summary(ctx.df(self.table), self.column).collect()
        if not rows or rows[0]["top_share"] is None:
            return self._finish(ConstraintResult.skipped(
                f"dominant_value({self.column}): no non-null values"))
        row = rows[0]
        share = float(row["top_share"])
        if share <= self.max_share:
            return self._finish(ConstraintResult.success(share))
        return self._finish(ConstraintResult.failure(
            share,
            f"dominant_value({self.column}): value {row['top_value']!r} "
            f"covers {share:.2%} of {int(row['total'])} non-null rows "
            f"({int(row['n_distinct'])} distinct), exceeding max_share "
            f"{self.max_share}"))


def frequent_items_summary(df, column: str, k: int = 100):
    """Mergeable heavy-hitter summary of one data slice (a day, a
    shard, a source): the slice's EXACT top-``k`` items by count plus
    the two scalars a later merge needs — ``n_slice`` (slice row
    count) and ``max_dropped`` (the count of the largest item that did
    NOT make the top-k; 0 when cardinality ≤ k, making the summary
    exact).

    Returns (item, cnt, rank, n_slice, max_dropped) — k+ rows, the
    "state in a table" posture of the bucket-distribution analyzer:
    a summary that persists to the metrics repository and merges
    across slices WITHOUT rescanning them (``merge_frequent_items``),
    with the Misra-Gries/SpaceSaving-style guarantee that any item's
    true total lies within the merged bounds.

    Scale: one two-stage hash aggregate + a bounded top-(k+1)
    (TakeOrderedAndProject); only k+1 rows leave the executors.
    NULLs are excluded (they are completeness's finding, not a
    frequent item).
    """
    if k <= 0:
        raise ValueError(f"k must be > 0, got {k}")
    validate_identifier(column)
    counts = (df.filter(F.col(column).isNotNull())
                .groupBy(F.col(column).cast("string").alias("item"))
                .agg(F.count(F.lit(1)).alias("cnt"))
                .localCheckpoint(eager=True))  # reused: top-k + total
    # k+1: the extra row IS the error witness (largest dropped count)
    top = counts.orderBy(F.desc("cnt"), "item").limit(k + 1).collect()
    # slice total from the ALREADY-SHUFFLED count table (cardinality
    # rows), not a second scan of the raw slice
    n_slice = counts.agg(F.sum("cnt")).collect()[0][0] or 0
    max_dropped = int(top[k]["cnt"]) if len(top) > k else 0
    spark = df.sparkSession
    rows = [(r["item"], int(r["cnt"]), i + 1, int(n_slice), max_dropped)
            for i, r in enumerate(top[:k])]
    return local_df(
        spark, rows,
        "item string, cnt bigint, rank int, n_slice bigint, "
        "max_dropped bigint")


def merge_frequent_items(summaries, k: int = 100):
    """Merge per-slice ``frequent_items_summary`` tables into the
    union's top-``k`` WITH count bounds — no rescan of any slice.

    For each item: ``cnt_lower`` = Σ counts where the item made the
    slice top-k; ``cnt_upper`` = cnt_lower + Σ ``max_dropped`` of the
    slices where it did NOT appear (it may have been just under the
    bar there).  True count ∈ [cnt_lower, cnt_upper] always — the
    standard mergeable-summary guarantee; a caller sees exactly how
    much the summarization could have cost (``cnt_upper − cnt_lower``
    = 0 means the merged ranking is provably exact).

    Pure driver arithmetic over k·|slices| rows — the same
    no-rescan posture as ``psi_between_states``.
    """
    if not summaries:
        raise ValueError("merge_frequent_items: no summaries")
    slice_info = []   # (max_dropped, items_present)
    totals = {}
    for s in summaries:
        rows = s.collect() if hasattr(s, "collect") else list(s)
        md = int(rows[0]["max_dropped"]) if rows else 0
        present = set()
        for r in rows:
            totals[r["item"]] = totals.get(r["item"], 0) + int(r["cnt"])
            present.add(r["item"])
        slice_info.append((md, present))
    out = []
    for item, lower in totals.items():
        upper = lower + sum(md for md, present in slice_info
                            if item not in present)
        out.append((item, lower, upper))
    out.sort(key=lambda t: (-t[1], t[0]))
    return out[:k]


def equidepth_histogram(df, column: str, buckets: int = 10) -> "DataFrame":
    """Equi-depth (quantile-bucketed) histogram — the companion to
    ``compute_numeric_histogram``'s equi-width view: bucket EDGES are
    the exact interpolated percentiles at i/buckets, so each bucket
    holds ~1/buckets of the rows and heavy tails stop collapsing into
    one mega-bucket (the reading equi-width gives a log-normal).

    Parity: extends the reference's histogram analyzer family
    (term-guard/src/analyzers/advanced/histogram.rs holds the
    equi-width/categorical forms); equi-depth is the standard
    companion every profiler pairs with it.

    Exactness contract: edges use Spark's exact ``percentile`` —
    interpolation at rank (n−1)p, the SAME arithmetic DuckDB's
    ``quantile_cont`` uses (pinned by the quantile_exact_quantity
    driver row) — so an oracle replays edges AND counts bit-for-bit.
    Buckets are [edge_i, edge_{i+1}) with the last bucket closed.

    Shape: one exact-percentile aggregate (a sort-based single pass
    per Spark's percentile implementation over the column only), then
    the edges return as ≤ buckets+1 DRIVER-SIDE LITERALS folded into
    one codegen CASE — the second pass is a map-only bucket id + a
    ≤ buckets-key grouped count.  For 100 TB-scale columns where the
    exact sort is too hot, the quantile-sketch tier
    (analyzers/quantile_index.py) serves approximate edges from
    persisted grids; this operator is the exact, oracle-checkable
    form.

    Returns (bucket, lo, hi, n, share) ordered by bucket; degenerate
    distributions (all values equal) collapse to one bucket.
    """
    validate_identifier(column)
    if buckets < 2:
        raise ValueError(f"buckets must be >= 2, got {buckets}")
    col = F.col(column).cast("double")
    # NaN passes an isNotNull filter yet compares false against every
    # span (r13 advice): filter it with NULLs in BOTH passes so the
    # two passes see the same population and n/share can't undercount
    clean = df.filter(col.isNotNull() & ~F.isnan(col))
    probs = [i / buckets for i in range(buckets + 1)]
    row = (clean
           .agg(F.expr(f"percentile({column}, array({', '.join(map(repr, probs))}))")
                .alias("edges"),
                F.count(F.lit(1)).alias("n")).collect()[0])
    total = int(row["n"])
    spark = df.sparkSession
    if not total:
        return local_df(
            spark, [],
            "bucket bigint, lo double, hi double, n bigint, share double")
    edges = [float(e) for e in row["edges"]]
    # all `buckets` half-open spans, last closed: repeated edges
    # (discrete data) yield empty [x, x) spans that match nothing, and
    # since sorted half-open spans never overlap the first-match CASE
    # below assigns exactly what an oracle's range join assigns
    spans = [(edges[i], edges[i + 1]) for i in range(buckets)]
    bucket = None
    for i, (lo, hi) in enumerate(spans):
        cond = (col >= F.lit(lo)) & (
            col <= F.lit(hi) if i == len(spans) - 1 else col < F.lit(hi))
        bucket = F.when(cond, F.lit(i)) if bucket is None \
            else bucket.when(cond, F.lit(i))
    # ≤ buckets+1 grouped rows: collect them so rows that matched NO
    # span (a non-deterministic source shifting values outside
    # [min,max] between the percentile pass and this one) surface as a
    # loud error instead of a silent undercount (r13 advice)
    counts = {r["bucket"]: int(r["n"])
              for r in (clean.select(bucket.alias("bucket"))
                        .groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
                        .collect())}
    unmatched = counts.pop(None, 0)
    if unmatched or sum(counts.values()) != total:
        raise ValueError(
            f"equidepth_histogram({column}): bucketed counts "
            f"({sum(counts.values())} + {unmatched} unmatched) != total "
            f"{total} — the source changed between the percentile pass "
            "and the count pass (non-deterministic input); checkpoint "
            "or cache the input and retry")
    out = local_df(
        spark, [(i, lo, hi, counts.get(i, 0))
                for i, (lo, hi) in enumerate(spans)],
        "bucket bigint, lo double, hi double, n bigint")
    # share rounds in Spark (HALF_UP) so the result is bit-identical
    # to the pre-r14 broadcast-join form the driver oracle pinned
    return (out.select("bucket", "lo", "hi", "n",
                       F.round(F.col("n") / F.lit(float(total)), 6)
                       .alias("share"))
            .orderBy("bucket"))


def equidepth_histogram_from_index(df, column: str, index_path: str,
                                   buckets: int = 10,
                                   attest: bool = True) -> "DataFrame":
    """Equi-depth histogram served from the PERSISTED QUANTILE-GRID
    tier (analyzers/quantile_index.py) — the approximate fast path
    ``equidepth_histogram``'s docstring promises for columns too hot
    for the exact percentile sort (r13 verdict ask #5, now a code
    path): bucket EDGES come from a kilobyte index probe (the corpus
    is never rescanned for the percentile pass), bucket COUNTS stay
    EXACT — one map-only codegen CASE + a <= buckets-key grouped count
    over ``df``, the only full pass this form makes.

    Robustness at the extremes: only the INTERIOR edges gate bucket
    membership — bucket 0 is ``col < edge_1`` and the last bucket is
    ``col >= edge_{b-1}`` — so sketch rank error at p=0/p=1 can never
    drop a row; every non-NULL/non-NaN row lands in exactly one bucket
    and Σn equals the exact population STRUCTURALLY: counts are
    differences of cumulative ``count_if(col < edge)`` aggregates, so
    they telescope to the exact clean population by construction.  The
    displayed lo/hi are the probed estimates, including the p=0/p=1
    ones.

    Attestation (``attest=True``): each edge's estimate is rank-checked
    against ``df`` with ``quantile_index_report``'s exact arithmetic —
    the normalized rank of the estimate inside the exact data must land
    within the tier's two-merge-level bound 2*(2/k + 1/accuracy) of the
    requested prob — and each bucket row carries ``edge_within_bound``
    (both of its edges attested).  A lost shard, double append, or
    wrong merge trips it loudly.  The rank check and the bucket counts
    share ONE fused map-side-combined aggregation over ``df`` (r15:
    the rank numerators ``count_if(col < edge)`` at the interior edges
    ARE the cumulative bucket counts, so attestation adds no second
    pass); edges come from a driver-side merge of the kilobyte grid
    rows — the corpus is never scanned for the percentile pass.

    Returns (bucket, lo, hi, n, share[, edge_within_bound]) ordered by
    bucket; empty input returns an empty frame of the same schema.
    """
    from ..analyzers.quantile_index import _bound, _merged_states, _NO_GROUP

    validate_identifier(column)
    if buckets < 2:
        raise ValueError(f"buckets must be >= 2, got {buckets}")
    spark = df.sparkSession
    probs = [i / buckets for i in range(buckets + 1)]
    # refuse a GROUPED index up front: a grouped index returns one
    # estimate per (group, p) — taking them un-keyed would silently
    # blend groups (duplicate p keys, last group wins).  Per-group
    # histograms need per-group exact counts too; refuse rather than
    # guess.
    meta, ana, merged = _merged_states(spark, index_path)
    if meta["group_col"]:
        raise ValueError(
            f"equidepth_histogram_from_index: the index at {index_path} "
            f"is GROUPED (group_col={meta['group_col']!r}) — probe an "
            "ungrouped index, or build per-group histograms by filtering "
            "df to one group and building an ungrouped index over that "
            "slice")
    if (_NO_GROUP, column) not in merged:
        raise ValueError(
            f"equidepth_histogram_from_index: column {column!r} is not "
            f"tracked by the index at {index_path}")
    st, _n_shards = merged[(_NO_GROUP, column)]
    edges = [float(ana.quantile_from_state(st, float(p))) for p in probs]
    tol = 2.0 * _bound(int(meta["k"]), int(meta["accuracy"]))

    col = F.col(column).cast("double")
    # ONE pass: cumulative strict-below counts at every edge (bucket
    # counts by first-match semantics: NaN compares false, so the
    # cumulative counts are over exactly the clean rows the old CASE
    # path bucketed), at-or-below counts + the non-null population for
    # the rank attestation, and the clean population for the last
    # bucket / shares.
    aggs = [F.count_if(col < F.lit(e)).alias(f"__lt_{k}")
            for k, e in enumerate(edges)]
    if attest:
        aggs += [F.count_if(col <= F.lit(e)).alias(f"__le_{k}")
                 for k, e in enumerate(edges)]
        aggs.append(F.count(col).alias("__nv"))
    aggs.append(F.count_if(col.isNotNull() & ~F.isnan(col)).alias("__nc"))
    r = df.agg(*aggs).collect()[0]
    n_clean = int(r["__nc"])
    counts = {}
    for i in range(buckets):
        hi_cum = (int(r[f"__lt_{i + 1}"]) if i < buckets - 1 else n_clean)
        counts[i] = hi_cum - (int(r[f"__lt_{i}"]) if i > 0 else 0)
    if attest:
        nv = int(r["__nv"])
        edge_ok = [
            bool(nv > 0
                 and int(r[f"__lt_{k}"]) / nv - tol <= p
                 and p <= int(r[f"__le_{k}"]) / nv + tol)
            for k, p in enumerate(probs)]
    else:
        edge_ok = [None] * len(probs)
    total = n_clean
    schema = ("bucket bigint, lo double, hi double, n bigint, share double"
              + (", edge_within_bound boolean" if attest else ""))
    if not total:
        return local_df(spark, [], schema)
    base = local_df(
        spark, [(i, edges[i], edges[i + 1], counts.get(i, 0))
         + ((bool(edge_ok[i] and edge_ok[i + 1]),) if attest else ())
         for i in range(buckets)],
        schema.replace(", share double", ""))
    out = base.select(
        "bucket", "lo", "hi", "n",
        F.round(F.col("n") / F.lit(float(total)), 6).alias("share"),
        *(["edge_within_bound"] if attest else []))
    return out.orderBy("bucket")


def equidepth_histograms_by_group(df, column: str, index_path: str,
                                  buckets: int = 10,
                                  attest: bool = True) -> "DataFrame":
    """Per-GROUP equi-depth histograms served from a GROUPED
    quantile-grid index (round 14 — the per-source companion of
    ``equidepth_histogram_from_index``: "document-length distribution
    per crawl" without one exact percentile sort per source): each
    group's bucket edges come from its own grid probe, counts stay
    EXACT via one broadcast span join + a (group × buckets)-key
    grouped count over ``df``.

    Bucket membership uses each group's INTERIOR edges only — bucket 0
    is unbounded below and the last bucket unbounded above, so sketch
    rank error at p=0/1 can never drop a row and each group's Σn is
    its exact population.  Repeated edges (discrete data) leave empty
    middle buckets, matching the ungrouped form's semantics.

    The per-group probe table is O(groups × buckets) driver-side rows —
    the same bounded-groups shape as every grouped probe in the tier
    (the index itself is O(shards × groups × columns) driver-merged
    rows).  The group column name comes from the index meta, so df
    must carry it.

    Counts, rank attestation and a coverage audit share ONE fused
    map-side-combined aggregation over ``df`` (r15: per group, the
    rank numerators ``count_if(col < edge)`` at the interior edges ARE
    the cumulative bucket counts — the shape of the ungrouped form).
    Per-group Σn equals the group's exact clean population
    structurally (cumulative counts telescope).  Rows whose group
    exists in ``df`` but NOT in the grouped index raise loudly (they
    have no edges to bucket against; silently dropping them would
    undercount the corpus) — the audit rides the same single pass.

    Returns (grp, bucket, lo, hi, n, share[, edge_within_bound])
    ordered by (grp, bucket); groups present in the index but absent
    from ``df`` report n=0 rows.
    """
    from ..analyzers.quantile_index import _bound, _merged_states

    validate_identifier(column)
    if buckets < 2:
        raise ValueError(f"buckets must be >= 2, got {buckets}")
    spark = df.sparkSession
    meta, ana, merged = _merged_states(spark, index_path)
    gcol = meta["group_col"]
    if not gcol:
        raise ValueError(
            f"equidepth_histograms_by_group: the index at {index_path} is "
            "UNGROUPED — use equidepth_histogram_from_index")
    probs = [i / buckets for i in range(buckets + 1)]
    groups = sorted(g for (g, c) in merged if c == column)
    if not groups:
        raise ValueError(
            f"equidepth_histograms_by_group: column {column!r} is not "
            f"tracked by the index at {index_path}")
    edges_by_g = {}
    for g in groups:
        st, _n_shards = merged[(g, column)]
        edges_by_g[g] = [float(ana.quantile_from_state(st, float(p)))
                         for p in probs]
    tol = 2.0 * _bound(int(meta["k"]), int(meta["accuracy"]))

    col = F.col(column).cast("double")
    gstr = F.col(gcol).cast("string")
    aggs = []
    for gi, g in enumerate(groups):
        gmatch = gstr == F.lit(g)
        for k, e in enumerate(edges_by_g[g]):
            aggs.append(F.count_if(gmatch & (col < F.lit(e)))
                        .alias(f"__lt_{gi}_{k}"))
            if attest:
                aggs.append(F.count_if(gmatch & (col <= F.lit(e)))
                            .alias(f"__le_{gi}_{k}"))
        if attest:
            aggs.append(F.count(F.when(gmatch, col)).alias(f"__nv_{gi}"))
        aggs.append(F.count_if(gmatch & col.isNotNull() & ~F.isnan(col))
                    .alias(f"__nc_{gi}"))
    # coverage audit: clean rows whose group the index does not track
    aggs.append(F.count_if(col.isNotNull() & ~F.isnan(col)
                           & gstr.isNotNull()
                           & ~gstr.isin(list(groups)))
                .alias("__n_unindexed"))
    r = df.agg(*aggs).collect()[0]
    if int(r["__n_unindexed"]):
        raise ValueError(
            f"equidepth_histograms_by_group: {int(r['__n_unindexed'])} "
            f"clean rows of {column!r} belong to groups absent from the "
            f"index at {index_path} — rebuild or append the index to "
            "cover them (bucketing them against another group's edges "
            "would be wrong, and dropping them would undercount)")

    out_rows = []
    for gi, g in enumerate(groups):
        n_clean = int(r[f"__nc_{gi}"])
        edges = edges_by_g[g]
        if attest:
            nv = int(r[f"__nv_{gi}"])
            ok = [bool(nv > 0
                       and int(r[f"__lt_{gi}_{k}"]) / nv - tol <= p
                       and p <= int(r[f"__le_{gi}_{k}"]) / nv + tol)
                  for k, p in enumerate(probs)]
        for i in range(buckets):
            hi_cum = (int(r[f"__lt_{gi}_{i + 1}"]) if i < buckets - 1
                      else n_clean)
            n = hi_cum - (int(r[f"__lt_{gi}_{i}"]) if i > 0 else 0)
            row = (g, i, edges[i], edges[i + 1], n, n_clean)
            if attest:
                row += (bool(ok[i] and ok[i + 1]),)
            out_rows.append(row)
    schema = ("grp string, bucket bigint, lo double, hi double, "
              "n bigint, __tot bigint"
              + (", edge_within_bound boolean" if attest else ""))
    # share rounds in Spark (HALF_UP — F.round), exactly as before r15
    return (local_df(spark, out_rows, schema)
            .select("grp", "bucket", "lo", "hi", "n",
                    F.when(F.col("__tot") > 0,
                           F.round(F.col("n") / F.col("__tot"), 6))
                    .otherwise(F.lit(0.0)).alias("share"),
                    *(["edge_within_bound"] if attest else []))
            .orderBy("grp", "bucket"))
