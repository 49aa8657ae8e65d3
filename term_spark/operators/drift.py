"""Distribution-drift scores beyond PSI: two-sample Kolmogorov–Smirnov,
categorical chi-squared (reported with Cramér's V), and Jensen–Shannon
divergence.

Parity: the reference ships PSI-style snapshot comparison through its
anomaly/metrics layer (term-guard/src/analyzers/mod.rs history
detectors); KS/χ²/JS are the standard companions every monitoring
stack pairs with it (statistics.population_stability holds the PSI
implementation — same bucket helper, same two-snapshot shape).

Scale shape, shared by all three:
- one grouped count per side, keyed by distinct value / category /
  bucket (partial-aggregated map-side, so the shuffle carries one row
  per key per partition at most);
- a full-outer join of the two key-count tables;
- a scalar reduction.
Row count never crosses the wire — only the key table does.  For KS
the key table is the distinct-value set, so the cumulative-sum window
(necessarily a single ordered pass) runs over |distinct values| rows,
not |data| rows; for genuinely continuous high-cardinality columns
pass ``bins``/``lo``/``hi`` to pre-quantize to a bounded key set, the
same trade every engine makes.
"""

from __future__ import annotations

from typing import Optional

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..core.constraint import Constraint
from ..session import local_df
from ..core.result import ConstraintResult
from ..functions.security import validate_identifier
from .statistics import psi_bucket


def _two_sided_counts(ref: DataFrame, cur: DataFrame, column: str,
                      key: "F.Column") -> DataFrame:
    """Grouped counts per key for both snapshots, full-outer joined:
    (k, n_ref, n_cur) with absent keys as 0."""
    def side(df, name):
        return (df.filter(F.col(column).isNotNull())
                  .groupBy(key.alias("k"))
                  .agg(F.count(F.lit(1)).alias(name)))
    return (side(ref, "n_ref").join(side(cur, "n_cur"), "k", "full_outer")
            .select("k",
                    F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
                    F.coalesce("n_cur", F.lit(0)).alias("n_cur")))


def ks_statistic(ref: DataFrame, cur: DataFrame, column: str,
                 bins: Optional[int] = None, lo: Optional[float] = None,
                 hi: Optional[float] = None) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic:
    sup_v |F_ref(v) − F_cur(v)| over the pooled empirical CDFs.

    Exact because the supremum over all reals is attained at an
    observed value, so evaluating both CDFs at every distinct value is
    the complete search space.  The cumulative sums run as a
    partition-parallel prefix-sum over the distinct-value table (the
    grouped counts already collapsed the data; no stage funnels rows
    through a single ordered task); with ``bins``+``lo``+``hi`` the
    values are first quantized to equi-width buckets, bounding the
    key set for continuous columns (the KS of the quantized CDFs — a
    lower bound on the exact statistic, like any histogram sketch).

    Returns one row: n_ref, n_cur, ks (rounded 6).
    """
    col = F.col(column).cast("double")
    if bins is not None:
        if lo is None or hi is None:
            raise ValueError("ks_statistic: bins requires explicit lo/hi")
        if float(hi) <= float(lo):
            raise ValueError(
                f"ks_statistic({column!r}): hi ({hi}) must exceed lo ({lo})")
        key = psi_bucket(col, float(lo), (float(hi) - float(lo)) / bins, bins)
    else:
        key = col
    counts = _two_sided_counts(ref, cur, column, key)
    cdf, tot_ref, tot_cur = _distributed_cdf(counts)
    return cdf.agg(
        F.max(F.lit(tot_ref).cast("bigint")).alias("n_ref"),
        F.max(F.lit(tot_cur).cast("bigint")).alias("n_cur"),
        F.round(F.max(F.abs(F.col("cdf_ref") - F.col("cdf_cur"))), 6).alias("ks"))


def _distributed_cdf(counts: DataFrame):
    """Pooled empirical CDFs of a (k, n_ref, n_cur) count table as
    ``(df(k, cdf_ref, cdf_cur, next_k), tot_ref, tot_cur)``.

    Cumulative counts WITHOUT Window.orderBy(k)'s single-task funnel:
    range-repartition the key-count table, collect per-partition
    subtotals (≤ num_partitions rows — bounded at any scale), broadcast
    the exclusive offsets back, and finish with a window partitioned BY
    partition id — the same distributed prefix-sum Spearman's rank uses
    (entropy._rank_map), with both sides riding one pass.
    localCheckpoint, not persist: range boundaries are sampled per
    execution, and the offsets job and the window job must see the
    same partition assignment.

    ``next_k`` is each row's successor key (NULL for the global last):
    the within-partition LEAD falls back to the next partition's min
    key, threaded through the same bounded collect — so run-length
    consumers (``wasserstein_1``) stay free of global ordered windows
    too.
    """
    ktype = counts.schema["k"].dataType.simpleString()
    parts = (counts.repartitionByRange(F.col("k"))
                   .withColumn("pid", F.spark_partition_id())
                   .localCheckpoint(eager=True))
    rows = (parts.groupBy("pid")
                 .agg(F.sum("n_ref").alias("t_ref"),
                      F.sum("n_cur").alias("t_cur"),
                      F.min("k").alias("k_min")).collect())
    totals = {r["pid"]: (r["t_ref"], r["t_cur"], r["k_min"]) for r in rows}
    pids = sorted(totals)
    offs, acc_r, acc_c = [], 0, 0
    for i, pid in enumerate(pids):
        nxt = totals[pids[i + 1]][2] if i + 1 < len(pids) else None
        offs.append((int(pid), int(acc_r), int(acc_c), nxt))
        acc_r += totals[pid][0]
        acc_c += totals[pid][1]
    tot_ref, tot_cur = acc_r, acc_c
    spark = counts.sparkSession
    off_df = local_df(
        spark, offs or [(0, 0, 0, None)],
        f"pid int, off_ref bigint, off_cur bigint, part_next_k {ktype}")
    w = (Window.partitionBy("pid").orderBy("k")
               .rowsBetween(Window.unboundedPreceding, 0))
    lead_w = Window.partitionBy("pid").orderBy("k")
    cdf = (parts.join(F.broadcast(off_df), "pid")
                .select(
        "k",
        ((F.col("off_ref") + F.sum("n_ref").over(w)) /
         F.lit(float(tot_ref) if tot_ref else None)).alias("cdf_ref"),
        ((F.col("off_cur") + F.sum("n_cur").over(w)) /
         F.lit(float(tot_cur) if tot_cur else None)).alias("cdf_cur"),
        F.coalesce(F.lead("k", 1).over(lead_w),
                   F.col("part_next_k")).alias("next_k")))
    return cdf, tot_ref, tot_cur


def chi_squared_drift(ref: DataFrame, cur: DataFrame, column: str,
                      eps: float = 1e-6) -> DataFrame:
    """Categorical drift: goodness-of-fit χ² of the current snapshot
    against the reference's category distribution, reported alongside
    Cramér's V = sqrt(χ² / (n_cur · (k−1))) ∈ [0, 1].

    V is the thresholdable metric — χ² itself grows linearly with
    n_cur, so no fixed cutoff survives a 100× scale-up (the same
    reason Benford uses TVD, not a χ² p-value).  Reference shares are
    floored at ``eps`` so categories newly appearing in ``cur`` score
    as drift instead of dividing by zero.

    Returns one row: n_ref, n_cur, n_categories, chi2, cramers_v.
    """
    counts = _two_sided_counts(ref, cur, column, F.col(column))
    tot = Window.partitionBy()
    shares = counts.select(
        "n_ref", "n_cur",
        F.greatest(F.col("n_ref") / F.sum("n_ref").over(tot),
                   F.lit(eps)).alias("p_ref"),
        (F.sum("n_cur").over(tot)).alias("tot_cur"))
    cells = shares.select(
        "n_ref", "n_cur",
        (F.col("p_ref") * F.col("tot_cur")).alias("expected"))
    agg = cells.agg(
        F.sum("n_ref").alias("n_ref"),
        F.sum("n_cur").alias("n_cur"),
        F.count(F.lit(1)).alias("n_categories"),
        F.sum(F.pow(F.col("n_cur") - F.col("expected"), 2) /
              F.col("expected")).alias("chi2_raw"))
    return agg.select(
        "n_ref", "n_cur", "n_categories",
        F.round("chi2_raw", 6).alias("chi2"),
        F.round(F.sqrt(F.col("chi2_raw") /
                       (F.col("n_cur") *
                        F.greatest(F.col("n_categories") - 1, F.lit(1)))),
                6).alias("cramers_v"))


def js_divergence(ref: DataFrame, cur: DataFrame, column: str,
                  bins: int = 10, lo: float = None, hi: float = None) -> DataFrame:
    """Jensen–Shannon divergence between two snapshots over equi-width
    buckets — PSI's bounded, symmetric sibling: with log base 2 it
    lives in [0, 1], is finite even for disjoint supports (no eps
    smoothing needed — the p·log(p/m) terms vanish at p = 0 since m
    stays positive wherever either side has mass), and its square root
    is a metric.

    Same shape as population_stability: two bins-bounded grouped
    counts + a tiny full-outer join + a scalar reduction.  ``lo``/``hi``
    fix the bucket domain (pass them — deriving costs a min/max scan
    of both sides, statistics.population_stability documents the same
    trade).

    Returns one row: n_ref, n_cur, js (rounded 6).
    """
    if lo is None or hi is None:
        raise ValueError("js_divergence: pass explicit lo/hi (the bucket "
                         "domain); deriving them costs a full min/max scan "
                         "of both snapshots")
    if float(hi) <= float(lo):
        raise ValueError(
            f"js_divergence({column!r}): hi ({hi}) must exceed lo ({lo})")
    width = (float(hi) - float(lo)) / bins
    key = psi_bucket(F.col(column).cast("double"), float(lo), width, bins)
    counts = _two_sided_counts(ref, cur, column, key)
    tot = Window.partitionBy()
    shares = counts.select(
        "n_ref", "n_cur",
        (F.col("n_ref") / F.sum("n_ref").over(tot)).alias("p"),
        (F.col("n_cur") / F.sum("n_cur").over(tot)).alias("q"))
    m = (F.col("p") + F.col("q")) / 2
    term = (F.when(F.col("p") > 0,
                   F.col("p") * F.log2(F.col("p") / m)).otherwise(F.lit(0.0)) +
            F.when(F.col("q") > 0,
                   F.col("q") * F.log2(F.col("q") / m)).otherwise(F.lit(0.0)))
    return shares.agg(
        F.sum("n_ref").alias("n_ref"),
        F.sum("n_cur").alias("n_cur"),
        F.round(F.sum(term) / 2, 6).alias("js"))


def wasserstein_1(ref: DataFrame, cur: DataFrame, column: str,
                  bins: int = 10, lo: float = None,
                  hi: float = None) -> DataFrame:
    """Wasserstein-1 (earth mover's) distance between two snapshots
    over equi-width buckets — the drift score that, unlike PSI/JS/KS,
    weighs HOW FAR probability mass moved, not just how much: a shift
    of every value by one bucket and a shift by nine buckets have the
    same KS but 9× the W1.  Completes the drift family
    (PSI/KS/χ²/JS + W1), the usual monitoring quintet.

    For binned 1-D distributions the closed form is
    ``W1 = width · Σ_b |CDF_ref(b) − CDF_cur(b)|`` — reported in
    COLUMN UNITS (``w1``, "the average value moved by this much") and
    normalized to the domain (``w1_norm`` = w1 / (hi − lo) ∈ [0, 1],
    the thresholdable form that survives a unit change).

    ``lo``/``hi`` fix the shared bucket domain (required, same trade
    as js_divergence).  Shape: two bins-bounded grouped counts +
    full-outer join + a cumulative sum over ≤``bins`` rows (bounded at
    any data scale — the single-partition window runs on the bucket
    table, never the data).

    Returns one row: n_ref, n_cur, w1, w1_norm (rounded 6).
    """
    if lo is None or hi is None:
        raise ValueError("wasserstein_1: pass explicit lo/hi (the bucket "
                         "domain); deriving them costs a full min/max scan "
                         "of both snapshots")
    if float(hi) <= float(lo):
        raise ValueError(
            f"wasserstein_1({column!r}): hi ({hi}) must exceed lo ({lo})")
    width = (float(hi) - float(lo)) / bins
    key = psi_bucket(F.col(column).cast("double"), float(lo), width, bins)
    counts = _two_sided_counts(ref, cur, column, key)
    # Buckets empty on BOTH sides are absent from the counts table, but
    # the CDF difference persists across them — weight each present
    # bucket's |ΔCDF| by its run length (gap to the next present bucket
    # index).  The CDFs and the successor key both come from the
    # distributed prefix-sum (no global ordered window, same as KS).
    cdf, tot_ref, tot_cur = _distributed_cdf(counts)
    run = F.coalesce("next_k", F.lit(bins)) - F.col("k")
    dist = F.sum(F.abs(F.col("cdf_ref") - F.col("cdf_cur")) * run) * width
    return cdf.agg(
        F.max(F.lit(tot_ref).cast("bigint")).alias("n_ref"),
        F.max(F.lit(tot_cur).cast("bigint")).alias("n_cur"),
        F.round(dist, 6).alias("w1"),
        F.round(dist / (float(hi) - float(lo)), 6).alias("w1_norm"))


class KsDriftConstraint(Constraint):
    """``has_stable_distribution(method="ks")``: the two-sample KS
    statistic against a reference snapshot must stay under
    ``max_stat`` (default 0.1 — 10 % of probability mass displaced).

    Self-executing (needs the second DataFrame), like
    DistributionStabilityConstraint; the job is two grouped counts plus
    a distinct-value-sized window.
    """

    name = "ks_drift"

    def __init__(self, column: str, ref_df, max_stat: float = 0.1,
                 bins: Optional[int] = None, lo: Optional[float] = None,
                 hi: Optional[float] = None):
        if max_stat <= 0:
            raise ValueError(f"max_stat must be > 0, got {max_stat}")
        self.column = validate_identifier(column)
        self.ref_df = ref_df
        self.max_stat = float(max_stat)
        self.bins, self.lo, self.hi = bins, lo, hi

    def evaluate(self, ctx) -> ConstraintResult:
        cur = ctx.df(self.table)
        try:
            row = ks_statistic(self.ref_df, cur, self.column,
                               bins=self.bins, lo=self.lo, hi=self.hi).collect()[0]
        except ValueError as e:
            return self._finish(ConstraintResult.error(str(e)))
        if row["ks"] is None or int(row["n_ref"]) == 0 or int(row["n_cur"]) == 0:
            return self._finish(ConstraintResult.error(
                f"ks_drift({self.column}): a snapshot has no non-null rows"))
        ks = float(row["ks"])
        if ks <= self.max_stat:
            return self._finish(ConstraintResult.success(ks))
        return self._finish(ConstraintResult.failure(
            ks, f"ks_drift({self.column}): KS {ks:.4f} vs reference "
                f"({int(row['n_ref'])} rows) exceeds max_stat {self.max_stat}"))


class JsDriftConstraint(Constraint):
    """``has_stable_distribution(method="js")``: Jensen–Shannon
    divergence (log2, ∈ [0,1]) under ``max_js`` (default 0.1)."""

    name = "js_drift"

    def __init__(self, column: str, ref_df, max_js: float = 0.1,
                 bins: int = 10, lo: Optional[float] = None,
                 hi: Optional[float] = None):
        if max_js <= 0:
            raise ValueError(f"max_js must be > 0, got {max_js}")
        self.column = validate_identifier(column)
        self.ref_df = ref_df
        self.max_js = float(max_js)
        self.bins, self.lo, self.hi = bins, lo, hi

    def evaluate(self, ctx) -> ConstraintResult:
        cur = ctx.df(self.table)
        try:
            row = js_divergence(self.ref_df, cur, self.column,
                                bins=self.bins, lo=self.lo, hi=self.hi).collect()[0]
        except ValueError as e:
            return self._finish(ConstraintResult.error(str(e)))
        if row["js"] is None or int(row["n_ref"]) == 0 or int(row["n_cur"]) == 0:
            return self._finish(ConstraintResult.error(
                f"js_drift({self.column}): a snapshot has no non-null rows"))
        js = float(row["js"])
        if js <= self.max_js:
            return self._finish(ConstraintResult.success(js))
        return self._finish(ConstraintResult.failure(
            js, f"js_drift({self.column}): JS divergence {js:.4f} vs "
                f"reference exceeds max_js {self.max_js}"))


class W1DriftConstraint(Constraint):
    """``has_low_wasserstein_drift``: the DOMAIN-NORMALIZED
    Wasserstein-1 distance against a reference snapshot must stay
    under ``max_w1_norm`` (default 0.05 — 5 % of the domain width of
    average displacement)."""

    name = "w1_drift"

    def __init__(self, column: str, ref_df, max_w1_norm: float = 0.05,
                 bins: int = 10, lo: Optional[float] = None,
                 hi: Optional[float] = None):
        if max_w1_norm <= 0:
            raise ValueError(
                f"max_w1_norm must be > 0, got {max_w1_norm}")
        self.column = validate_identifier(column)
        self.ref_df = ref_df
        self.max_w1_norm = float(max_w1_norm)
        self.bins, self.lo, self.hi = bins, lo, hi

    def evaluate(self, ctx) -> ConstraintResult:
        cur = ctx.df(self.table)
        try:
            row = wasserstein_1(self.ref_df, cur, self.column,
                                bins=self.bins, lo=self.lo,
                                hi=self.hi).collect()[0]
        except ValueError as e:
            return self._finish(ConstraintResult.error(str(e)))
        if (row["w1_norm"] is None or int(row["n_ref"]) == 0
                or int(row["n_cur"]) == 0):
            return self._finish(ConstraintResult.error(
                f"w1_drift({self.column}): a snapshot has no non-null rows"))
        w = float(row["w1_norm"])
        if w <= self.max_w1_norm:
            return self._finish(ConstraintResult.success(w))
        return self._finish(ConstraintResult.failure(
            w, f"w1_drift({self.column}): normalized Wasserstein-1 "
               f"{w:.4f} (={float(row['w1']):.4f} column units) vs "
               f"reference exceeds max_w1_norm {self.max_w1_norm}"))


class CategoricalDriftConstraint(Constraint):
    """``has_stable_categories``: Cramér's V of the current category
    distribution vs a reference snapshot must stay under ``max_v``
    (default 0.1 — "small effect" on the classic scale; V is
    scale-stable where raw χ² is not)."""

    name = "categorical_drift"

    def __init__(self, column: str, ref_df, max_v: float = 0.1):
        if max_v <= 0:
            raise ValueError(f"max_v must be > 0, got {max_v}")
        self.column = validate_identifier(column)
        self.ref_df = ref_df
        self.max_v = float(max_v)

    def evaluate(self, ctx) -> ConstraintResult:
        cur = ctx.df(self.table)
        row = chi_squared_drift(self.ref_df, cur, self.column).collect()[0]
        # guard BOTH snapshots: an empty reference would eps-floor every
        # expected count and report an absurd V as a drift *failure*
        # instead of the error outcome KsDrift/JsDrift return for the
        # same degenerate case (ADVICE r5)
        if (row["cramers_v"] is None or int(row["n_cur"]) == 0
                or int(row["n_ref"]) == 0):
            return self._finish(ConstraintResult.error(
                f"categorical_drift({self.column}): a snapshot has no "
                "non-null rows"))
        v = float(row["cramers_v"])
        if v <= self.max_v:
            return self._finish(ConstraintResult.success(v))
        return self._finish(ConstraintResult.failure(
            v, f"categorical_drift({self.column}): Cramér's V {v:.4f} "
               f"(chi2 {float(row['chi2']):.2f} over "
               f"{int(row['n_categories'])} categories) exceeds max_v "
               f"{self.max_v}"))


def population_stability_by(ref: DataFrame, cur: DataFrame, column: str,
                            group_col: str, bins: int = 10,
                            lo: float = None, hi: float = None,
                            eps: float = 1e-6) -> DataFrame:
    """Per-group PSI — the "WHICH segment drifted?" form of
    statistics.population_stability: one PSI row per value of
    ``group_col`` (source, language, country), computed over the same
    equi-width buckets so group scores are comparable.

    ``lo``/``hi`` are required: a shared bucket domain is what makes
    per-group PSIs comparable, and deriving per-group domains would
    cost a full extra scan while silently giving every group different
    buckets.

    A group missing from either snapshot (or with no non-null rows
    there) gets psi NULL — drift against an empty distribution is
    undefined, and eps-flooring it would instead report a huge number
    that buries real drift. Shape: two (group, bucket)-keyed grouped
    counts (partial-aggregated), per-group share windows over
    ≤bins-row partitions, one full-outer join, one per-group agg —
    row count never crosses the wire, only |groups|·bins key rows.
    """
    if lo is None or hi is None:
        raise ValueError("population_stability_by: pass explicit lo/hi "
                         "(the shared bucket domain is what makes "
                         "per-group PSIs comparable)")
    if float(hi) <= float(lo):
        raise ValueError(
            f"population_stability_by({column!r}): hi ({hi}) must exceed "
            f"lo ({lo})")
    width = (float(hi) - float(lo)) / bins
    validate_identifier(column)
    validate_identifier(group_col)

    def bucketed(df, name):
        col = F.col(column).cast("double")
        b = psi_bucket(col, float(lo), width, bins)
        per = (df.filter(col.isNotNull())
                 .groupBy(F.col(group_col).alias("g"), b.alias("bucket"))
                 .agg(F.count(F.lit(1)).alias(f"n_{name}")))
        w = Window.partitionBy("g")
        return per.withColumn(
            name, F.col(f"n_{name}") / F.sum(f"n_{name}").over(w))

    j = (bucketed(ref, "p").join(bucketed(cur, "q"), ["g", "bucket"],
                                 "full_outer")
         .select("g",
                 F.coalesce("n_p", F.lit(0)).alias("n_p"),
                 F.coalesce("n_q", F.lit(0)).alias("n_q"),
                 F.greatest(F.coalesce("p", F.lit(0.0)), F.lit(eps)).alias("p"),
                 F.greatest(F.coalesce("q", F.lit(0.0)), F.lit(eps)).alias("q")))
    agg = j.groupBy(F.col("g").alias(group_col)).agg(
        F.sum("n_p").alias("n_ref"),
        F.sum("n_q").alias("n_cur"),
        F.round(F.sum((F.col("p") - F.col("q")) *
                      F.log(F.col("p") / F.col("q"))), 6).alias("psi_raw"))
    return (agg.select(
        group_col, "n_ref", "n_cur",
        F.when((F.col("n_ref") > 0) & (F.col("n_cur") > 0),
               F.col("psi_raw")).alias("psi"))
        .orderBy(group_col))


class GroupedPsiDriftConstraint(Constraint):
    """``has_stable_distribution_by``: the WORST per-group PSI against
    a reference snapshot must stay under ``max_psi`` — the "no segment
    may drift" gate (a small drifted segment disappears inside the
    corpus-level PSI average; per-group scoring is how it gets
    caught). Failure names the worst group.

    Groups present in only one snapshot have undefined drift (psi
    NULL): ``on_missing='ignore'`` (default) skips them but reports
    the count; ``'fail'`` fails the constraint when any exist.

    Self-executing (needs the second DataFrame). Job shape =
    population_stability_by: two (group, bucket)-keyed grouped counts,
    ≤bins-row per-group windows, one join — |groups|·bins rows total.
    """

    name = "grouped_psi_drift"

    def __init__(self, column: str, group_col: str, ref_df,
                 max_psi: float = 0.25, bins: int = 10,
                 lo: float = None, hi: float = None,
                 on_missing: str = "ignore"):
        if max_psi <= 0:
            raise ValueError(f"max_psi must be > 0, got {max_psi}")
        if on_missing not in ("ignore", "fail"):
            raise ValueError(f"on_missing must be 'ignore' or 'fail', "
                             f"got {on_missing!r}")
        self.column = validate_identifier(column)
        self.group_col = validate_identifier(group_col)
        self.ref_df = ref_df
        self.max_psi = float(max_psi)
        self.bins, self.lo, self.hi = bins, lo, hi
        self.on_missing = on_missing

    def evaluate(self, ctx) -> ConstraintResult:
        cur = ctx.df(self.table)
        try:
            rows = population_stability_by(
                self.ref_df, cur, self.column, self.group_col,
                bins=self.bins, lo=self.lo, hi=self.hi).collect()
        except ValueError as e:
            return self._finish(ConstraintResult.error(str(e)))
        if not rows:
            return self._finish(ConstraintResult.error(
                f"grouped_psi({self.column} by {self.group_col}): "
                "no groups in either snapshot"))
        missing = [r[self.group_col] for r in rows if r["psi"] is None]
        scored = [(float(r["psi"]), r[self.group_col]) for r in rows
                  if r["psi"] is not None]
        if missing and self.on_missing == "fail":
            return self._finish(ConstraintResult.failure(
                None, f"grouped_psi({self.column} by {self.group_col}): "
                      f"{len(missing)} group(s) present in only one "
                      f"snapshot (e.g. {missing[0]!r})"))
        if not scored:
            return self._finish(ConstraintResult.error(
                f"grouped_psi({self.column} by {self.group_col}): no "
                "group present in both snapshots"))
        # key on psi alone: tuple-max would fall through to comparing
        # group values on exact ties, which raises TypeError when the
        # group column contains NULL (review r6)
        worst, worst_group = max(scored, key=lambda t: t[0])
        note = f" ({len(missing)} one-sided group(s) skipped)" if missing else ""
        if worst <= self.max_psi:
            return self._finish(ConstraintResult.success(worst))
        return self._finish(ConstraintResult.failure(
            worst, f"grouped_psi({self.column} by {self.group_col}): "
                   f"group {worst_group!r} PSI {worst:.4f} exceeds "
                   f"max_psi {self.max_psi}{note}"))


def psi_timeline(ref: DataFrame, cur: DataFrame, column: str,
                 time_col: str, bins: int = 10,
                 lo: float = None, hi: float = None,
                 granularity: str = "day", eps: float = 1e-6) -> DataFrame:
    """WHEN did the distribution drift — per-time-bucket PSI of
    ``column`` against one static reference snapshot: the temporal
    sibling of ``population_stability_by`` ("which segment" →
    "which day").  A corpus-level PSI over a month of data averages a
    mid-month shift into noise; the timeline localizes it to the day
    (ingest pipelines: WHICH dump introduced the boilerplate flood;
    serving: WHEN the feature distribution moved).

    Shape: the reference buckets ONCE into ≤ ``bins`` share rows (one
    grouped agg); current rows key by (date_trunc(granularity), bucket)
    — one grouped count, shares via a ≤bins-row window per period; the
    period × reference-bucket frame (|periods| · bins rows, driver
    -trivial) full-outer-joins the current counts so a bucket missing
    from either side eps-floors exactly like every other PSI in the
    module (shared ``psi_bucket``, shared eps convention — streamed,
    grouped, and timeline readings are comparable by construction).
    Periods with zero rows simply don't appear; ``lo``/``hi`` are
    required for the same reason as the grouped form: one shared
    bucket domain is what makes period scores comparable.
    """
    if lo is None or hi is None:
        raise ValueError("psi_timeline: pass explicit lo/hi (the shared "
                         "bucket domain is what makes per-period PSIs "
                         "comparable)")
    if float(hi) <= float(lo):
        raise ValueError(f"psi_timeline({column!r}): hi ({hi}) must "
                         f"exceed lo ({lo})")
    validate_identifier(column)
    validate_identifier(time_col)
    width = (float(hi) - float(lo)) / bins
    col = F.col(column).cast("double")
    b = psi_bucket(col, float(lo), width, bins)

    ref_n = (ref.filter(col.isNotNull())
             .groupBy(b.alias("bucket"))
             .agg(F.count(F.lit(1)).alias("n_p")))
    ref_shares = ref_n.withColumn(
        "p", F.col("n_p") / F.sum("n_p").over(Window.partitionBy()))

    period = F.date_trunc(granularity, F.col(time_col)).alias("period")
    cur_pb = (cur.filter(col.isNotNull())
              .groupBy(period, b.alias("bucket"))
              .agg(F.count(F.lit(1)).alias("n_q")))
    w = Window.partitionBy("period")
    cur_pb = cur_pb.withColumn("q", F.col("n_q") / F.sum("n_q").over(w))

    periods = cur_pb.select("period").distinct()
    frame = periods.crossJoin(F.broadcast(ref_shares))
    j = (frame.join(cur_pb, ["period", "bucket"], "full_outer")
         .select("period",
                 F.coalesce("n_q", F.lit(0)).alias("n_q"),
                 F.greatest(F.coalesce("p", F.lit(0.0)), F.lit(eps))
                 .alias("p"),
                 F.greatest(F.coalesce("q", F.lit(0.0)), F.lit(eps))
                 .alias("q")))
    return (j.groupBy("period")
            .agg(F.sum("n_q").alias("n_cur"),
                 F.round(F.sum((F.col("p") - F.col("q"))
                               * F.log(F.col("p") / F.col("q"))), 6)
                 .alias("psi"))
            .filter(F.col("period").isNotNull())
            .orderBy("period"))


class TimelinePsiDriftConstraint(Constraint):
    """``has_stable_timeline``: the WORST per-period PSI against a
    reference snapshot must stay under ``max_psi`` — the WHEN gate
    beside ``has_stable_distribution_by``'s WHICH: a release cut from
    a month of ingest passes the corpus-level PSI even when one day's
    dump drifted badly; per-period scoring catches the day, and the
    failure message names it.

    Self-executing (needs the reference DataFrame).  Job shape =
    psi_timeline: one ≤bins-row reference agg, one (period, bucket)
    grouped count, a |periods|·bins join frame.
    """

    name = "timeline_psi_drift"

    def __init__(self, column: str, time_col: str, ref_df,
                 max_psi: float = 0.25, bins: int = 10,
                 lo: float = None, hi: float = None,
                 granularity: str = "day"):
        if max_psi <= 0:
            raise ValueError(f"max_psi must be > 0, got {max_psi}")
        self.column = validate_identifier(column)
        self.time_col = validate_identifier(time_col)
        self.ref_df = ref_df
        self.max_psi = float(max_psi)
        self.bins, self.lo, self.hi = bins, lo, hi
        self.granularity = granularity

    def evaluate(self, ctx) -> ConstraintResult:
        cur = ctx.df(self.table)
        try:
            rows = psi_timeline(self.ref_df, cur, self.column,
                                self.time_col, bins=self.bins,
                                lo=self.lo, hi=self.hi,
                                granularity=self.granularity).collect()
        except ValueError as e:
            return self._finish(ConstraintResult.error(str(e)))
        if not rows:
            return self._finish(ConstraintResult.error(
                f"timeline_psi({self.column} by {self.granularity}): "
                "no periods with data in the current snapshot"))
        worst, worst_period = max(
            ((float(r["psi"]), r["period"]) for r in rows),
            key=lambda t: t[0])
        if worst <= self.max_psi:
            return self._finish(ConstraintResult.success(worst))
        return self._finish(ConstraintResult.failure(
            worst, f"timeline_psi({self.column} by {self.granularity}): "
                   f"period {worst_period} PSI {worst:.4f} exceeds "
                   f"max_psi {self.max_psi}"))


# --- Benford first-digit conformance dashboard (round 13) -------------------

#: P(first significant digit = d) = log10(1 + 1/d) — the SAME table
#: statistics.BenfordConstraint gates on (re-exported so dashboard and
#: gate can never disagree on the expectation).
def _benford_expected():
    from .statistics import BenfordConstraint
    return dict(BenfordConstraint.BENFORD_P)


BENFORD_EXPECTED = _benford_expected()


def benford_deviation(df: DataFrame, column: str) -> DataFrame:
    """Per-digit Benford conformance dashboard — the WHICH-DIGIT
    companion to ``statistics.BenfordConstraint``
    (``Check.has_benford_distribution``), the way ``psi_timeline`` is
    the WHEN companion to the PSI gate: the gate reports one TVD
    number; this view shows each digit's observed vs expected share
    and a per-digit verdict, so a failing audit names WHERE the curve
    bent (Benford 1938; Nigrini's audit practice — pasted constants,
    capped fields and unit mix-ups each bend specific digits).

    Shares the family's conventions exactly: digit extraction is
    ``BenfordConstraint.first_digit`` (floor/log10 clamped to 1..9 —
    the clamp absorbs the float-rounding edge at powers of ten) and
    the expected shares are the gate's own literals, not a second
    log10.  ``within_band`` = observed inside the 3σ binomial band
    ± 3·√(p(1−p)/N) around expected — sample-size-aware where the
    gate's TVD threshold is scale-free; the two read together.

    Parity: beyond-reference extension of the drift family — the
    reference's snapshot detectors (term-guard/src/analyzers/mod.rs)
    compare a column to ITS OWN history; Benford compares it to a
    distribution-free prior, so it fires on day one with no reference
    snapshot.  One map-side-combined groupBy over ≤ 9 keys plus a
    1-row count broadcast back onto them — no window, no per-row
    state.
    """
    from .statistics import BenfordConstraint
    validate_identifier(column)
    digit = BenfordConstraint.first_digit(F.col(column))
    base = (df.select(digit.alias("digit"))
              .filter(F.col("digit").isNotNull()))
    counts = (base.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
              .crossJoin(F.broadcast(
                  base.agg(F.count(F.lit(1)).alias("__total")))))
    total = F.col("__total")
    expected = F.element_at(
        F.create_map(*[F.lit(x) for d, p in sorted(BENFORD_EXPECTED.items())
                       for x in (d, p)]),
        F.col("digit"))
    obs = F.col("n") / total
    band = 3.0 * F.sqrt(expected * (1.0 - expected) / total)
    return (counts
            .select(F.col("digit").cast("bigint").alias("digit"), "n",
                    F.round(obs, 6).alias("observed"),
                    F.round(expected, 6).alias("expected"),
                    F.round(F.abs(obs - expected), 6).alias("abs_dev"),
                    (F.abs(obs - expected) <= band).alias("within_band"))
            .orderBy("digit"))
