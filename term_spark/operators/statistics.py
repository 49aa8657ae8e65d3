"""Statistical constraints: min/max/mean/sum/stddev/variance/median/
percentile, multi-statistic single pass, approx count distinct,
correlation and covariance.

Parity:
- /root/reference/term-guard/src/constraints/statistics.rs:45-74
  (StatisticalConstraint: MIN/MAX/AVG/SUM/STDDEV/VARIANCE sample
  semantics, APPROX_PERCENTILE_CONT for median/percentile);
- constraints/mod.rs:226 MultiStatisticalConstraint — all requested
  stats in ONE SELECT (native here: aliases merge into the shared agg);
- constraints/approx_count_distinct.rs:64 (HyperLogLog, 2-3% error);
- constraints/correlation.rs:260-274 (CORR / COVAR_SAMP);
- constraints/quantile.rs:21-25,228-258 (approx/exact/auto modes —
  reference "exact" falls back to approx; we implement a true exact
  mode via Spark's ``percentile``).

Scale: every metric here is a partial-aggregatable expression — one
shared scan, map-side combine, bytes-sized shuffle.
"""

from __future__ import annotations

import math
from typing import Dict, Mapping, Optional

import pyspark.sql.functions as F

from ..core.assertion import Assertion
from ..core.constraint import Constraint, metric_alias
from ..core.result import ConstraintResult
from ..functions.security import validate_identifier

_STATS = {
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
    "mean": lambda c: F.avg(c),
    "sum": lambda c: F.sum(c),
    "stddev": lambda c: F.stddev_samp(c),      # sample (n−1), property-pinned
    "variance": lambda c: F.var_samp(c),
    "count_non_null": lambda c: F.count(c),
    # shape statistics (round 6): Spark's skewness/kurtosis are the
    # POPULATION forms (g1; kurtosis is EXCESS, normal = 0) — the
    # profiler's tail screens (skew beyond |1| → log-transform
    # candidate; kurtosis >> 0 → heavy tails will break z-fences)
    "skewness": lambda c: F.skewness(c),
    "kurtosis": lambda c: F.kurtosis(c),
}


def _stat_col(df, column: str) -> "F.Column":
    """Temporal columns enter the stat aggregates as epoch seconds:
    min/max/mean/stddev then yield meaningful floats, assertions take
    epochs, and TIMESTAMP_NTZ (naive parquet) works where a raw
    datetime would crash the float() in result_from_metrics."""
    dt = dict(df.dtypes).get(column, "")
    if dt.startswith("timestamp") or dt == "date":
        from ..functions.datetime import epoch_seconds
        return epoch_seconds(column)
    return F.col(column)


class StatisticConstraint(Constraint):
    def __init__(self, column: str, stat: str, assertion: Assertion):
        stat = stat.lower()
        if stat not in _STATS:
            raise ValueError(f"unknown statistic {stat!r} (have {sorted(_STATS)})")
        self.column = validate_identifier(column)
        self.stat = stat
        self.name = stat
        self.assertion = Assertion.coerce(assertion)
        self._alias = metric_alias("stat", stat, column)

    def scalar_metrics(self, df) -> Dict[str, "F.Column"]:
        return {self._alias: _STATS[self.stat](_stat_col(df, self.column))}

    def result_from_metrics(self, metrics: Mapping[str, object]) -> ConstraintResult:
        raw = metrics[self._alias]
        if raw is None:  # all-null column
            return ConstraintResult.skipped(
                f"{self.stat}({self.column}) is NULL (no non-null values)")
        value = float(raw)
        if self.assertion.evaluate(value):
            return ConstraintResult.success(value)
        return ConstraintResult.failure(
            value,
            f"{self.stat}({self.column}) = {value} does not satisfy "
            f"{self.assertion.describe()}")


class MultiStatisticConstraint(Constraint):
    """All requested statistics of one column, asserted together.

    The reference builds one SELECT with every aggregate
    (builder_extensions.rs:85-159,203); here each stat is an alias in
    the shared pass, so fusion is automatic.
    """

    name = "statistics"

    def __init__(self, column: str, assertions: Mapping[str, Assertion]):
        self.column = validate_identifier(column)
        self.assertions = {k.lower(): Assertion.coerce(v) for k, v in assertions.items()}
        for stat in self.assertions:
            if stat not in _STATS:
                raise ValueError(f"unknown statistic {stat!r}")
        self._aliases = {s: metric_alias("stat", s, column) for s in self.assertions}

    def scalar_metrics(self, df) -> Dict[str, "F.Column"]:
        col = _stat_col(df, self.column)
        return {a: _STATS[s](col) for s, a in self._aliases.items()}

    def result_from_metrics(self, metrics: Mapping[str, object]) -> ConstraintResult:
        failures = []
        last = None
        for stat, alias in self._aliases.items():
            raw = metrics[alias]
            if raw is None:
                failures.append(f"{stat} is NULL")
                continue
            last = float(raw)
            if not self.assertions[stat].evaluate(last):
                failures.append(
                    f"{stat}={last} !({self.assertions[stat].describe()})")
        if failures:
            return ConstraintResult.failure(
                last, f"statistics of {self.column} failed: {'; '.join(failures)}")
        return ConstraintResult.success(last)


class QuantileConstraint(Constraint):
    """Approx/exact/auto quantiles.

    approx → ``percentile_approx`` (like the reference's
    APPROX_PERCENTILE_CONT); exact → Spark's exact ``percentile``;
    auto → exact below ``auto_threshold`` rows else approx, decided from
    the shared-scan row count (quantile.rs:244-258).

    Default ``accuracy`` is 1000 (rank error ≤ 1/accuracy = 0.1%) —
    round 8 lowered it from 10000 after measuring the GK sketch at
    1.58 s vs 0.60 s per 6M rows: a gate asserting a quantile lands in
    a band does not need 0.01% rank error, and the reference's KLL at
    its default k=200 tolerates ~1.65/√k ≈ 11.7% (kll_sketch.rs) —
    two orders looser than this default.  Pass ``accuracy=10000`` (or
    ``mode="exact"``) where tighter values matter.
    """

    name = "quantile"

    def __init__(self, column: str, q: float, assertion: Assertion,
                 mode: str = "approx", accuracy: int = 1000,
                 auto_threshold: int = 1_000_000):
        if not (0.0 <= q <= 1.0):
            raise ValueError("quantile must be in [0,1]")
        if mode not in ("approx", "exact", "auto"):
            raise ValueError("mode must be approx|exact|auto")
        self.column = validate_identifier(column)
        self.q = float(q)
        self.mode = mode
        self.accuracy = accuracy
        self.auto_threshold = auto_threshold
        self.assertion = Assertion.coerce(assertion)
        self._approx = metric_alias("quantile_approx", column, q, accuracy, tag="k")
        self._exact = metric_alias("quantile_exact", column, q, tag="k")
        self._sz = metric_alias("size")

    def scalar_metrics(self, df) -> Dict[str, "F.Column"]:
        col = F.col(self.column)
        exprs = {self._sz: F.count(F.lit(1))}
        if self.mode in ("approx", "auto"):
            exprs[self._approx] = F.percentile_approx(col, self.q, self.accuracy)
        if self.mode in ("exact", "auto"):
            exprs[self._exact] = F.percentile(col, self.q)
        return exprs

    def result_from_metrics(self, metrics: Mapping[str, object]) -> ConstraintResult:
        if self.mode == "approx":
            raw = metrics[self._approx]
        elif self.mode == "exact":
            raw = metrics[self._exact]
        else:
            use_exact = float(metrics[self._sz]) <= self.auto_threshold
            raw = metrics[self._exact if use_exact else self._approx]
        if raw is None:
            return ConstraintResult.skipped(f"quantile({self.column}) is NULL")
        value = float(raw)
        if self.assertion.evaluate(value):
            return ConstraintResult.success(value)
        return ConstraintResult.failure(
            value,
            f"p{self.q:g}({self.column}) = {value} does not satisfy "
            f"{self.assertion.describe()}")


class ApproxCountDistinctConstraint(Constraint):
    name = "approx_count_distinct"

    def __init__(self, column: str, assertion: Assertion, rsd: float = 0.05):
        self.column = validate_identifier(column)
        self.assertion = Assertion.coerce(assertion)
        self.rsd = rsd
        self._alias = metric_alias("approx_distinct", column, rsd, tag="k")

    def scalar_metrics(self, df) -> Dict[str, "F.Column"]:
        return {self._alias: F.approx_count_distinct(F.col(self.column), self.rsd)}

    def result_from_metrics(self, metrics: Mapping[str, object]) -> ConstraintResult:
        value = float(metrics[self._alias])
        if self.assertion.evaluate(value):
            return ConstraintResult.success(value)
        return ConstraintResult.failure(
            value,
            f"approx_count_distinct({self.column}) = {value:.0f} does not "
            f"satisfy {self.assertion.describe()}")


class CorrelationConstraint(Constraint):
    name = "correlation"

    def __init__(self, column_a: str, column_b: str, assertion: Assertion):
        self.column_a = validate_identifier(column_a)
        self.column_b = validate_identifier(column_b)
        self.column = f"{column_a},{column_b}"
        self.assertion = Assertion.coerce(assertion)
        self._alias = metric_alias("corr", column_a, column_b)

    def scalar_metrics(self, df) -> Dict[str, "F.Column"]:
        return {self._alias: F.corr(F.col(self.column_a), F.col(self.column_b))}

    def result_from_metrics(self, metrics: Mapping[str, object]) -> ConstraintResult:
        raw = metrics[self._alias]
        if raw is None:
            return ConstraintResult.skipped("correlation undefined (constant or empty)")
        value = float(raw)
        if self.assertion.evaluate(value):
            return ConstraintResult.success(value)
        return ConstraintResult.failure(
            value,
            f"corr({self.column_a},{self.column_b}) = {value:.6f} does not "
            f"satisfy {self.assertion.describe()}")


class CovarianceConstraint(Constraint):
    name = "covariance"

    def __init__(self, column_a: str, column_b: str, assertion: Assertion):
        self.column_a = validate_identifier(column_a)
        self.column_b = validate_identifier(column_b)
        self.column = f"{column_a},{column_b}"
        self.assertion = Assertion.coerce(assertion)
        self._alias = metric_alias("covar", column_a, column_b)

    def scalar_metrics(self, df) -> Dict[str, "F.Column"]:
        return {self._alias: F.covar_samp(F.col(self.column_a), F.col(self.column_b))}

    def result_from_metrics(self, metrics: Mapping[str, object]) -> ConstraintResult:
        raw = metrics[self._alias]
        if raw is None:
            return ConstraintResult.skipped("covariance undefined")
        value = float(raw)
        if self.assertion.evaluate(value):
            return ConstraintResult.success(value)
        return ConstraintResult.failure(
            value,
            f"covar_samp({self.column_a},{self.column_b}) = {value:.6f} does "
            f"not satisfy {self.assertion.describe()}")


class BenfordConstraint(Constraint):
    """First-significant-digit distribution vs Benford's law.

    Classic fraud/data-quality screen for naturally-occurring numeric
    columns (amounts, balances, populations): first digits should
    follow P(d) = log10(1 + 1/d). Metric = total variation distance
    (0.5·Σ|observed − expected|) ∈ [0, 1) — unlike a χ² p-value it does
    not degenerate at billion-row n, so the same threshold works at
    every scale. Default assertion: TVD ≤ 0.05.

    Shape: nine conditional counts in the shared fused aggregation —
    scalar protocol, no extra job, no groupBy. Zero/null values are out
    of scope (no first digit).
    """

    name = "benford"

    BENFORD_P = {d: math.log10(1 + 1 / d) for d in range(1, 10)}

    def __init__(self, column: str, assertion: Assertion = None):
        self.column = validate_identifier(column)
        self.assertion = (Assertion.coerce(assertion) if assertion is not None
                          else Assertion.le(0.05))
        self._d = {d: metric_alias("benford", column, d) for d in range(1, 10)}

    @staticmethod
    def first_digit(col: "F.Column") -> "F.Column":
        """First significant digit of |col| (NULL for 0/NULL) — plain
        floor/log10 arithmetic so any engine reproduces it.

        Clamped to 1..9: near powers of ten, float rounding of log10
        can push the ratio to 10 (nearest-double log10 rounds just
        below the integer) or to 0.999… (rounds just above), and an
        unclamped floor would silently drop such rows from all nine
        digit counts, shrinking n and skewing the TVD."""
        v = F.abs(col.cast("double"))
        return F.when(
            v > 0,
            F.greatest(F.lit(1), F.least(F.lit(9), F.floor(
                v / F.pow(F.lit(10.0), F.floor(F.log10(v)))).cast("int")))
        ).otherwise(F.lit(None))

    def scalar_metrics(self, df) -> Dict[str, "F.Column"]:
        fd = self.first_digit(F.col(self.column))
        return {a: F.count(F.when(fd == d, 1)) for d, a in self._d.items()}

    def result_from_metrics(self, metrics: Mapping[str, object]) -> ConstraintResult:
        counts = {d: int(metrics[a]) for d, a in self._d.items()}
        n = sum(counts.values())
        if n == 0:
            return ConstraintResult.skipped(
                f"benford({self.column}): no non-zero values")
        tvd = 0.5 * sum(abs(counts[d] / n - self.BENFORD_P[d])
                        for d in range(1, 10))
        if self.assertion.evaluate(tvd):
            return ConstraintResult.success(tvd)
        worst = max(range(1, 10),
                    key=lambda d: abs(counts[d] / n - self.BENFORD_P[d]))
        return ConstraintResult.failure(
            tvd,
            f"benford({self.column}) TVD = {tvd:.4f} does not satisfy "
            f"{self.assertion.describe()} (digit {worst}: observed "
            f"{counts[worst] / n:.3f} vs expected {self.BENFORD_P[worst]:.3f})")


def psi_bucket(col: "F.Column", lo: float, width: float,
               bins: int) -> "F.Column":
    """Equi-width bucket id with BOTH ends clamped: out-of-domain
    values land in the edge buckets, keeping the key bounded by
    ``bins`` whatever the data does. Shared by batch PSI and the
    streaming drift stage so both bucket identically."""
    return F.greatest(F.lit(0), F.least(
        F.lit(bins - 1),
        F.floor((col.cast("double") - float(lo)) / width))).cast("bigint")


def population_stability(ref, cur, column: str, bins: int = 10,
                         lo: float = None, hi: float = None,
                         eps: float = 1e-6):
    """Population Stability Index between two snapshots of a numeric
    column — the standard distribution-drift score (credit-risk
    heritage; <0.1 stable, 0.1-0.25 moderate shift, >0.25 drifted).

    PSI = Σ_b (p_b − q_b) · ln(p_b / q_b) over equi-width buckets,
    with zero shares floored at ``eps`` (the conventional smoothing —
    PSI is undefined at empty buckets). ``lo``/``hi`` fix the bucket
    domain; when omitted one tiny agg over each side derives them
    (pass them when the domain is known to save the extra job — at
    100 TB the fused min/max costs a full scan).

    Returns a 1-row DataFrame: n_ref, n_cur, psi. Shape: two
    grouped counts on a ≤``bins``-value key + a broadcast-sized
    full-outer join — scale-independent of row count.
    """
    if lo is None or hi is None:
        r = ref.agg(F.min(F.col(column)).alias("mn"),
                    F.max(F.col(column)).alias("mx")).collect()[0]
        c = cur.agg(F.min(F.col(column)).alias("mn"),
                    F.max(F.col(column)).alias("mx")).collect()[0]
        if r["mn"] is None or c["mn"] is None:
            raise ValueError(
                f"population_stability({column!r}): a side has no non-null "
                "rows — PSI is undefined for an empty snapshot (pass lo/hi "
                "and handle the empty side upstream if this is expected)")
        lo = min(float(r["mn"]), float(c["mn"])) if lo is None else lo
        hi = max(float(r["mx"]), float(c["mx"])) if hi is None else hi
    if float(hi) <= float(lo):
        # fail fast instead of silently collapsing every row into the
        # edge buckets (reversed pair → negative width; equal pair →
        # constant column, where equi-width PSI is undefined)
        raise ValueError(
            f"population_stability({column!r}): hi ({hi}) must exceed lo "
            f"({lo}); for a constant column there is no bucket domain — "
            "pass an explicit lo/hi spanning the expected range")
    width = (float(hi) - float(lo)) / bins

    def bucketed(df, share_name):
        col = F.col(column).cast("double")
        b = psi_bucket(col, lo, width, bins)
        per = (df.filter(col.isNotNull())
                 .groupBy(b.alias("bucket"))
                 .agg(F.count(F.lit(1)).alias("n")))
        from pyspark.sql import Window
        tot = F.sum("n").over(Window.partitionBy())
        return per.select("bucket", F.col("n").alias(f"n_{share_name}"),
                          (F.col("n") / tot).alias(share_name))

    p = bucketed(ref, "p")
    q = bucketed(cur, "q")
    j = (p.join(q, "bucket", "full_outer")
         .select(F.coalesce("n_p", F.lit(0)).alias("n_p"),
                 F.coalesce("n_q", F.lit(0)).alias("n_q"),
                 F.greatest(F.coalesce("p", F.lit(0.0)), F.lit(eps)).alias("p"),
                 F.greatest(F.coalesce("q", F.lit(0.0)), F.lit(eps)).alias("q")))
    return j.agg(F.sum("n_p").alias("n_ref"),
                 F.sum("n_q").alias("n_cur"),
                 F.round(F.sum((F.col("p") - F.col("q")) *
                               F.log(F.col("p") / F.col("q"))), 6).alias("psi"))


class DistributionStabilityConstraint(Constraint):
    """``has_stable_distribution``: PSI of the checked table's column
    against a reference snapshot must stay under ``max_psi`` (default
    0.25 — the classic "drifted" line; 0.1 is the stricter "stable"
    gate).

    Self-executing protocol: PSI needs the second (reference)
    DataFrame, so it cannot ride the single-table fused aggregation —
    it runs population_stability's two bins-bounded grouped counts as
    its own job, like the other join-shaped constraints.
    """

    name = "distribution_stability"

    def __init__(self, column: str, ref_df, max_psi: float = 0.25,
                 bins: int = 10, lo: Optional[float] = None,
                 hi: Optional[float] = None):
        if max_psi <= 0:
            raise ValueError(f"max_psi must be > 0, got {max_psi}")
        self.column = validate_identifier(column)
        self.ref_df = ref_df
        self.max_psi = float(max_psi)
        self.bins = bins
        self.lo = lo
        self.hi = hi

    def evaluate(self, ctx) -> ConstraintResult:
        cur = ctx.df(self.table)
        try:
            row = population_stability(
                self.ref_df, cur, self.column, bins=self.bins,
                lo=self.lo, hi=self.hi).collect()[0]
        except ValueError as e:  # empty side / degenerate domain
            return self._finish(ConstraintResult.error(str(e)))
        psi = float(row["psi"])
        if psi <= self.max_psi:
            return self._finish(ConstraintResult.success(psi))
        return self._finish(ConstraintResult.failure(
            psi,
            f"distribution_stability({self.column}): PSI {psi:.4f} vs "
            f"reference ({int(row['n_ref'])} rows) exceeds max_psi "
            f"{self.max_psi}"))


def robust_outlier_summary(df, column: str, k: float = 3.0,
                           mode: str = "exact"):
    """Robust (median/MAD) outlier accounting for a numeric column:
    median, MAD (median absolute deviation), the implied keep-range
    [median ± k·1.4826·MAD], and how many rows fall outside it.

    Median/MAD resist the exact failure mode that breaks mean/stddev
    fences: the outliers being hunted inflate the stddev and hide
    themselves (masking). 1.4826 is the consistency constant that
    makes MAD estimate σ on normal data, so ``k`` reads like a z-score
    (k=3 ≈ the classic 3σ fence).

    Three sequential 1-row aggregations over the pruned column —
    median, then MAD of deviations from it, then the fence count; each
    is a plain partial-aggregated scan, and the chain is inherent
    (each pass is parameterized by the previous scalar). ``mode``
    "exact" uses Spark's exact ``percentile``; "approx" swaps in
    ``percentile_approx`` for the two medians when an extra ~0.1 %
    error is worth avoiding exact-percentile memory at extreme scale.

    Returns a 1-row DataFrame: n, median, mad, lo, hi, n_outliers,
    outlier_ratio (rounded 6). A constant column has MAD 0 — the fence
    collapses to the median and every off-median row counts, which is
    the standard MAD caveat (use a compliance range check for
    near-constant columns).
    """
    if mode not in ("exact", "approx"):
        raise ValueError("mode must be exact|approx")
    validate_identifier(column)
    col = F.col(column).cast("double")
    pct = (lambda c: F.percentile(c, 0.5)) if mode == "exact" else \
        (lambda c: F.percentile_approx(c, 0.5, 10000))
    med_row = df.agg(pct(col).alias("m")).collect()[0]
    if med_row["m"] is None:
        raise ValueError(
            f"robust_outlier_summary({column!r}): no non-null rows")
    med = float(med_row["m"])
    mad_row = df.agg(pct(F.abs(col - med)).alias("m")).collect()[0]
    mad = float(mad_row["m"])
    half = float(k) * 1.4826 * mad
    lo, hi = med - half, med + half
    out = (col < lo) | (col > hi)
    return df.agg(
        F.count(col).alias("n"),
        F.round(F.lit(med), 6).alias("median"),
        F.round(F.lit(mad), 6).alias("mad"),
        F.round(F.lit(lo), 6).alias("lo"),
        F.round(F.lit(hi), 6).alias("hi"),
        F.count(F.when(out, 1)).alias("n_outliers"),
        F.round(F.count(F.when(out, 1)) / F.count(col), 6)
         .alias("outlier_ratio"))


class RobustOutlierConstraint(Constraint):
    """``has_no_outliers``: the fraction of rows outside the
    median ± k·1.4826·MAD fence must not exceed ``max_ratio``
    (default 0.0 — any robust outlier fails).

    Self-executing: the fence depends on two sequential median scalars,
    so it cannot ride the single fused aggregation; it runs
    robust_outlier_summary's three bounded scans as its own job, like
    the other multi-pass constraints (Spearman, exact grouped
    quantiles)."""

    name = "robust_outliers"

    def __init__(self, column: str, k: float = 3.0, max_ratio: float = 0.0,
                 mode: str = "exact"):
        if k <= 0:
            raise ValueError(f"k must be > 0, got {k}")
        if not (0.0 <= max_ratio <= 1.0):
            raise ValueError(f"max_ratio must be in [0,1], got {max_ratio}")
        self.column = validate_identifier(column)
        self.k = float(k)
        self.max_ratio = float(max_ratio)
        self.mode = mode

    def evaluate(self, ctx) -> ConstraintResult:
        try:
            row = robust_outlier_summary(
                ctx.df(self.table), self.column, self.k, self.mode).collect()[0]
        except ValueError as e:
            return self._finish(ConstraintResult.error(str(e)))
        ratio = float(row["outlier_ratio"])
        if ratio <= self.max_ratio:
            return self._finish(ConstraintResult.success(ratio))
        return self._finish(ConstraintResult.failure(
            ratio,
            f"robust_outliers({self.column}): {int(row['n_outliers'])} of "
            f"{int(row['n'])} rows ({ratio:.4%}) fall outside "
            f"[{row['lo']}, {row['hi']}] (median {row['median']}, MAD "
            f"{row['mad']}, k={self.k:g}), exceeding max_ratio "
            f"{self.max_ratio}"))


def correlation_matrix(df, columns, min_abs: float = 0.0):
    """Pairwise Pearson correlations for every pair of ``columns`` in
    ONE fused scan — the profiling step that finds redundant features
    and leaking targets before training.  p columns → p·(p−1)/2
    ``corr`` aggregate expressions computed in a single pass (map-side
    partial, mergeable 6-moment state each — the same state
    CorrelationAnalyzer persists), then unpivoted to long form with
    ``stack`` so downstream filters/joins see (col_a, col_b, corr)
    rows, never a wide driver-side matrix.

    ``min_abs`` > 0 keeps only pairs with |corr| ≥ min_abs (the
    "what is redundant?" screen).  Pairs where either side is constant
    or empty have NULL corr and are always kept (NULL is the finding —
    a constant feature).  col_a < col_b lexicographically; corr is
    rounded to 6 so results are engine-portable.

    Scale: one full scan regardless of p; the stack runs on a 1-row
    frame.  The p² plan-literal growth is bounded by the caller's
    column list (profile-sized, tens), never by data.
    """
    cols = [validate_identifier(c) for c in columns]
    if len(cols) < 2:
        raise ValueError(
            f"correlation_matrix needs >= 2 columns, got {len(cols)}")
    if len(set(cols)) != len(cols):
        raise ValueError("correlation_matrix: duplicate columns")
    if not 0.0 <= min_abs <= 1.0:
        raise ValueError(f"min_abs must be in [0,1], got {min_abs}")
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]

    # corr = covar_pop / (σ_pop·σ_pop) over the PAIRWISE-COMPLETE rows
    # — equivalent to F.corr (which also restricts to rows where both
    # sides are non-null) but with the zero-variance division GUARDED,
    # because under ANSI mode (Spark 4 default) F.corr on a constant
    # column raises DIVIDE_BY_ZERO instead of returning the NULL the
    # profile wants.  The stddevs MUST be restricted to the same
    # pairwise-complete population as the covariance (review r6: a
    # plain stddev_pop(x) normalizes by a different row set when y has
    # NULLs, skewing the ratio and even leaving [-1, 1]) — so each
    # pair carries its own conditional stddevs; the p-shared-stddev
    # dedup only applies on NULL-free data and correctness wins.
    def corr(a, b):
        xr, yr = F.col(a).cast("double"), F.col(b).cast("double")
        both = xr.isNotNull() & yr.isNotNull()
        x, y = F.when(both, xr), F.when(both, yr)
        sx, sy = F.stddev_pop(x), F.stddev_pop(y)
        return F.when((sx > 0) & (sy > 0),
                      F.round(F.covar_pop(x, y) / (sx * sy), 6))

    one = df.agg(*[corr(a, b).alias(f"c_{i}")
                   for i, (a, b) in enumerate(pairs)])
    stack = ", ".join(
        f"'{a}', '{b}', c_{i}" for i, (a, b) in enumerate(pairs))
    long = one.selectExpr(
        f"stack({len(pairs)}, {stack}) as (col_a, col_b, corr)")
    if min_abs > 0.0:
        long = long.filter(F.col("corr").isNull()
                           | (F.abs("corr") >= float(min_abs)))
    return long.orderBy("col_a", "col_b")


class CustomAggregateConstraint(Constraint):
    """``has_custom_aggregate``: gate an arbitrary (screened) SQL
    AGGREGATE expression — the escape hatch for domain metrics no
    named builder covers (``sum(revenue)/sum(cost)``,
    ``avg(a)/nullif(avg(b),0)``, ``count_if(x>0)/count(*)``) while
    STILL riding the suite's shared fused aggregation: the expression
    becomes one more alias in the single-pass agg, so a bespoke metric
    costs no extra scan.

    Same screen as ``satisfies`` (no DML/DDL/subqueries); the
    expression must be a single aggregate yielding one numeric value.
    A NULL result (empty input, 0/0 with nullif) → skipped, matching
    the statistic constraints.
    """

    name = "custom_aggregate"

    def __init__(self, expression: str, assertion: Assertion,
                 description: str = ""):
        from ..functions.security import validate_sql_expression
        self.expression = validate_sql_expression(expression)
        self.assertion = Assertion.coerce(assertion)
        self.description = description or expression
        self.column = None
        self._alias = metric_alias("custom_agg", expression)

    def scalar_metrics(self, df) -> Dict[str, "F.Column"]:
        col = F.expr(self.expression)
        # Eager no-row probe: Dataset construction analyzes the plan, so
        # a ROW-LEVEL expression (``l_quantity + 1``) or a bad column
        # raises HERE — caught by the executor's per-constraint guard
        # and mapped to ONE error outcome — instead of poisoning the
        # suite's shared fused aggregation and aborting every
        # co-scheduled constraint with it (ADVICE r6/r7).  limit(0)
        # keeps the probe analysis-only; no job runs.
        df.limit(0).agg(col.alias(self._alias))
        return {self._alias: col}

    def result_from_metrics(self, metrics: Mapping[str, object]) -> ConstraintResult:
        raw = metrics[self._alias]
        if raw is None:
            return ConstraintResult.skipped(
                f"custom_aggregate({self.description}) is NULL")
        try:
            value = float(raw)
        except (TypeError, ValueError):
            # the screen admits non-numeric aggregates (max of a string
            # column); map them to the error outcome instead of letting
            # float() abort the whole suite run (review r6)
            return ConstraintResult.error(
                f"custom_aggregate({self.description}) returned "
                f"non-numeric {raw!r}")
        if self.assertion.evaluate(value):
            return ConstraintResult.success(value)
        return ConstraintResult.failure(
            value,
            f"custom_aggregate({self.description}) = {value} does not "
            f"satisfy {self.assertion.describe()}")
