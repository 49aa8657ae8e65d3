"""Multi-table constraints: foreign key, join coverage, cross-table sum.

Parity:
- ForeignKeyConstraint — /root/reference/term-guard/src/constraints/
  foreign_key.rs:151-207: orphan count via child LEFT JOIN parent WHERE
  parent.pk IS NULL → COUNT(*), COUNT(DISTINCT child.fk); options
  allow_nulls (:97) and bounded violation examples (LIMIT, default 100,
  :89). Spark idiom: ``left_anti`` join (the reference's NOT-EXISTS
  strategy flag, :106, is the same plan shape).
- JoinCoverageConstraint — constraints/join_coverage.rs:213-275: Left /
  Right / Bidirectional (LEAST of both) match rates; unmatched-key
  examples (:311-321).
- CrossTableSumConstraint — constraints/cross_table_sum.rs:202-283:
  ungrouped = two scalar SUMs + tolerance; grouped = per-table GROUP BY
  sums FULL OUTER JOINed on the group key, count of violating groups +
  MAX difference; violation listing ordered by diff DESC + LIMIT
  (:365-385).

Scale posture: FK/coverage are shuffle joins on the key — Catalyst/AQE
pick broadcast automatically when the parent side is small; counts use
map-side partial aggregation. Violation samples are LIMIT-bounded before
collect. The distinct-orphan count and the grouped-sum join shuffle once
on the join/group key each.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import pyspark.sql.functions as F

from ..core.assertion import Assertion
from ..core.constraint import Constraint, EngineContext
from ..core.result import ConstraintResult
from ..functions.security import validate_identifier, validate_identifiers

DEFAULT_MAX_VIOLATIONS = 100  # foreign_key.rs:89


class ForeignKeyConstraint(Constraint):
    name = "foreign_key"

    def __init__(self, child_table: str, child_column: str, parent_table: str,
                 parent_column: str, allow_nulls: bool = True,
                 max_violations: int = DEFAULT_MAX_VIOLATIONS):
        self.child_table = child_table
        self.child_column = validate_identifier(child_column)
        self.parent_table = parent_table
        self.parent_column = validate_identifier(parent_column)
        self.allow_nulls = allow_nulls
        self.max_violations = max_violations
        self.column = child_column
        self.table = child_table
        self.violation_examples: List = []

    def _orphan_join(self, ctx: EngineContext):
        """child LEFT JOIN distinct(parent keys) with both keys aliased to
        unique names (safe when child/parent columns share a name)."""
        child = ctx.df(self.child_table).select(
            F.col(self.child_column).alias("__fk"))
        parent = (ctx.df(self.parent_table)
                  .select(F.col(self.parent_column).alias("__pk")).distinct())
        joined = child.join(parent, F.col("__fk") == F.col("__pk"), "left")
        orphan = (F.col("__fk").isNotNull() & F.col("__pk").isNull()
                  if self.allow_nulls else F.col("__pk").isNull())
        return joined, orphan

    def evaluate(self, ctx: EngineContext) -> ConstraintResult:
        # Single job on the success path: total + orphan counts fold into
        # one left-join aggregate (the reference's one-query NOT-EXISTS
        # shape, foreign_key.rs:151-207). The distinct parent side stays
        # broadcast-able; AQE picks the join strategy.
        joined, orphan = self._orphan_join(ctx)
        agg = joined.agg(
            F.count(F.lit(1)).alias("total"),
            F.count(F.when(orphan, 1)).alias("orphan_rows"),
            F.count_distinct(F.when(orphan, F.col("__fk"))).alias("orphan_keys"),
        ).collect()[0]
        total = int(agg["total"])
        if total == 0:
            return self._finish(ConstraintResult.skipped())
        orphan_rows = int(agg["orphan_rows"])
        if orphan_rows == 0:
            return self._finish(ConstraintResult.success(0.0))
        # Failure path only: bounded example scan (second job).
        joined2, orphan2 = self._orphan_join(ctx)
        self.violation_examples = [
            r["__fk"] for r in joined2.filter(orphan2).select("__fk")
                                      .distinct().limit(self.max_violations)
                                      .collect()]
        ratio = orphan_rows / total
        return self._finish(ConstraintResult.failure(
            ratio,
            f"{orphan_rows} rows ({int(agg['orphan_keys'])} distinct "
            f"{self.child_column} values) in {self.child_table} have no match "
            f"in {self.parent_table}.{self.parent_column}; examples: "
            f"{self.violation_examples[:10]}"))


class JoinCoverageConstraint(Constraint):
    """Match-rate between two tables; direction left|right|bidirectional."""

    name = "join_coverage"

    def __init__(self, left_table: str, left_column: str, right_table: str,
                 right_column: str, assertion: Assertion,
                 direction: str = "left",
                 max_violations: int = DEFAULT_MAX_VIOLATIONS):
        if direction not in ("left", "right", "bidirectional"):
            raise ValueError("direction must be left|right|bidirectional")
        self.left_table = left_table
        self.left_column = validate_identifier(left_column)
        self.right_table = right_table
        self.right_column = validate_identifier(right_column)
        self.direction = direction
        self.assertion = Assertion.coerce(assertion)
        self.max_violations = max_violations
        self.column = f"{left_column}~{right_column}"
        self.table = left_table
        self.violation_examples: List = []

    @staticmethod
    def _tagged_matches(src, src_col: str, dst, dst_col: str, tag: str):
        """LEFT JOIN against distinct dst keys, projected down to a
        direction tag + matched flag — the per-direction building block
        of the single-query shape (join_coverage.rs:213-275). Keys are
        aliased per side so same-named columns (e.g. both 'id') never
        collide; the boolean projection makes both directions
        union-compatible regardless of key types."""
        return (src.select(F.col(src_col).alias("__src_key"))
                .join(dst.select(F.col(dst_col).alias("__dst_key")).distinct(),
                      F.col("__src_key") == F.col("__dst_key"), "left")
                .select(F.lit(tag).alias("__dir"),
                        F.col("__dst_key").isNotNull().cast("int").alias("__m")))

    def _match_rates(self, left, right, directions) -> dict:
        """ALL requested directions in ONE query/action: union the
        tagged per-direction match flags and aggregate grouped by
        direction (2 groups — a trivial final shuffle). Bidirectional
        previously ran its two joins as two sequential driver
        round-trips; this is the reference's one-query shape."""
        parts = [self._tagged_matches(
                     *( (left, self.left_column, right, self.right_column)
                        if d == "left"
                        else (right, self.right_column, left, self.left_column)),
                     d)
                 for d in directions]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        rows = u.groupBy("__dir").agg(
            F.count(F.lit(1)).alias("total"),
            F.sum("__m").alias("matched")).collect()
        # a direction with zero src rows yields no group: rate 1.0, total 0
        out = {d: (1.0, 0) for d in directions}
        for r in rows:
            total = int(r["total"])
            out[r["__dir"]] = (int(r["matched"]) / total if total else 1.0,
                               total)
        return out

    def evaluate(self, ctx: EngineContext) -> ConstraintResult:
        left = ctx.df(self.left_table)
        right = ctx.df(self.right_table)
        if self.direction in ("left", "right"):
            rate, total = self._match_rates(
                left, right, [self.direction])[self.direction]
        else:
            rates = self._match_rates(left, right, ["left", "right"])
            (l_rate, lt), (r_rate, rt) = rates["left"], rates["right"]
            rate, total = min(l_rate, r_rate), lt + rt  # LEAST (join_coverage.rs:267)
        if total == 0:
            return self._finish(ConstraintResult.skipped())
        if self.assertion.evaluate(rate):
            return self._finish(ConstraintResult.success(rate))
        # bounded unmatched-key examples (join_coverage.rs:311-321)
        src, src_col, dst, dst_col = (
            (left, self.left_column, right, self.right_column)
            if self.direction != "right"
            else (right, self.right_column, left, self.left_column))
        src_sel = src.select(F.col(src_col).alias("__src_key"))
        dst_sel = dst.select(F.col(dst_col).alias("__dst_key")).distinct()
        self.violation_examples = [
            r["__src_key"] for r in src_sel.join(
                dst_sel, F.col("__src_key") == F.col("__dst_key"), "left_anti")
            .distinct().limit(self.max_violations).collect()]
        return self._finish(ConstraintResult.failure(
            rate,
            f"join coverage ({self.direction}) {rate:.3f} between "
            f"{self.left_table}.{self.left_column} and "
            f"{self.right_table}.{self.right_column} does not satisfy "
            f"{self.assertion.describe()}; unmatched examples: "
            f"{self.violation_examples[:10]}"))


class CrossTableSumConstraint(Constraint):
    """Sum reconciliation across two tables, optionally per group."""

    name = "cross_table_sum"

    def __init__(self, left_table: str, left_expr: str, right_table: str,
                 right_expr: str, tolerance: float = 0.0,
                 group_by: Optional[Tuple[str, str]] = None,
                 max_violations: int = DEFAULT_MAX_VIOLATIONS):
        from ..functions.security import validate_sql_expression

        self.left_table = left_table
        self.left_expr = validate_sql_expression(left_expr)
        self.right_table = right_table
        self.right_expr = validate_sql_expression(right_expr)
        self.tolerance = float(tolerance)
        self.group_by = group_by  # (left_key, right_key) or None
        if group_by:
            validate_identifiers(group_by)
        self.max_violations = max_violations
        self.column = None
        self.table = left_table
        self.violating_groups: List = []

    def evaluate(self, ctx: EngineContext) -> ConstraintResult:
        left = ctx.df(self.left_table)
        right = ctx.df(self.right_table)
        if not self.group_by:
            # ONE query for both sums (cross_table_sum.rs:202-213 computes
            # them via scalar subqueries in a single statement): union the
            # two one-row aggregates instead of two sequential collects.
            # Cast to double for union compatibility across differing
            # decimal/float sum types; the tolerance compare is float.
            both = (
                left.agg(F.coalesce(F.sum(F.expr(self.left_expr)), F.lit(0.0))
                         .cast("double").alias("s"))
                    .select(F.lit("l").alias("side"), "s")
                .unionByName(
                    right.agg(F.coalesce(F.sum(F.expr(self.right_expr)),
                                         F.lit(0.0))
                              .cast("double").alias("s"))
                         .select(F.lit("r").alias("side"), "s")))
            sums = {r["side"]: r["s"] for r in both.collect()}
            ls, rs = sums["l"], sums["r"]
            diff = abs(float(ls) - float(rs))
            if diff <= self.tolerance:
                return self._finish(ConstraintResult.success(diff))
            return self._finish(ConstraintResult.failure(
                diff,
                f"sum({self.left_expr})={ls} vs sum({self.right_expr})={rs} "
                f"differ by {diff} > tolerance {self.tolerance}"))

        lk, rk = self.group_by
        # One-shuffle plan: tag each side's rows into its own value
        # column, union, and compute BOTH per-group sums in a single
        # groupBy. The per-side-groupBy + full-outer-join alternative
        # shuffles comparable volume but then sorts both per-group
        # sides for the merge join — two extra stages and two spill
        # surfaces. Value columns keep each side's native sum type
        # (NULL literal cast to it), so the arithmetic is identical to
        # the join plan; missing sides surface as NULL sums -> COALESCE
        # 0.0 (the same double coercion the join plan applied).
        # Requires union-compatible group-key types; otherwise fall
        # back to the join, whose key comparison coerces implicitly.
        # NULL-key semantic (both paths, pinned): NULL is ONE group,
        # SQL GROUP BY style — the union plan gets this from groupBy
        # naturally; the fallback join is null-safe (eqNullSafe) so the
        # two sides' NULL groups compare against each other, never
        # against 0.
        if left.schema[lk].dataType == right.schema[rk].dataType:
            lt = left.select(F.expr(self.left_expr).alias("x")).schema[0].dataType
            rt = right.select(F.expr(self.right_expr).alias("x")).schema[0].dataType
            tagged = (left.select(
                          F.col(lk).alias("grp"),
                          F.expr(self.left_expr).alias("lv"),
                          F.lit(None).cast(rt).alias("rv"))
                      .unionByName(right.select(
                          F.col(rk).alias("grp"),
                          F.lit(None).cast(lt).alias("lv"),
                          F.expr(self.right_expr).alias("rv"))))
            joined = tagged.groupBy("grp").agg(
                F.coalesce(F.sum("lv"), F.lit(0.0)).alias("left_sum"),
                F.coalesce(F.sum("rv"), F.lit(0.0)).alias("right_sum"))
        else:
            lsum = left.groupBy(F.col(lk).alias("grp")).agg(
                F.sum(F.expr(self.left_expr)).alias("left_sum"))
            rsum = right.groupBy(F.col(rk).alias("rgrp")).agg(
                F.sum(F.expr(self.right_expr)).alias("right_sum"))
            joined = lsum.join(
                rsum, lsum["grp"].eqNullSafe(rsum["rgrp"]), "full_outer"
            ).select(
                F.coalesce(lsum["grp"], rsum["rgrp"]).alias("grp"),
                F.coalesce("left_sum", F.lit(0.0)).alias("left_sum"),
                F.coalesce("right_sum", F.lit(0.0)).alias("right_sum"))
        joined = joined.withColumn(
            "diff", F.abs(F.col("left_sum") - F.col("right_sum")))
        agg = joined.agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.count(F.when(F.col("diff") > self.tolerance, 1)).alias("violations"),
            F.max("diff").alias("max_diff")).collect()[0]
        if agg["n_groups"] == 0:
            return self._finish(ConstraintResult.skipped())
        violations = int(agg["violations"])
        if violations == 0:
            return self._finish(ConstraintResult.success(0.0))
        self.violating_groups = (
            joined.filter(F.col("diff") > self.tolerance)
                  .orderBy(F.desc("diff")).limit(self.max_violations).collect())
        return self._finish(ConstraintResult.failure(
            float(violations),
            f"{violations}/{int(agg['n_groups'])} groups violate sum "
            f"consistency (max diff {float(agg['max_diff']):.4f} > tolerance "
            f"{self.tolerance})"))


class SchemaMatchConstraint(Constraint):
    """``has_same_schema_as``: the checked table's schema must match a
    reference snapshot's — the cheapest drift gate there is (pure
    metadata, zero scan), and the one that catches upstream producer
    changes (dropped column, silent type widening) before any
    value-level check can.

    ``ignore_nullability`` (default True) compares only name + type;
    ``allow_extra`` tolerates new columns (additive evolution) while
    still failing on missing or retyped ones. Metric = matched
    reference fields / total reference fields.
    """

    name = "schema_match"

    def __init__(self, ref_df, ignore_nullability: bool = True,
                 allow_extra: bool = False):
        self.ref_schema = ref_df.schema if hasattr(ref_df, "schema") else ref_df
        self.ignore_nullability = ignore_nullability
        self.allow_extra = allow_extra

    def evaluate(self, ctx) -> ConstraintResult:
        cur = {f.name: f for f in ctx.df(self.table).schema.fields}
        ref = {f.name: f for f in self.ref_schema.fields}

        def fingerprint(f):
            return (f.dataType.simpleString() if self.ignore_nullability
                    else (f.dataType.simpleString(), f.nullable))

        missing = sorted(n for n in ref if n not in cur)
        changed = sorted(n for n in ref if n in cur
                         and fingerprint(ref[n]) != fingerprint(cur[n]))
        extra = sorted(n for n in cur if n not in ref)
        problems = []
        if missing:
            problems.append(f"missing: {missing}")
        if changed:
            problems.append(", ".join(
                f"{n}: {fingerprint(cur[n])} (expected {fingerprint(ref[n])})"
                for n in changed))
        if extra and not self.allow_extra:
            problems.append(f"unexpected: {extra}")
        metric = (len(ref) - len(missing) - len(changed)) / max(len(ref), 1)
        if not problems:
            return self._finish(ConstraintResult.success(metric))
        return self._finish(ConstraintResult.failure(
            metric, f"schema_match: {'; '.join(problems)}"))


class RowCountRatioConstraint(Constraint):
    """``has_row_count_ratio``: current row count / reference row count
    must land in [min_ratio, max_ratio] — the partition-to-partition
    volume gate ("today within ±50 % of yesterday"). Two 1-row counts;
    an empty reference is an error (the ratio is undefined), an empty
    current table is simply ratio 0."""

    name = "row_count_ratio"

    def __init__(self, ref_df, min_ratio: float = 0.5,
                 max_ratio: float = 2.0):
        if min_ratio < 0 or max_ratio < min_ratio:
            raise ValueError(
                f"need 0 <= min_ratio <= max_ratio, got [{min_ratio}, {max_ratio}]")
        self.ref_df = ref_df
        self.min_ratio = float(min_ratio)
        self.max_ratio = float(max_ratio)

    def evaluate(self, ctx) -> ConstraintResult:
        n_ref = self.ref_df.count()
        if n_ref == 0:
            return self._finish(ConstraintResult.error(
                "row_count_ratio: reference table is empty — ratio undefined"))
        n_cur = ctx.df(self.table).count()
        ratio = n_cur / n_ref
        if self.min_ratio <= ratio <= self.max_ratio:
            return self._finish(ConstraintResult.success(ratio))
        return self._finish(ConstraintResult.failure(
            ratio,
            f"row_count_ratio: {n_cur} rows vs reference {n_ref} "
            f"(ratio {ratio:.4f}) outside [{self.min_ratio}, "
            f"{self.max_ratio}]"))


def dataset_diff(left: DataFrame, right: DataFrame, keys,
                 compare_cols=None) -> DataFrame:
    """Snapshot-to-snapshot diff accounting — "what changed since
    yesterday's load?" in one row: n_left, n_right, n_added (keys only
    in right), n_removed (keys only in left), n_changed (common keys
    whose compared columns differ), n_identical.

    ``compare_cols`` defaults to every shared non-key column.  Change
    detection hashes the compared tuple md5(concat_ws-with-null-marker)
    per side BEFORE the join, so the join carries (keys, hash) only —
    at 100 TB the wide rows never cross the shuffle, just their
    fingerprints.  Duplicate keys within a side make per-key pairing
    ambiguous; rows are first reduced to one hash per key
    (min — deterministic), and the side row counts still report the
    raw totals so a duplicate-key drift shows up as
    n_left/n_right ≠ n_common + added/removed.

    Shape: two map-side hash projections → two fingerprint-grouped
    reductions → one full-outer equi-join on the key FINGERPRINT →
    1-row reduction.  Key matching is NULL-SAFE: each side groups by
    the md5 of the JSON-encoded key tuple (injective — escaping means
    no key value can alias another tuple or a NULL), so a key NULL on
    both sides lands in one common row instead of double-counting as
    added+removed (ADVICE r6).  Round 8 moved the null safety from an
    ``eqNullSafe`` join condition INTO the fingerprint: Spark would
    not reuse the groupBy's hash partitioning under ``<=>`` (plan
    audit showed +4 Exchanges), while the equi-join on the grouping
    key itself keeps the join shuffle-free after the two groupBys —
    the difference between 2 and 6 shuffles of the key table at
    100 TB.  (Same md5-collision assumption as the value hashes.)
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    from ..functions.security import validate_identifiers
    validate_identifiers(keys)
    shared = [c for c in left.columns if c in set(right.columns)
              and c not in keys]
    cols = list(compare_cols) if compare_cols is not None else shared
    validate_identifiers(cols) if cols else None
    if not cols:
        raise ValueError("dataset_diff: no columns to compare "
                         "(all shared columns are keys)")

    def value_fp(columns):
        # null-safe compared-tuple fingerprint: a literal marker
        # distinguishes NULL from empty string / absent (the DuckDB
        # oracle mirrors this exact expression)
        return F.md5(F.concat_ws(
            "\x01", *[F.coalesce(F.col(c).cast("string"), F.lit("\x02"))
                      for c in columns]))

    def key_fp(columns):
        # null-safe KEY fingerprint via JSON: escaping makes the
        # encoding INJECTIVE — a key value containing the \x01/\x02
        # marker bytes (or literally "\x02") cannot alias another key
        # tuple or a NULL the way a raw concat_ws scheme could
        # (round-8 review); ignoreNullFields=false keeps NULL ≠ "".
        return F.md5(F.to_json(F.struct(*[F.col(c) for c in columns]),
                               {"ignoreNullFields": "false"}))

    def side(df, tag):
        return (df.groupBy(key_fp(keys).alias("__k"))
                  .agg(F.min(value_fp(cols)).alias(f"h_{tag}"),
                       F.count(F.lit(1)).alias(f"rows_{tag}")))

    j = side(left, "l").join(side(right, "r"), "__k", "full_outer")
    return j.agg(
        F.coalesce(F.sum("rows_l"), F.lit(0)).cast("bigint").alias("n_left"),
        F.coalesce(F.sum("rows_r"), F.lit(0)).cast("bigint").alias("n_right"),
        F.count(F.when(F.col("h_l").isNotNull()
                       & F.col("h_r").isNotNull(), 1)).alias("n_common"),
        F.count(F.when(F.col("h_l").isNull(), 1)).alias("n_added"),
        F.count(F.when(F.col("h_r").isNull(), 1)).alias("n_removed"),
        F.count(F.when(F.col("h_l").isNotNull() & F.col("h_r").isNotNull()
                       & (F.col("h_l") != F.col("h_r")), 1))
         .alias("n_changed"),
        F.count(F.when(F.col("h_l") == F.col("h_r"), 1))
         .alias("n_identical"))


class DatasetChurnConstraint(Constraint):
    """``has_low_churn``: between a reference snapshot and the current
    table, the changed-row share (of common keys) and the
    added/removed shares (of the reference count) must each stay
    within their caps — the "did the upstream load do something
    insane?" gate that a row count alone misses (a full-table rewrite
    keeps the count and changes every row).
    """

    name = "dataset_churn"

    def __init__(self, ref_df, keys, compare_cols=None,
                 max_changed_ratio: float = 0.2,
                 max_added_ratio: float = 0.2,
                 max_removed_ratio: float = 0.2):
        for nm, v in (("max_changed_ratio", max_changed_ratio),
                      ("max_added_ratio", max_added_ratio),
                      ("max_removed_ratio", max_removed_ratio)):
            if not 0.0 <= v <= 1.0:
                raise ValueError(f"{nm} must be in [0,1], got {v}")
        self.ref_df = ref_df
        self.keys = [keys] if isinstance(keys, str) else list(keys)
        self.compare_cols = compare_cols
        self.max_changed = float(max_changed_ratio)
        self.max_added = float(max_added_ratio)
        self.max_removed = float(max_removed_ratio)
        self.column = ",".join(self.keys)

    def evaluate(self, ctx) -> ConstraintResult:
        cur = ctx.df(self.table)
        row = dataset_diff(self.ref_df, cur, self.keys,
                           self.compare_cols).collect()[0]
        n_ref = int(row["n_left"])
        common = int(row["n_common"])
        if n_ref == 0:
            return self._finish(ConstraintResult.skipped(
                "dataset_churn: empty reference snapshot"))
        changed = int(row["n_changed"]) / common if common else 0.0
        added = int(row["n_added"]) / n_ref
        removed = int(row["n_removed"]) / n_ref
        worst = max(changed, added, removed)
        fails = []
        if changed > self.max_changed:
            fails.append(f"changed {changed:.2%} > {self.max_changed:.0%}")
        if added > self.max_added:
            fails.append(f"added {added:.2%} > {self.max_added:.0%}")
        if removed > self.max_removed:
            fails.append(f"removed {removed:.2%} > {self.max_removed:.0%}")
        if not fails:
            return self._finish(ConstraintResult.success(worst))
        return self._finish(ConstraintResult.failure(
            worst, "dataset_churn(" + ",".join(self.keys) + "): "
                   + "; ".join(fails)))


# ---------------------------------------------------------------------------
# join-cardinality pre-flight (sketch-based)
# ---------------------------------------------------------------------------

def estimate_join_cardinality(left, right, left_key: str, right_key: str,
                              k: int = 256, kmv_k: int = 1024) -> dict:
    """Predict |left ⋈ right| BEFORE running the join, from one
    bounded-cost sketch pass per side — the pre-flight for the
    100 TB failure mode where a skewed or low-cardinality key turns
    an "innocent" equi-join into a row explosion that no amount of
    partitioning survives. (The reference validates joins after the
    fact — FK orphans, coverage; this is the gate you run FIRST.)

    |A ⋈ B| = Σ_x f_A(x)·f_B(x). The sketches split that sum:

    - hot term (THEOREM lower bound): Misra-Gries estimates
      underestimate per key, so Σ over keys held in BOTH sketches of
      est_A(x)·est_B(x) <= the true sum — a join provably AT LEAST
      this large. All skew-driven explosions live here: a key pair
      (10^6, 10^6) contributes 10^12 to the lower bound at any
      reasonable k.
    - tail term (heuristic): rows not covered by the hot product are
      spread uniformly over the unseen keys of the larger side —
      rest_A·rest_B / max(d_tail) with d_tail from KMV distinct
      estimates. Uniform+containment assumptions; stated, not proven.

    Returns {lower_bound, estimate, hot_keys, n_left, n_right,
    d_left, d_right}: ``lower_bound`` is the one-sided number the
    constraint gates on; ``estimate`` = lower_bound + tail;
    ``hot_keys`` = [(key, est_l, est_r), ...] sorted by product desc —
    the keys to salt if the gate trips; feed the whole report to
    ``plans.skew.salted_join_on_hot_keys`` for the one-call remedy. Cost: 4 bounded
    jobs (2 map-only MG passes, 2 TakeOrdered KMV passes), driver
    state O(k + kmv_k) per side.
    """
    from concurrent.futures import ThreadPoolExecutor

    from ..analyzers.heavy_hitters import mg_sketch
    from ..analyzers.kmv import kmv_distinct, kmv_sketch

    # the 4 sketch jobs are independent bounded passes — submit them
    # concurrently so each job's stage tail back-fills the others'
    # idle cores (guide §2.6); results are sketches, unchanged
    with ThreadPoolExecutor(max_workers=4) as pool:
        f_mg_l = pool.submit(mg_sketch, left, left_key, k)
        f_mg_r = pool.submit(mg_sketch, right, right_key, k)
        f_d_l = pool.submit(lambda: kmv_distinct(
            kmv_sketch(left, left_key, k=kmv_k)))
        f_d_r = pool.submit(lambda: kmv_distinct(
            kmv_sketch(right, right_key, k=kmv_k)))
        mg_l, mg_r = f_mg_l.result(), f_mg_r.result()
        d_l, d_r = f_d_l.result(), f_d_r.result()

    common = set(mg_l.counters) & set(mg_r.counters)
    hot_keys = sorted(
        ((x, mg_l.counters[x], mg_r.counters[x]) for x in common),
        key=lambda t: (-t[1] * t[2], t[0]))
    lower = sum(el * er for _, el, er in hot_keys)

    # a summary whose counters sum to n never trimmed: it is the EXACT,
    # COMPLETE frequency table. Both sides complete -> every key pair is
    # known, the tail is zero, and the "estimate" is the exact join size.
    complete = (sum(mg_l.counters.values()) == mg_l.n
                and sum(mg_r.counters.values()) == mg_r.n)
    if complete:
        estimate = float(lower)
    else:
        rest_l = mg_l.n - sum(mg_l.counters[x] for x in common)
        rest_r = mg_r.n - sum(mg_r.counters[x] for x in common)
        d_tail = max(d_l - len(common), d_r - len(common), 1.0)
        estimate = lower + (rest_l * rest_r) / d_tail

    return {"lower_bound": int(lower), "estimate": float(estimate),
            "hot_keys": hot_keys,
            "n_left": mg_l.n, "n_right": mg_r.n,
            "d_left": d_l, "d_right": d_r}


class JoinCardinalityConstraint(Constraint):
    """``has_bounded_join_cardinality``: fail when a prospective
    equi-join is PROVABLY larger than ``max_rows`` — the sketch lower
    bound is one-sided (MG underestimates), so a failure is a proof of
    explosion and a pass is never a false alarm. An actual size in
    (lower_bound, true] can slip through when the mass hides below the
    n/(k+1) counter floor on both sides at once; raise k to shrink
    that blind spot. The failure message names the worst key pairs —
    exactly the salting targets for plans/skew. Metric = lower bound
    as a multiple of max_rows."""

    name = "join_cardinality"

    def __init__(self, left_table: str, left_key: str, right_table: str,
                 right_key: str, max_rows: float, k: int = 256):
        validate_identifier(left_key)
        validate_identifier(right_key)
        if max_rows <= 0:
            raise ValueError(f"max_rows must be > 0, got {max_rows}")
        self.left_table = left_table
        self.left_key = left_key
        self.right_table = right_table
        self.right_key = right_key
        self.max_rows = float(max_rows)
        self.k = int(k)
        self.column = left_key
        self.table = left_table
        self.report: Optional[dict] = None

    def evaluate(self, ctx: EngineContext) -> ConstraintResult:
        left = ctx.df(self.left_table)
        right = ctx.df(self.right_table)
        rep = estimate_join_cardinality(
            left, right, self.left_key, self.right_key, k=self.k)
        self.report = rep
        if rep["n_left"] == 0 and rep["n_right"] == 0:
            return self._finish(ConstraintResult.skipped())
        ratio = rep["lower_bound"] / self.max_rows
        if rep["lower_bound"] <= self.max_rows:
            return self._finish(ConstraintResult.success(ratio))
        worst = ", ".join(
            f"{x!r} ({el}x{er})" for x, el, er in rep["hot_keys"][:3])
        return self._finish(ConstraintResult.failure(
            ratio,
            f"join {self.left_table}.{self.left_key} = "
            f"{self.right_table}.{self.right_key} is provably >= "
            f"{rep['lower_bound']} rows (> max_rows {self.max_rows:g}; "
            f"estimate {rep['estimate']:.3g}); worst keys: {worst} — "
            f"salt or pre-aggregate these before joining (plans.skew.salted_join_on_hot_keys(left, right, lk, rk, report) salts exactly these keys)"))
