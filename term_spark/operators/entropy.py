"""Shannon entropy and mutual information.

Parity:
- /root/reference/term-guard/src/analyzers/advanced/entropy.rs:205-310 —
  value counts over CAST(col AS VARCHAR) with a cardinality guard
  (ORDER BY count DESC LIMIT max_unique), entropy −Σ p·ln p over
  non-null values;
- analyzers/advanced/mutual_information.rs:143-260 — numeric columns
  binned by FLOOR((x−min)/width) after a min/max pass, categorical
  passthrough; joint GROUP BY (x_bin, y_bin); MI = Σ p(x,y)·ln(p(x,y)
  /(p(x)p(y))).

Unlike the reference (client-side final math over collected counts) we
keep the reduction in Spark: the count table never leaves the cluster —
entropy/MI come back as a single number. At 100 TB the groupBy is the
only shuffle, and marginals are windowed sums over the (small) joint
count table.
"""

from __future__ import annotations

from typing import Optional

import pyspark.sql.functions as F
from ..session import local_df

from ..core.assertion import Assertion
from ..core.constraint import Constraint, EngineContext
from ..core.result import ConstraintResult
from ..functions.security import validate_identifier


def entropy_value(df, column: str, max_unique: int = 10000) -> Optional[float]:
    """−Σ p·ln p over non-null values, computed fully Spark-side.

    Single job: the cardinality guard (entropy.rs:205) is fused into the
    same aggregate as the entropy terms instead of a separate
    limit+count pass, so each entropy constraint costs exactly one scan
    + one groupBy shuffle.
    """
    validate_identifier(column)
    col = F.col(column).cast("string")
    counts = (df.filter(col.isNotNull())
                .groupBy(col.alias("v"))
                .agg(F.count(F.lit(1)).alias("cnt")))
    row = counts.agg(
        F.count(F.lit(1)).alias("card"),
        F.sum("cnt").alias("total"),
        F.sum(F.col("cnt") * F.log(F.col("cnt"))).alias("sum_n_ln_n"),
    ).collect()[0]
    if row["card"] == 0:
        return None
    if row["card"] > max_unique:
        raise ValueError(
            f"entropy: column {column} exceeds max_unique={max_unique} distinct values")
    total = float(row["total"])
    # −Σ (n/N) ln(n/N) = ln N − (Σ n ln n)/N
    import math
    return math.log(total) - float(row["sum_n_ln_n"]) / total


class EntropyConstraint(Constraint):
    name = "entropy"

    def __init__(self, column: str, assertion: Assertion, max_unique: int = 10000):
        self.column = validate_identifier(column)
        self.assertion = Assertion.coerce(assertion)
        self.max_unique = max_unique

    def evaluate(self, ctx: EngineContext) -> ConstraintResult:
        value = entropy_value(ctx.df(self.table), self.column, self.max_unique)
        if value is None:
            return self._finish(ConstraintResult.skipped())
        if self.assertion.evaluate(value):
            return self._finish(ConstraintResult.success(value))
        return self._finish(ConstraintResult.failure(
            value,
            f"entropy({self.column}) = {value:.4f} does not satisfy "
            f"{self.assertion.describe()}"))


def _is_numeric(df, column: str) -> bool:
    dtype = dict(df.dtypes)[column]
    return dtype in ("tinyint", "smallint", "int", "bigint", "float",
                     "double") or dtype.startswith("decimal")


def _bin_expr(column: str, bins: int, mn, mx):
    """FLOOR((x-min)/width) bin label from precomputed min/max."""
    col = F.col(column)
    if mn is None or mx is None or float(mx) == float(mn):
        return F.lit("0")
    width = (float(mx) - float(mn)) / bins
    b = F.least(F.floor((col.cast("double") - F.lit(float(mn))) / F.lit(width)),
                F.lit(bins - 1))
    return b.cast("string")


def mutual_information_value(df, column_x: str, column_y: str,
                             bins: int = 10) -> Optional[float]:
    """MI in nats over the joint distribution of binned x, y.

    Two jobs total: one fused min/max pass covering BOTH numeric columns
    (the reference runs one per column, mutual_information.rs:143), then
    the joint groupBy + windowed marginals.
    """
    validate_identifier(column_x)
    validate_identifier(column_y)
    df = df.filter(F.col(column_x).isNotNull() & F.col(column_y).isNotNull())
    exprs = []
    for c in (column_x, column_y):
        if _is_numeric(df, c):
            exprs += [F.min(c).alias(f"mn_{c}"), F.max(c).alias(f"mx_{c}")]
    stats = df.agg(*exprs).collect()[0] if exprs else {}
    def _b(c):
        if _is_numeric(df, c):
            return _bin_expr(c, bins, stats[f"mn_{c}"], stats[f"mx_{c}"])
        return F.col(c).cast("string")
    bx, by = _b(column_x), _b(column_y)
    joint = (df.groupBy(bx.alias("bx"), by.alias("by"))
               .agg(F.count(F.lit(1)).alias("nxy")))
    from pyspark.sql import Window
    w_all = Window.partitionBy()
    w_x = Window.partitionBy("bx")
    w_y = Window.partitionBy("by")
    # Joint table is at most bins² (or cardinality²) rows — windowed sums
    # over it are cheap; the heavy groupBy already happened.
    mi_df = (joint
             .withColumn("n", F.sum("nxy").over(w_all))
             .withColumn("nx", F.sum("nxy").over(w_x))
             .withColumn("ny", F.sum("nxy").over(w_y))
             .select(F.sum((F.col("nxy") / F.col("n")) *
                           F.log((F.col("nxy") * F.col("n")) /
                                 (F.col("nx") * F.col("ny")))).alias("mi")))
    row = mi_df.collect()[0]
    return None if row["mi"] is None else float(row["mi"])


class MutualInformationConstraint(Constraint):
    name = "mutual_information"

    def __init__(self, column_a: str, column_b: str, assertion: Assertion,
                 bins: int = 10):
        self.column_a = validate_identifier(column_a)
        self.column_b = validate_identifier(column_b)
        self.column = f"{column_a},{column_b}"
        self.assertion = Assertion.coerce(assertion)
        self.bins = bins

    def evaluate(self, ctx: EngineContext) -> ConstraintResult:
        value = mutual_information_value(
            ctx.df(self.table), self.column_a, self.column_b, self.bins)
        if value is None:
            return self._finish(ConstraintResult.skipped())
        if self.assertion.evaluate(value):
            return self._finish(ConstraintResult.success(value))
        return self._finish(ConstraintResult.failure(
            value,
            f"MI({self.column_a};{self.column_b}) = {value:.4f} does not "
            f"satisfy {self.assertion.describe()}"))


def _rank_map(d, column: str, alias: str):
    """Distinct-value → RANK() lookup table, computed WITHOUT a global
    single-partition sort.

    RANK(v) = 1 + Σ count(u) for u < v, i.e. an exclusive prefix-sum
    over the value-counts table in value order. We range-repartition the
    (distinct) counts, take per-partition totals (≤ num_partitions rows
    to the driver — bounded at any data size), broadcast the cumulative
    offsets back, and finish with a window partitioned BY partition id —
    every stage is partition-parallel, unlike Window.orderBy(col) which
    funnels all rows through one task.
    """
    from pyspark.sql import Window
    counts = (d.groupBy(F.col(column).alias(alias + "_v"))
                .agg(F.count(F.lit(1)).alias("cnt")))
    # localCheckpoint (not persist): the range boundaries are sampled
    # per-execution, so the totals job and the downstream window job
    # MUST see the same partition assignment. persist() is best-effort —
    # an evicted block recomputes, resamples boundaries, and the
    # pid-keyed offsets silently produce wrong ranks. Checkpointing cuts
    # the lineage so recomputation is impossible.
    parts = (counts.repartitionByRange(F.col(alias + "_v"))
                   .withColumn("pid", F.spark_partition_id())
                   .localCheckpoint(eager=True))
    totals = {r["pid"]: r["tot"] for r in
              parts.groupBy("pid").agg(F.sum("cnt").alias("tot")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]
    spark = d.sparkSession
    off_df = local_df(
        spark, [(int(p), int(o)) for p, o in offsets.items()] or [(0, 0)],
        "pid int, off bigint")
    w = (Window.partitionBy("pid").orderBy(alias + "_v")
               .rowsBetween(Window.unboundedPreceding, -1))
    ranked = (parts.join(F.broadcast(off_df), "pid")
                   .withColumn(alias,
                               1 + F.col("off") +
                               F.coalesce(F.sum("cnt").over(w), F.lit(0)))
                   .select(alias + "_v", alias))
    return ranked, parts


def spearman_value(df, column_x: str, column_y: str) -> Optional[float]:
    """Spearman rank correlation — RANK() per column then Pearson on the
    ranks (advanced/correlation.rs:334-350).

    Scale-safe exact form: ranks come from a distributed prefix-sum over
    each column's value-counts (`_rank_map`), joined back to the rows.
    The plan contains no single-partition Exchange/Sort except the final
    1-row Pearson reduce; at 100 TB every heavy stage (2 groupBys,
    2 joins) is an ordinary parallel shuffle.
    """
    validate_identifier(column_x)
    validate_identifier(column_y)
    d = (df.filter(F.col(column_x).isNotNull() & F.col(column_y).isNotNull())
           .select(F.col(column_x).alias("x"), F.col(column_y).alias("y")))
    rx, _ = _rank_map(d, "x", "rx")
    ry, _ = _rank_map(d, "y", "ry")
    ranked = (d.join(rx, d["x"] == rx["rx_v"])
                .join(ry, d["y"] == ry["ry_v"])
                .select("rx", "ry"))
    # checkpoint blocks are freed when the checkpointed frames are GC'd
    row = ranked.agg(F.corr("rx", "ry").alias("rho")).collect()[0]
    return None if row["rho"] is None else float(row["rho"])


class SpearmanConstraint(Constraint):
    name = "spearman_correlation"

    def __init__(self, column_a: str, column_b: str, assertion: Assertion):
        self.column_a = validate_identifier(column_a)
        self.column_b = validate_identifier(column_b)
        self.column = f"{column_a},{column_b}"
        self.assertion = Assertion.coerce(assertion)

    def evaluate(self, ctx: EngineContext) -> ConstraintResult:
        value = spearman_value(ctx.df(self.table), self.column_a, self.column_b)
        if value is None:
            return self._finish(ConstraintResult.skipped())
        if self.assertion.evaluate(value):
            return self._finish(ConstraintResult.success(value))
        return self._finish(ConstraintResult.failure(
            value,
            f"spearman({self.column_a},{self.column_b}) = {value:.4f} does "
            f"not satisfy {self.assertion.describe()}"))
