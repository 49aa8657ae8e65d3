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

from ..core.assertion import Assertion
from ..core.constraint import Constraint, EngineContext
from ..core.result import ConstraintResult
from ..functions.security import validate_identifier


def entropy_value(df, column: str, max_unique: int = 10000) -> Optional[float]:
    """−Σ p·ln p over non-null values, computed fully Spark-side."""
    validate_identifier(column)
    col = F.col(column).cast("string")
    counts = (df.filter(col.isNotNull())
                .groupBy(col.alias("v"))
                .agg(F.count(F.lit(1)).alias("cnt")))
    # Cardinality guard (entropy.rs:205): refuse absurd-cardinality columns.
    card = counts.limit(max_unique + 1).count()
    if card == 0:
        return None
    if card > max_unique:
        raise ValueError(
            f"entropy: column {column} exceeds max_unique={max_unique} distinct values")
    row = counts.agg(
        F.sum("cnt").alias("total"),
        F.sum(F.col("cnt") * F.log(F.col("cnt"))).alias("sum_n_ln_n"),
    ).collect()[0]
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


def _binned(df, column: str, bins: int):
    """Numeric → FLOOR((x-min)/width) bin label; non-numeric → string value."""
    dtype = dict(df.dtypes)[column]
    numeric = dtype in ("tinyint", "smallint", "int", "bigint", "float", "double",
                        "decimal") or dtype.startswith("decimal")
    col = F.col(column)
    if not numeric:
        return df, F.col(column).cast("string")
    stats = df.agg(F.min(col).alias("mn"), F.max(col).alias("mx")).collect()[0]
    mn, mx = stats["mn"], stats["mx"]
    if mn is None or mx is None or float(mx) == float(mn):
        return df, F.lit("0")
    width = (float(mx) - float(mn)) / bins
    b = F.least(F.floor((col.cast("double") - F.lit(float(mn))) / F.lit(width)),
                F.lit(bins - 1))
    return df, b.cast("string")


def mutual_information_value(df, column_x: str, column_y: str,
                             bins: int = 10) -> Optional[float]:
    """MI in nats over the joint distribution of binned x, y."""
    validate_identifier(column_x)
    validate_identifier(column_y)
    df = df.filter(F.col(column_x).isNotNull() & F.col(column_y).isNotNull())
    _, bx = _binned(df, column_x, bins)
    _, by = _binned(df, column_y, bins)
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


def spearman_value(df, column_x: str, column_y: str) -> Optional[float]:
    """Spearman rank correlation — RANK() over each column then Pearson
    on the ranks (advanced/correlation.rs:334-350).

    Scale note: global RANK() is a total sort; for 100 TB inputs prefer
    approximate rank via ntile/percent_rank on a sample. This exact form
    matches the reference.
    """
    from pyspark.sql import Window
    validate_identifier(column_x)
    validate_identifier(column_y)
    d = df.filter(F.col(column_x).isNotNull() & F.col(column_y).isNotNull())
    ranked = d.select(
        F.rank().over(Window.orderBy(column_x)).alias("rx"),
        F.rank().over(Window.orderBy(column_y)).alias("ry"),
    )
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
