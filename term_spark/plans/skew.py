"""Skew-handling utilities: key salting for hot-key aggregations and
joins.

At 100 TB a single hot key (one giant customer, one viral document)
serializes an entire shuffle partition. AQE's skew-join handling
(enabled in session.py) covers sort-merge joins; these helpers cover
the cases AQE doesn't: hash aggregations with hot group keys and
broadcast-infeasible hot-key joins.

- salted_group_count / salted_agg: two-stage aggregation through a
  random salt — stage 1 aggregates (key, salt) partials, stage 2
  merges partials per key. Works for any commutative-monoid aggregate
  (the same state algebra as analyzers/base.py).
- salted_join: replicate the small side per salt, salt the hot side;
  equi-join on (key, salt) spreads one hot key over ``salts``
  partitions.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

SALT_COL = "__salt"


def with_salt(df: DataFrame, salts: int) -> DataFrame:
    """Uniform random salt in [0, salts) — used for aggregation salting
    where any distribution works (monoid merge fixes it up)."""
    return df.withColumn(SALT_COL, (F.rand(seed=42) * salts).cast("int"))


def salted_group_count(df: DataFrame, key_cols: List[str], salts: int = 16,
                       count_alias: str = "cnt") -> DataFrame:
    """groupBy(key).count() resistant to hot keys: partial counts per
    (key, salt), then merge per key. Two small shuffles instead of one
    skewed one."""
    partial = (with_salt(df, salts)
               .groupBy(*key_cols, SALT_COL)
               .agg(F.count(F.lit(1)).alias("__partial")))
    return (partial.groupBy(*key_cols)
            .agg(F.sum("__partial").alias(count_alias)))


def salted_agg(df: DataFrame, key_cols: List[str],
               partial_exprs: Dict[str, "F.Column"],
               merge_exprs: Dict[str, "F.Column"],
               salts: int = 16) -> DataFrame:
    """General two-stage salted aggregation.

    ``partial_exprs``: alias -> aggregate over raw rows (stage 1,
    per (key, salt)); ``merge_exprs``: alias -> aggregate over the
    stage-1 partial columns (stage 2, per key). Example — mean:
      partial: {"s": F.sum("x"), "c": F.count("x")}
      merge:   {"s": F.sum("s"), "c": F.sum("c")}
    then mean = s/c.
    """
    partial = (with_salt(df, salts)
               .groupBy(*key_cols, SALT_COL)
               .agg(*[c.alias(a) for a, c in partial_exprs.items()]))
    return (partial.groupBy(*key_cols)
            .agg(*[c.alias(a) for a, c in merge_exprs.items()]))


def salted_join(big: DataFrame, small: DataFrame, big_key: str,
                small_key: str, salts: int = 8,
                how: str = "inner") -> DataFrame:
    """Join a skewed big side with a modest small side without
    broadcasting: salt the big side's key, replicate each small-side
    row ``salts`` times, join on (key, salt).

    Small side grows ×salts — use when it's too big to broadcast but
    far smaller than the big side.
    """
    big_salted = big.withColumn(SALT_COL, (F.rand(seed=42) * salts).cast("int"))
    small_replicated = (small
                        .withColumn(SALT_COL,
                                    F.explode(F.array(*[F.lit(i)
                                                        for i in range(salts)]))))
    cond = (big_salted[big_key] == small_replicated[small_key]) & \
           (big_salted[SALT_COL] == small_replicated[SALT_COL])
    return (big_salted.join(small_replicated, cond, how)
            .drop(small_replicated[SALT_COL]).drop(big_salted[SALT_COL]))


def salted_join_on_hot_keys(left: DataFrame, right: DataFrame,
                            left_key: str, right_key: str, report: dict,
                            salts: int = 8,
                            max_hot_keys: Optional[int] = None) -> DataFrame:
    """The one-call remedy for a tripped join-cardinality pre-flight
    (round 11): ``operators.multitable.estimate_join_cardinality``
    NAMES the keys whose frequency product drives a provable join
    explosion; this routes EXACTLY those keys through ``salted_join``
    and every other key through the plain equi-join, where
    Catalyst/AQE keep their usual freedom (broadcast a small rest
    side, sort-merge otherwise, AQE skew-split as backstop).

    ``report`` is the pre-flight's dict (or
    ``JoinCardinalityConstraint.report`` after the gate fires): its
    ``hot_keys`` [(key, est_l, est_r), ...] are string casts of the
    join key, product-desc — ``max_hot_keys`` limits salting to the
    top offenders (None = all named).  The split is lossless for the
    inner equi-join: a hot-key row can only match a hot-key row and a
    rest row only a rest row, so
    hot ⋈ hot ∪ rest ⋈ rest == left ⋈ right (row multiset equality is
    pinned in tests/test_skew_plans.py on a planted-explosion
    fixture, along with the spread: each hot key's pairs land in
    ``salts`` shuffle partitions instead of one).

    Column names must be disjoint across the two sides (the usual
    analytic-join convention, o_custkey vs c_custkey) so the union
    after the two paths is unambiguous.
    """
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError("left/right column names must be disjoint; both "
                         f"sides have {sorted(overlap)}")
    hot = [x for x, _, _ in report.get("hot_keys", [])]
    if max_hot_keys is not None:
        hot = hot[:max_hot_keys]
    if not hot:
        return left.join(right, F.col(left_key) == F.col(right_key), "inner")
    lk_s = F.col(left_key).cast("string")
    rk_s = F.col(right_key).cast("string")
    # NULL keys never match an inner equi-join; ~isin is NULL for them,
    # so the rest filter drops them too — both paths stay NULL-free
    hot_joined = salted_join(left.filter(lk_s.isin(hot)),
                             right.filter(rk_s.isin(hot)),
                             left_key, right_key, salts=salts, how="inner")
    rest_joined = (left.filter(~lk_s.isin(hot))
                   .join(right.filter(~rk_s.isin(hot)),
                         F.col(left_key) == F.col(right_key), "inner"))
    return hot_joined.unionByName(rest_joined)


def write_bucketed(df: DataFrame, path_or_table: str, bucket_cols: List[str],
                   num_buckets: int = 64, sort_cols: Optional[List[str]] = None,
                   fmt: str = "parquet") -> None:
    """Persist a table bucketed by join key so repeated joins/aggs on
    that key skip the shuffle entirely (co-located joins; the 100 TB
    answer to 'this fact table joins on the same key every day').

    Bucketed writes require a table (metastore) target, not a bare
    path — ``path_or_table`` is a table name.
    """
    writer = (df.write.format(fmt)
              .bucketBy(num_buckets, *bucket_cols))
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.mode("overwrite").saveAsTable(path_or_table)


def write_partitioned(df: DataFrame, path: str, partition_cols: List[str],
                      files_per_partition: int = 1,
                      fmt: str = "parquet") -> None:
    """Persist a table Hive-partitioned by ``partition_cols`` so
    partition-keyed filters PRUNE at planning time (the scan lists
    only matching directories — the 100 TB answer to 'every query
    filters on date/source').

    The pre-write ``repartition`` by the partition key is the
    small-files guard: a naive ``partitionBy`` write emits one file
    per (task × partition) — 32 tasks × 365 days = 11,680 files of a
    few KB each, and at 1000 executors the listing alone dominates
    query time.  Hashing rows to tasks BY the partition value lands
    each value's rows in one task → one file per directory, with
    write parallelism = number of distinct values (not 1 — a
    ``repartition(1, …)`` would serialize the whole write through a
    single task).  ``files_per_partition > 1`` adds a salt so huge
    partitions split across that many tasks/files — the skew valve
    when one day/source dwarfs the rest.
    """
    if files_per_partition < 1:
        raise ValueError(
            f"files_per_partition must be >= 1, got {files_per_partition}")
    cols = [F.col(c) for c in partition_cols]
    if files_per_partition > 1:
        # salt must be DETERMINISTIC per row content: a
        # monotonically_increasing_id-derived salt changes on stage
        # retry, and repartitioning on a non-deterministic key can
        # duplicate or drop rows when an executor is lost mid-shuffle
        # (the SPARK-23207 failure class) (review r6)
        salt = F.pmod(F.hash(*[F.col(c) for c in df.columns]),
                      F.lit(files_per_partition))
        df = df.withColumn("__wp_salt", salt)
        out = df.repartition(*cols, F.col("__wp_salt")).drop("__wp_salt")
    else:
        out = df.repartition(*cols)
    (out.write.format(fmt)
        .partitionBy(*partition_cols)
        .mode("overwrite")
        .save(path))
