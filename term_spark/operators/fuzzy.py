"""Fuzzy key matching — blocked edit-distance pairs and greedy
canonicalization for entity-resolution-style cleanup of NAME/KEY
columns (brand strings, product names, vendor labels, file paths):
"near-duplicate KEYS", the record-linkage sibling of the document
near-dup tiers.

Parity: beyond-reference extension — the reference (term-guard)
validates columns against patterns and containment sets
(term-guard/src/constraints/format.rs) but has no approximate string
matching; this module adds the classical blocking + edit-distance
pipeline (Fellegi & Sunter 1969 record-linkage framing; the
sorted-neighborhood/blocking practice surveyed in Christen's "Data
Matching", 2012) the way a training-data pipeline needs it: misspelled
brand labels and vendor names fragment groupBys and join keys long
before they fragment documents.

Scale shape (the whole point):
- Matching runs on the DISTINCT VALUE DICTIONARY, not the rows: a
  100 TB fact table with 50k distinct brand strings does one grouped
  count (map-side combined) and then all pairing work happens on 50k
  rows.
- The quadratic is BLOCKED: candidate pairs form only within a
  caller-chosen block key (default: the value's last whitespace token
  — surname-style blocking for "adjective noun" labels; pass any
  expression, e.g. ``F.soundex`` for phonetic blocking of personal
  names).  Self-join on the block key is an equi-join — no cartesian,
  AQE-splittable if one block is hot.
- The distance is Spark's built-in ``levenshtein`` — JVM codegen on
  the pruned pairs, never a Python UDF.

Determinism: pairs are emitted once with ``name_a < name_b``;
canonicalization breaks ties by (count DESC, name ASC), so the elected
canonical is a pure function of the data.
"""

from __future__ import annotations

from typing import Optional

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from ..core.constraint import Constraint
from ..functions.security import validate_identifier


def _default_block(col: Column) -> Column:
    """Last whitespace token — surname-style blocking for multi-token
    labels; single-token values block on themselves."""
    return F.element_at(F.split(F.trim(col), r"\s+"), -1)


def blocked_fuzzy_pairs(df: DataFrame, column: str,
                        max_distance: int = 2,
                        block: Optional[Column] = None,
                        min_count: int = 1) -> DataFrame:
    """Candidate near-duplicate VALUE pairs of ``column``: distinct
    values (with their row counts) are blocked, paired within each
    block, and kept when ``levenshtein <= max_distance``.

    Returns (name_a, name_b, distance, n_a, n_b) with name_a < name_b,
    ordered.  ``min_count`` drops dictionary entries rarer than the
    threshold before pairing (typo candidates are usually rare, but a
    noisy OCR column may need the floor to keep blocks small).
    """
    validate_identifier(column)
    if max_distance < 1:
        raise ValueError(f"max_distance must be >= 1, got {max_distance}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    col = F.col(column)
    dictionary = (df.filter(col.isNotNull())
                  .groupBy(col.alias("name"))
                  .agg(F.count(F.lit(1)).alias("n"))
                  .filter(F.col("n") >= min_count))
    blk = (block if block is not None
           else _default_block(F.col("name"))).alias("blk")
    d = dictionary.select("name", "n", blk)
    left = d.select(F.col("name").alias("name_a"),
                    F.col("n").alias("n_a"), F.col("blk"))
    right = d.select(F.col("name").alias("name_b"),
                     F.col("n").alias("n_b"),
                     F.col("blk").alias("blk_b"))
    pairs = left.join(right, (F.col("blk") == F.col("blk_b"))
                      & (F.col("name_a") < F.col("name_b")))
    return (pairs
            .withColumn("distance",
                        F.levenshtein(F.col("name_a"), F.col("name_b")))
            .filter(F.col("distance") <= max_distance)
            .select("name_a", "name_b",
                    F.col("distance").cast("bigint").alias("distance"),
                    "n_a", "n_b")
            .orderBy("name_a", "name_b"))


def fuzzy_canonicalize(df: DataFrame, column: str,
                       max_distance: int = 2,
                       block: Optional[Column] = None) -> DataFrame:
    """Greedy one-hop canonical mapping: each value maps to the most
    frequent value within ``max_distance`` in its block (itself
    included), ties by (count DESC, name ASC).

    One hop is deliberate — it is idempotent-by-construction ONLY on
    the mapped output's second application if distances still hold, so
    chains (a~b~c with a≁c) canonicalize to the local heavyweight
    rather than transitively merging unlike values; full transitive
    clustering is what ``dedup.neardup_components``-style union-find
    is for, at the caller's choice.

    Returns (name, canonical, n, canonical_n), ordered by name.
    """
    validate_identifier(column)
    col = F.col(column)
    dictionary = (df.filter(col.isNotNull())
                  .groupBy(col.alias("name"))
                  .agg(F.count(F.lit(1)).alias("n")))
    blk = (block if block is not None
           else _default_block(F.col("name"))).alias("blk")
    d = dictionary.select("name", "n", blk)
    cand = (d.alias("a")
            .join(d.select(F.col("name").alias("cand"),
                           F.col("n").alias("cand_n"),
                           F.col("blk").alias("blk_b")),
                  F.col("blk") == F.col("blk_b"))
            .filter(F.levenshtein(F.col("name"), F.col("cand"))
                    <= max_distance))
    best = (cand.groupBy("name", "n")
            .agg(F.max(F.struct(F.col("cand_n").alias("cn"),
                                # lexicographically SMALLEST name wins a
                                # count tie: order by inverted name is
                                # not expressible in one max, so carry
                                # the name and re-elect via min below
                                F.col("cand").alias("cand")))
                 .alias("__top")))
    # max(struct(count, name)) breaks count ties by LARGEST name; the
    # contract wants smallest, so re-join candidates at the winning
    # count and take min(name) — both passes stay on the dictionary
    win = (cand.join(best.select("name",
                                 F.col("__top.cn").alias("win_n")),
                     "name")
           .filter(F.col("cand_n") == F.col("win_n"))
           .groupBy("name", "n", "win_n")
           .agg(F.min("cand").alias("canonical")))
    return (win.select("name", "canonical", "n",
                       F.col("win_n").alias("canonical_n"))
            .orderBy("name"))


class FuzzyFragmentationConstraint(Constraint):
    """``has_canonical_keys``: the fraction of rows whose value is NOT
    its own fuzzy canonical (the fragmentation ratio — rows that would
    move under canonicalization) must stay under ``max_ratio``.  The
    release gate over this module: a vendor/brand/label column whose
    fragmentation creeps up is silently splitting groupBys and join
    keys downstream.

    Metric = Σ n(name ≠ canonical) / Σ n — row-weighted, so one rare
    typo barely moves it but a heavyweight split (two spellings of the
    top brand) screams.  Failure names the heaviest fragmented value
    and where it wants to go.

    Self-executing; job shape = fuzzy_canonicalize on the value
    dictionary (see module docstring for the scale argument).
    """

    name = "fuzzy_fragmentation"

    def __init__(self, column: str, max_ratio: float = 0.01,
                 max_distance: int = 2, block: Optional[Column] = None):
        if not 0 <= max_ratio < 1:
            raise ValueError(f"max_ratio must be in [0, 1), got {max_ratio}")
        self.column = validate_identifier(column)
        self.max_ratio = float(max_ratio)
        self.max_distance = int(max_distance)
        self.block = block

    def evaluate(self, ctx) -> "ConstraintResult":
        from ..core.result import ConstraintResult
        canon = fuzzy_canonicalize(ctx.df(self.table), self.column,
                                   max_distance=self.max_distance,
                                   block=self.block)
        # Aggregate-side ratio (r13 verdict ask #3): the old form
        # collected the WHOLE value dictionary and summed in Python —
        # fine for brand labels, but on a high-cardinality key column
        # the dictionary IS the table.  The ratio is one Spark
        # aggregate; the driver receives exactly ONE row here.
        agg = canon.agg(
            F.sum("n").alias("total"),
            F.sum(F.when(F.col("name") != F.col("canonical"), F.col("n"))
                  .otherwise(F.lit(0))).alias("moved")).collect()[0]
        total = int(agg["total"] or 0)
        if not total:
            return self._finish(ConstraintResult.skipped(
                f"fuzzy_fragmentation({self.column}): no values"))
        ratio = int(agg["moved"] or 0) / total
        if ratio <= self.max_ratio:
            return self._finish(ConstraintResult.success(ratio))
        # failure path only: fetch the single heaviest fragmented value
        # (count DESC, name ASC — the same winner the old Python max
        # elected over the name-ordered collect) via a bounded top-1
        worst = (canon.filter(F.col("name") != F.col("canonical"))
                 .orderBy(F.col("n").desc(), F.col("name").asc())
                 .limit(1).collect())[0]
        return self._finish(ConstraintResult.failure(
            ratio,
            f"fuzzy_fragmentation({self.column}) = {ratio:.4f} exceeds "
            f"{self.max_ratio} — heaviest: {worst['name']!r} "
            f"(n={worst['n']}) canonicalizes to {worst['canonical']!r} "
            f"(n={worst['canonical_n']})"))
