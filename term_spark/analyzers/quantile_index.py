"""Persisted quantile-sketch index — the incremental-ingestion tier
for DISTRIBUTION metrics (the sixth persisted tier: near-dup has the
MinHash index, substring dedup the gram index, chunk dedup the CDC
index, cardinality the HLL index, retrieval the BM25 postings index;
this is the QUANTILE tier).

A corpus-wide percentile dashboard (p50/p95/p99 of document length,
token count, quality score) rescans 100 TB on every refresh.  This
index persists one equi-depth quantile grid per (shard, column) — the
same mergeable state ``QuantileSketchAnalyzer`` computes (k grid
points + n/min/max, a few KB) — so corpus-wide quantiles for any
tracked column merge from O(shards × columns) tiny rows: the probe
reads kilobytes, and a new ingest batch sketches ONLY ITSELF in one
fused ``percentile_approx`` aggregation and appends one row per
column.

Append soundness (the build_minhash_index standard, dedup.py:980):
each shard's grid is computed from that shard's rows alone, so shard
rows are row-local by construction — appending shard B's rows next to
shard A's touches nothing of A, and the probe's weighted-grid merge
(``QuantileSketchAnalyzer.merge_states``) is order-invariant because
it sorts the union of weighted grid points before resampling.  Unlike
the HLL tier's register-MAX the merge is NOT idempotent — appending
the SAME shard twice double-weights it, exactly like COUNT — so the
tier matches COUNT-discipline appends (each batch appended once),
which is the discipline every counts-add tier (substring grams, CDC
chunks) already requires.

Error bound: quantiles read off the merged state carry the analyzer's
normalized rank-error guarantee ε ≤ 2/k + 1/accuracy per merge level
(derivation in quantile_sketch.py).  The probe over shard rows is ONE
merge level; probing a COMPACTED index adds a second (the compaction
fold is itself a merge), so the report's attestation tolerance
defaults to 2·(2/k + 1/accuracy) — ~2.1 % normalized rank at the
default k=200/accuracy=10000, loose enough to survive compaction and
tight enough that a lost shard, a double append, or a wrong merge
trips it loudly.

Params are pinned at build time (k, accuracy, tracked column set):
grids built at different k merge with the wrong per-point mass and
silently degrade the bound, so ``mode='append'`` under different
params raises (the build_distinct_index standard).

Scale shape: the build is ONE fused aggregation over the shard (every
column's n/min/max/percentile_approx rides the same partial-agg scan —
map-side combined GK sketches, one shuffle of grid arrays, no row data
movement); the probe collects O(shards × columns) rows to the driver
and merges there — kilobytes at thousands of ingest batches.

Reference relationship: the reference's KLL analyzer
(term-guard/src/analyzers/advanced/kll_sketch.rs:142-229) keeps a
mergeable quantile state for exactly this reprofile-without-rescan
purpose; this module is its persisted multi-shard form, reusing the
repo's grid-state realization instead of porting the KLL compactor.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.security import validate_identifiers
from .base import AnalyzerState
from .quantile_sketch import QuantileSketchAnalyzer

DEFAULT_K = 200
DEFAULT_ACCURACY = 10000


def _bound(k: int, accuracy: int) -> float:
    return 2.0 / k + 1.0 / accuracy


def build_quantile_index(df: DataFrame, columns: Sequence[str],
                         index_path: str, k: int = DEFAULT_K,
                         accuracy: int = DEFAULT_ACCURACY,
                         mode: str = "overwrite") -> None:
    """Sketch ``columns`` of this shard into one grid row per column
    and persist under ``index_path`` (``meta`` pins k + accuracy + the
    column set; ``grids`` holds (col_name, n, mn, mx, grid, n_shards)
    per shard).

    One fused aggregation: every column's count/min/max/
    ``percentile_approx`` grid rides the same scan.  Values cast to
    double (the quantile domain); all-NULL or empty shards contribute
    a zero-mass row that the probe's merge ignores — dropped at write
    so ``n_shards`` keeps meaning "shards that contributed data".
    """
    cols = list(validate_identifiers(columns))
    if not cols:
        raise ValueError("build_quantile_index: empty column list")
    if not 2 <= int(k) <= 10000:
        raise ValueError(f"k must be in [2, 10000], got {k}")
    spark = df.sparkSession
    if mode == "append":
        try:
            meta = spark.read.parquet(f"{index_path}/meta").collect()[0]
        except Exception:
            meta = None
        if meta is not None and (
                meta["k"] != k or meta["accuracy"] != accuracy
                or set(meta["columns"]) != set(cols)):
            raise ValueError(
                f"append with (k={k}, accuracy={accuracy}, "
                f"columns={sorted(cols)}) onto an index built with "
                f"(k={meta['k']}, accuracy={meta['accuracy']}, "
                f"columns={sorted(meta['columns'])}) — params are pinned "
                "at build time")
    probs = [(j + 0.5) / int(k) for j in range(int(k))]
    aggs = []
    for c in cols:
        v = F.col(c).cast("double")
        aggs.extend([
            F.count(v).alias(f"__n_{c}"),
            F.min(v).alias(f"__mn_{c}"),
            F.max(v).alias(f"__mx_{c}"),
            F.percentile_approx(v, probs, int(accuracy)).alias(f"__g_{c}"),
        ])
    one = df.agg(*aggs)
    rows = one.select(F.explode(F.array(*[
        F.struct(F.lit(c).alias("col_name"),
                 F.col(f"__n_{c}").alias("n"),
                 F.col(f"__mn_{c}").alias("mn"),
                 F.col(f"__mx_{c}").alias("mx"),
                 F.col(f"__g_{c}").alias("grid"),
                 F.lit(1).cast("bigint").alias("n_shards"))
        for c in cols])).alias("r")).select("r.*")
    rows.filter(F.col("n") > 0).write.mode(mode) \
        .parquet(f"{index_path}/grids")
    spark.createDataFrame(
        [(int(k), int(accuracy), cols)],
        "k int, accuracy int, columns array<string>") \
        .write.mode("overwrite").parquet(f"{index_path}/meta")


def _merged_states(spark, index_path: str):
    """Collect the shard grid rows (O(shards × columns), KBs) and merge
    per column with the analyzer's weighted-grid merge.  Returns
    (meta_row, {col_name: (merged AnalyzerState, n_shards)})."""
    meta = spark.read.parquet(f"{index_path}/meta").collect()[0]
    rows = spark.read.parquet(f"{index_path}/grids").collect()
    ana = QuantileSketchAnalyzer("__probe__", k=int(meta["k"]),
                                 accuracy=int(meta["accuracy"]))
    by_col: dict = {}
    shards: dict = {}
    for r in rows:
        st = AnalyzerState(
            n=int(r["n"]),
            mn=float(r["mn"]) if r["mn"] is not None else None,
            mx=float(r["mx"]) if r["mx"] is not None else None,
            grid=[float(g) for g in (r["grid"] or [])])
        by_col.setdefault(r["col_name"], []).append(st)
        shards[r["col_name"]] = shards.get(r["col_name"], 0) + int(r["n_shards"])
    merged = {c: (ana.merge_states(sts), shards[c])
              for c, sts in by_col.items()}
    return meta, ana, merged


def quantiles_from_index(spark, index_path: str,
                         probs: Sequence[float]) -> DataFrame:
    """Corpus-wide quantile estimates from the persisted shard grids:
    one row per (tracked column, requested prob) — (col_name, p,
    q_est, n_rows, n_shards).  Reads only the grid table (KBs); the
    corpus is never touched.  Estimates carry the module-docstring
    rank-error bound over every shard ever appended."""
    meta, ana, merged = _merged_states(spark, index_path)
    out = []
    for c in sorted(merged):
        st, n_sh = merged[c]
        for p in probs:
            out.append((c, float(p), ana.quantile_from_state(st, float(p)),
                        st["n"], n_sh))
    return spark.createDataFrame(
        out, "col_name string, p double, q_est double, n_rows bigint, "
             "n_shards bigint")


def quantile_index_report(spark, index_path: str,
                          probs: Sequence[float],
                          exact_df: DataFrame | None = None,
                          tolerance: float | None = None) -> DataFrame:
    """The probe plus (optionally) a same-query exact verify: when
    ``exact_df`` is given, each (column, prob)'s exact quantile is
    computed from it and the report carries ``within_bound`` — the
    NORMALIZED RANK of the estimate inside the exact data lands within
    ``tolerance`` of the requested prob (default 2·(2/k + 1/accuracy),
    the two-merge-level bound from the module docstring).  This is the
    attestation the driver oracle pins TRUE (the distinct_index_report
    standard): a lost shard, double append, or wrong merge moves the
    estimate's rank outside the band and trips it loudly.

    Rank check, not value check, because rank is what the sketch
    guarantees — on heavy-tailed data a 1 % rank error can be a large
    VALUE gap, which is the sketch working as designed.

    The exact verify is one fused aggregation over ``exact_df``
    (count_if per (column, prob) at the estimate point) — audits and
    CI gates only; steady-state consumers read the estimates alone.
    """
    meta, ana, merged = _merged_states(spark, index_path)
    if tolerance is None:
        tolerance = 2.0 * _bound(int(meta["k"]), int(meta["accuracy"]))
    est = quantiles_from_index(spark, index_path, probs)
    if exact_df is None:
        return est.orderBy("col_name", "p")
    # one fused pass: for every (col, p), the exact-data rank of q_est
    aggs = []
    pairs = []
    for c in sorted(merged):
        v = F.col(c).cast("double")
        st, _ = merged[c]
        for p in probs:
            q_est = ana.quantile_from_state(st, float(p))
            tag = f"__r_{c}_{str(p).replace('.', '_')}"
            aggs.append((F.count_if(v <= F.lit(float(q_est))) /
                         F.count(v)).alias(tag))
            pairs.append((c, float(p), tag))
    ranks = exact_df.agg(*aggs).collect()[0]
    att = spark.createDataFrame(
        [(c, p, float(ranks[tag])) for c, p, tag in pairs],
        "col_name string, p double, rank_at_est double")
    return (est.join(att, ["col_name", "p"])
            .withColumn("within_bound",
                        F.abs(F.col("rank_at_est") - F.col("p"))
                        <= F.lit(float(tolerance)))
            .drop("rank_at_est")
            .orderBy("col_name", "p"))


def compact_quantile_index(spark, index_path: str) -> None:
    """Fold the shard grid rows into ONE row per column (the
    ``compact_distinct_index`` role): after thousands of ingest
    batches the grid table is O(shards × columns) rows — still tiny,
    but compaction restores O(columns) and every future probe merges
    one grid per column instead of one per shard.

    The fold IS the probe's weighted-grid merge, so it is bounded, not
    lossless: a compacted grid carries one extra merge level of rank
    error (≤ 2/k + 1/accuracy more), which the report's default
    two-level tolerance already budgets for.  k/accuracy/columns in
    ``meta`` are untouched — appends keep composing, and a compacted
    row merges with later shard rows exactly like any other shard row
    (its n carries the folded mass).

    Driver-side fold (the table is KBs by construction), written to a
    sibling temp dir then swapped with checked renames so a concurrent
    probe never sees a half-written table.
    """
    meta, ana, merged = _merged_states(spark, index_path)
    rows = []
    for c in sorted(merged):
        st, n_sh = merged[c]
        rows.append((c, st["n"], st["mn"], st["mx"], st["grid"], n_sh))
    compacted = spark.createDataFrame(
        rows, "col_name string, n bigint, mn double, mx double, "
              "grid array<double>, n_shards bigint")
    tmp = f"{index_path}/grids__compacting"
    compacted.write.mode("overwrite").parquet(tmp)
    from ..sources import hadoop_swap_dir
    hadoop_swap_dir(spark, f"{index_path}/grids", tmp)
