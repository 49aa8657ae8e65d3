"""Corpus curation pipeline — the composition a training-data stack
runs over raw documents, assembled from the individual operators:

    raw → exact dedup → near-dup dedup (MinHash-LSH candidates +
    exact-Jaccard verification) → quality filter → language filter
    → curated corpus + per-stage accounting

Everything stays a DataFrame until the caller acts; per-stage counts
come from one action each. At 100 TB the exact-dedup groupBy and the
LSH band join are the only wide shuffles; quality/language are narrow.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from . import dedup as D
from . import text as T
from ..core.constraint import Constraint
from ..session import local_df

#: connected_components switches to driver-side union-find at or below
#: this many directed edges — the bounded-collect budget (~tens of MB);
#: above it the distributed min-label propagation runs unchanged.
_CC_DRIVER_MAX_EDGES = 1_000_000


@dataclass
class CurationReport:
    input_docs: int = 0
    after_line_dedup: int = 0
    after_exact_dedup: int = 0
    after_near_dedup: int = 0
    after_quality: int = 0
    after_language: int = 0
    stages: Dict[str, int] = field(default_factory=dict)

    def removed(self) -> Dict[str, int]:
        return {
            "exact_dups": self.input_docs - self.after_exact_dedup,
            "near_dups": self.after_exact_dedup - self.after_near_dedup,
            "low_quality": self.after_near_dedup - self.after_quality,
            "wrong_language": self.after_quality - self.after_language,
        }


def near_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
               k: int = 3, jaccard_threshold: float = 0.85,
               num_hashes: int = 16, bands: int = 4,
               max_iterations: int = 50) -> DataFrame:
    """Remove near-duplicates: LSH candidates → exact Jaccard verify →
    connected components over confirmed pairs → keep the minimum id of
    each duplicate cluster. ``max_iterations`` caps the component
    propagation rounds (raise it if duplicate chains run deeper)."""
    # r15 (guide §5 lineage truncation): pin the candidate pairs —
    # ngram_jaccard_for_pairs consumes them at THREE points (the
    # semi-join prune + both pair-endpoint joins), so an unpinned
    # candidate table re-executes the whole signature pipeline
    # (shingle explode + 16 md5 min-aggs + band self-join) per
    # consumer. The pair list is orders of magnitude smaller than the
    # corpus by construction (it is the dedup premise), so the eager
    # checkpoint is a bounded small-table materialization.
    cands = (D.minhash_lsh_candidates(df, text_col, id_col, k, num_hashes,
                                      bands)
             .localCheckpoint(eager=True))
    # Verify ONLY the candidate pairs: the exact-Jaccard join fans out
    # from the LSH candidate list, so LSH actually bounds the O(pairs)
    # verification work instead of being a post-filter on an all-pairs
    # join.
    confirmed = (D.ngram_jaccard_for_pairs(df, cands, text_col, id_col, k,
                                           jaccard_threshold)
                 .localCheckpoint(eager=True))  # consumed twice (edge union)
    # Collapse confirmed pairs into clusters and keep ONE doc per
    # cluster: pair-wise dropping (remove id_b per pair) keeps both
    # endpoints of an unverified-but-connected pair — e.g. pairs
    # (1,3),(2,3) would keep 1 AND 2 even though they share a cluster
    # through 3.
    return dedup_by_components(df, confirmed, id_col,
                               max_iterations=max_iterations)


def curate_corpus(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  min_quality: float = 0.3,
                  keep_languages: Optional[List[str]] = None,
                  jaccard_threshold: float = 0.85,
                  count_stages: bool = True,
                  clean_first: bool = False,
                  line_dedup_min_count: Optional[int] = None):
    """Returns (curated DataFrame, CurationReport).

    Round-5 stages, both off by default: ``clean_first`` runs the
    ftfy-lite ``clean_text`` pass before anything hashes the text
    (trivially-different whitespace/quotes otherwise defeats exact
    dedup), and ``line_dedup_min_count`` strips corpus-repeated
    boilerplate LINES before document-level dedup (boilerplate
    inflates every doc-pair similarity, which moves the Jaccard
    threshold's meaning). Stage order: clean → line dedup → exact
    dedup → near dedup → quality → language.
    """
    report = CurationReport()
    if count_stages:
        report.input_docs = df.count()

    if clean_first:
        df = df.withColumn(text_col, T.clean_text(text_col))
    if line_dedup_min_count:
        kept_lines, _ = T.dedup_lines(df, text_col, id_col,
                                      min_count=line_dedup_min_count)
        # dedup_lines returns only (id, text); rejoin the payload
        # columns (a doc that was ALL boilerplate drops out here)
        df = (df.drop(text_col)
                .join(kept_lines, id_col))
        if count_stages:
            report.after_line_dedup = df.count()

    stage1 = D.dedup_exact(df, text_col, id_col)
    if count_stages:
        report.after_exact_dedup = stage1.count()

    stage2 = near_dedup(stage1, text_col, id_col,
                        jaccard_threshold=jaccard_threshold)
    if count_stages:
        report.after_near_dedup = stage2.count()

    stage3 = (stage2.withColumn("__q", T.quality_score(text_col))
                    .filter(F.col("__q") >= min_quality).drop("__q"))
    if count_stages:
        report.after_quality = stage3.count()

    if keep_languages:
        stage4 = (stage3.withColumn("__lang", T.language_id(text_col))
                        .filter(F.col("__lang").isin(keep_languages))
                        .drop("__lang"))
    else:
        stage4 = stage3
    if count_stages:
        report.after_language = stage4.count()
        report.stages = {
            "input": report.input_docs,
            **({"line_dedup": report.after_line_dedup}
               if line_dedup_min_count else {}),
            "exact_dedup": report.after_exact_dedup,
            "near_dedup": report.after_near_dedup,
            "quality": report.after_quality,
            "language": report.after_language,
        }
    return stage4, report


def connected_components(pairs: DataFrame, id_a: str = "id_a",
                         id_b: str = "id_b", max_iterations: int = 50) -> DataFrame:
    """Cluster near-duplicate PAIRS into components: (id, component)
    where component = min id reachable through the pair graph.

    Large-scale dedup needs clusters, not pairs — "A~B, B~C" must
    collapse to ONE keeper even though (A,C) was never emitted.
    Min-label propagation: each round every vertex takes the min label
    in its neighborhood; converges in O(graph diameter) rounds, and
    near-dup graphs are shallow (dup clusters are cliques or short
    chains, diameter ≤ ~4). Per round: one join + one groupBy —
    shuffle on vertex id, no driver-side graph. ``localCheckpoint``
    truncates the growing lineage each round (iterative-plan blowup is
    the classic failure here). Stops early when a round changes no
    label (one lightweight count per round).

    r15 (guide §1.1 first-principles pass counting): a confirmed
    near-dup pair graph is usually TINY relative to its corpus — the
    whole point of dedup is that duplicates are the exception — yet
    every propagation round costs two Spark jobs plus an eager
    checkpoint. When the (already materialized) edge list is small
    enough to be a bounded driver collect (≤ ``_CC_DRIVER_MAX_EDGES``
    undirected edges, the same bounded-collect budget the KMV/MG
    sketch paths use), run union-find on the driver instead: exact
    min-reachable labels in O(E α(E)) with ZERO further jobs. Output
    is identical to converged propagation — both compute
    component = min id reachable. Above the bound (100 TB posture) the
    distributed loop runs unchanged; Python/Spark id comparisons agree
    on the integral and UTF8-binary string keys used here (Spark's
    default UTF8_BINARY collation = UTF-8 byte order = Python
    code-point order).
    """
    edges = (pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
             .union(pairs.select(F.col(id_b).alias("src"),
                                 F.col(id_a).alias("dst")))
             .distinct())
    edges = edges.localCheckpoint()
    n_edges = edges.count()
    if n_edges <= _CC_DRIVER_MAX_EDGES:
        id_type = edges.schema["src"].dataType.simpleString()
        parent: dict = {}

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:
                parent[x], x = root, parent[x]
            return root

        for a, b in ((r["src"], r["dst"]) for r in edges.collect()):
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by MIN label so every root IS the component min
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        out = sorted((v, find(v)) for v in parent)
        return local_df(pairs.sparkSession, out,
                        f"id {id_type}, component {id_type}")
    labels = (edges.select(F.col("src").alias("id"))
              .distinct()
              .withColumn("component", F.col("id")))

    for _ in range(max_iterations):
        nbr_min = (edges.join(labels, edges["dst"] == labels["id"])
                   .groupBy("src")
                   .agg(F.min("component").alias("nbr_component")))
        updated = (labels.join(nbr_min, labels["id"] == nbr_min["src"], "left")
                   .select(labels["id"],
                           F.least("component",
                                   F.coalesce("nbr_component", "component"))
                           .alias("component"),
                           (F.col("nbr_component") < F.col("component"))
                           .alias("__changed")))
        updated = updated.localCheckpoint()
        changed = updated.filter("__changed").count()
        labels = updated.drop("__changed")
        if changed == 0:
            return labels
    import warnings
    warnings.warn(
        f"connected_components hit max_iterations={max_iterations} before "
        "convergence — labels may be split across what is one component "
        "(graph diameter exceeds the cap). Raise max_iterations.",
        RuntimeWarning)
    return labels


def dedup_by_components(df: DataFrame, pairs: DataFrame,
                        id_col: str = "doc_id", id_a: str = "id_a",
                        id_b: str = "id_b",
                        max_iterations: int = 50) -> DataFrame:
    """Keep one representative (min id) per near-dup component; rows
    not in any pair pass through untouched.

    ``max_iterations`` defaults to ``connected_components``'s 50 — a
    lower cap here would silently leave deep duplicate chains split
    into multiple components (extra near-duplicates kept)."""
    comp = connected_components(pairs, id_a, id_b, max_iterations)
    drop = comp.filter(F.col("id") != F.col("component")).select("id")
    return df.join(drop, df[id_col] == drop["id"], "left_anti")


#: split-name -> weight; hash_split assigns each row deterministically
DEFAULT_SPLITS = {"train": 0.9, "val": 0.05, "test": 0.05}


def hash_split(df: DataFrame, id_col: str = "doc_id",
               splits: dict = None, seed: str = "term",
               out: str = "split") -> DataFrame:
    """Deterministic train/val/test assignment from md5(seed‖id) —
    stable across runs, machines, and engines (no sampleBy RNG), so a
    document never migrates between splits when the corpus grows.
    Narrow op: no shuffle, no state. Bucket = first 15 md5 hex digits
    mod 1e6 (same arithmetic is expressible in SQL for the oracle).
    """
    splits = dict(splits or DEFAULT_SPLITS)
    if not splits or any(w <= 0 for w in splits.values()):
        raise ValueError("splits must be non-empty with positive weights")
    total = sum(splits.values())
    bucket = F.pmod(
        F.conv(F.substring(
            F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))),
            1, 15), 16, 10).cast("bigint"),
        F.lit(1_000_000))
    expr = None
    acc = 0.0
    items = list(splits.items())
    for name, w in items[:-1]:
        acc += w / total * 1_000_000
        cond = bucket < F.lit(int(acc))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn(out, expr)


def decontaminate_exact(df: DataFrame, eval_df: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        eval_text_col: str = "text") -> DataFrame:
    """Drop training docs whose normalized fingerprint matches ANY
    eval-set document (benchmark decontamination, exact tier). One
    broadcast-or-shuffle anti-join on the md5 fingerprint."""
    fps = (eval_df.select(T.fingerprint(eval_text_col))
           .withColumnRenamed("fingerprint", "__fp").distinct())
    return (df.select("*", T.fingerprint(text_col))
            .withColumnRenamed("fingerprint", "__fp")
            .join(fps, "__fp", "left_anti")
            .drop("__fp"))


def decontaminate_bloom(df: DataFrame, eval_df: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        eval_text_col: str = "text", fpp: float = 0.001,
                        expected_items: Optional[int] = None) -> DataFrame:
    """Bloom-filter decontamination — the shuffle-free 100 TB tier of
    the exact pass.  ``decontaminate_exact``'s anti-join either ships
    corpus fingerprints through a shuffle or broadcasts the eval side
    as a full hash relation; here the eval set compresses into a Bloom
    BITMAP of ~1.44·log2(1/fpp) bits per doc (~1.8 MB for a
    million-doc eval suite at the 0.1% default) and the corpus pass is
    map-only: the training corpus never shuffles.

    Spark shape (built from first principles — this Spark exposes no
    SQL bloom functions): the k probe positions are JVM-side codegen
    (``pmod(xxhash64(seed, fingerprint), n_bits)``), the build is a
    distributed ``bit_or`` over ≤ n_bits/64 word rows (only that small
    word table reaches the driver), and the probe is an Arrow-batched
    bitmap test — numpy reads k precomputed position columns per row
    and ANDs bits; no hashing happens in Python.

    Asymmetry note: Bloom false POSITIVES (rate ≈ ``fpp``) over-drop
    clean training docs — the conservative direction for
    decontamination; false negatives cannot occur, so every truly
    contaminated doc is dropped, the exact tier's guarantee.  NULL /
    unfingerprintable text is always kept, matching the anti-join's
    NULL-key semantics.  Sizing: ``expected_items`` defaults to one
    distinct-count job over the (small) eval side; pass it explicitly
    to skip that job — but note UNDERSTATING it raises the effective
    false-positive rate past ``fpp`` (fewer bits than the true
    cardinality needs), so only pin it to a trusted count.

    The bitmap ships to executors via ``sc.broadcast`` (fetched once
    per executor, torrent-style), not closure capture — at the default
    sizing that is ~1.8 MB per million eval docs, so even a 100M-doc
    eval suite (~180 MB) rides the broadcast path rather than being
    re-pickled into every task."""
    import math

    import numpy as np

    if not 0.0 < fpp < 1.0:
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    if expected_items is not None and expected_items < 1:
        raise ValueError(
            f"expected_items must be >= 1, got {expected_items}")
    eval_keys = (eval_df.select(T.fingerprint(eval_text_col))
                 .withColumnRenamed("fingerprint", "__fp")
                 .filter(F.col("__fp").isNotNull()).distinct())
    n_items = expected_items
    if n_items is None:
        n_items = max(eval_keys.count(), 1)
    n_bits = max(64, int(-n_items * math.log(fpp) / (math.log(2) ** 2)) + 1)
    n_bits = ((n_bits + 63) // 64) * 64
    k = max(1, round(math.log(2) * n_bits / n_items))

    def positions(fp_col):
        return [F.pmod(F.xxhash64(F.lit(s), fp_col), F.lit(n_bits))
                for s in range(k)]

    pos = eval_keys.select(
        F.explode(F.array(*positions(F.col("__fp")))).alias("p"))
    words = (pos.groupBy(F.expr("CAST(p DIV 64 AS BIGINT)").alias("w"))
                .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), "
                            "CAST(p % 64 AS INT)))").alias("bits")))
    bitmap = np.zeros(n_bits // 64, dtype=np.int64)
    for r in words.collect():
        bitmap[int(r["w"])] = r["bits"]
    bc_bitmap = df.sparkSession.sparkContext.broadcast(
        bitmap.view(np.uint64))

    fp = T.fingerprint(text_col)
    pos_cols = [c.alias(f"__p{i}") for i, c in enumerate(positions(fp))]
    probe = df.select("*", F.isnull(fp).alias("__fpnull"), *pos_cols)
    out_schema = df.schema
    out_cols = list(df.columns)

    def bloom_probe(batches):
        bm = bc_bitmap.value
        for pdf in batches:
            if pdf.empty:
                continue
            p = np.stack([pdf[f"__p{i}"].to_numpy(dtype=np.int64)
                          for i in range(k)], axis=1).astype(np.uint64)
            hit = (bm[p >> np.uint64(6)]
                   >> (p & np.uint64(63))) & np.uint64(1)
            contaminated = hit.all(axis=1) & ~pdf["__fpnull"].to_numpy()
            yield pdf.loc[~contaminated, out_cols]

    return probe.mapInPandas(bloom_probe, out_schema)


def decontaminate_ngram(df: DataFrame, eval_df: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        eval_text_col: str = "text", k: int = 8,
                        max_overlap: int = 0) -> DataFrame:
    """Drop training docs sharing more than ``max_overlap`` distinct
    k-gram shingles with the eval set (catches paraphrased/partial
    contamination exact matching misses; k≈8-13 words is the standard
    benchmark-decontamination regime).

    Shape: eval shingles (distinct, typically small → broadcast by
    AQE) inverted-index-join against doc shingles, count hits per doc,
    anti-join the offenders. Work is O(|doc shingles|) map + one
    shuffle; no pairwise comparison."""
    from .dedup import _doc_shingles
    doc_sh = _doc_shingles(df, text_col, id_col, k)
    eval_sh = (_doc_shingles(
        eval_df.select(F.monotonically_increasing_id().alias("__eid"),
                       F.col(eval_text_col)),
        eval_text_col, "__eid", k)
        .select("shingle").distinct())
    hits = (doc_sh.join(eval_sh, "shingle")
            .groupBy("id").agg(F.count(F.lit(1)).alias("n_hits"))
            .filter(F.col("n_hits") > max_overlap))
    return df.join(hits.withColumnRenamed("id", id_col), id_col, "left_anti")


def stratified_sample_exact(df: DataFrame, strata_col: str,
                            n_per_stratum: int, id_col: str = "doc_id",
                            seed: str = "term") -> DataFrame:
    """EXACTLY n rows per stratum (or all rows of smaller strata),
    chosen deterministically: rank by md5(seed‖id) within each stratum
    and keep the first n. Unlike ``sampleBy`` (Bernoulli — approximate
    counts, RNG state), the selection is reproducible across runs and
    engines and the per-stratum count is exact — what a balanced
    training-mix builder actually needs. One shuffle on the stratum
    key; rows sort only within their stratum."""
    from pyspark.sql import Window
    rank_key = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    w = Window.partitionBy(strata_col).orderBy(rank_key, id_col)
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= n_per_stratum)
            .drop("__rn"))


def weighted_sample_exact(df: DataFrame, weight_col, n: int,
                          by: Optional[str] = None,
                          id_col: str = "doc_id",
                          seed: str = "term") -> DataFrame:
    """EXACTLY ``n`` rows (per ``by`` group when given), selected
    WITHOUT replacement with probability proportional to ``weight_col``
    — Efraimidis & Spirakis 2006 (A-ES): each row draws a key
    u^(1/w) with u uniform in (0, 1], and the top-n keys ARE a
    weight-proportional sample without replacement.  The uniform is
    md5-derived from (seed, id) — no RNG state, reproducible across
    runs AND engines, growth-stable (a row's key never changes when
    other rows appear), so the selection is oracle-checkable.

    This completes the sampling family's quadrant: hash_split
    (uniform, fractions), stratified_sample_exact (uniform, exact n),
    weighted_sample (weighted, Bernoulli/approximate n) — this is
    (weighted, exact n): "give me exactly 10k docs per source, chosen
    proportional to quality score", the training-mix ask the other
    three can't express.

    Rows with NULL or non-positive weight are EXCLUDED (their
    selection probability is zero/undefined — A-ES requires w > 0).
    Keys compare as ln(u)/w (monotone in u^(1/w), numerically stable
    for tiny weights), rounded to 12 for cross-engine float parity,
    ties broken by id.

    Scale: grouped form is one window on the ``by`` key (rank only —
    the same shuffle stratified_sample_exact pays); ungrouped is a
    bounded TakeOrdered top-n.  No weight normalization pass — A-ES
    keys depend only on each row's own weight.
    """
    if n <= 0:
        raise ValueError(f"n must be > 0, got {n}")
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    w = w.cast("double")
    # u in (0, 1]: 12 hex digits of md5 → [0, 2^48), +1 → (0, 2^48]
    u = ((F.conv(F.substring(
            F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))),
            1, 12), 16, 10).cast("double") + F.lit(1.0))
         / F.lit(float(2 ** 48)))
    key = F.round(F.log(u) / w, 12).alias("__aes_key")
    base = df.filter(w.isNotNull() & (w > 0)).withColumn("__aes_key", key)
    if by is not None:
        from pyspark.sql import Window
        win = Window.partitionBy(by).orderBy(F.col("__aes_key").desc(),
                                             F.col(id_col).asc())
        return (base.withColumn("__rn", F.row_number().over(win))
                .filter(F.col("__rn") <= n)
                .drop("__rn", "__aes_key"))
    return (base.orderBy(F.col("__aes_key").desc(), F.col(id_col).asc())
            .limit(n).drop("__aes_key"))


def weighted_sample(df: DataFrame, weight_col, id_col: str = "doc_id",
                    seed: str = "term") -> DataFrame:
    """Deterministic Bernoulli thinning: keep a row iff
    u(id) < weight, where u(id) = md5(seed‖id) mapped to [0, 1) and
    weight ∈ [0, 1] may be a column or expression (e.g. a quality
    score). No RNG state, engine-portable, stable as the corpus grows —
    the per-row decision never changes when other rows appear. Narrow
    (map-only); expected kept fraction = mean(weight).
    """
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    u = (F.conv(F.substring(
            F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))),
            1, 15), 16, 10).cast("double") / F.lit(float(16 ** 15)))
    return df.filter(u < w)


def source_mixing_rates(df: DataFrame, source_col: str = "source",
                        alpha: float = 0.5,
                        target_fraction: float = 1.0) -> DataFrame:
    """Temperature-based source mixing rates (the multilingual /
    multi-source rebalancing step: sampling probability ∝ n_s^alpha,
    alpha < 1 upweights small sources — Devlin et al. 2019 mBERT
    exponent-smoothed mixing; alpha=1 is proportional, 0 is uniform).

    Returns one row per source: n_docs, mix_weight (normalized
    n^alpha), target_docs (weight × target_fraction × corpus), and
    keep_rate = min(1, target/n) — the Bernoulli rate to feed
    ``weighted_sample``. One tiny aggregation; rates are data, not
    config, so they stay consistent with the corpus snapshot.
    """
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    from pyspark.sql import Window

    counts = df.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs"))
    # unpartitioned window over the per-source aggregate ONLY — the
    # input is |sources| rows, bounded by source cardinality
    w_all = Window.partitionBy()
    tot = F.sum("n_docs").over(w_all)
    wsum = F.sum(F.pow(F.col("n_docs").cast("double"), alpha)).over(w_all)
    weight = F.pow(F.col("n_docs").cast("double"), alpha) / wsum
    target = weight * tot * float(target_fraction)
    return (counts.select(
        "source", "n_docs",
        F.round(weight, 6).alias("mix_weight"),
        F.floor(target).cast("bigint").alias("target_docs"),
        F.round(F.least(F.lit(1.0), target / F.col("n_docs")), 6)
         .alias("keep_rate"))
        .orderBy("source"))


def mix_sources(df: DataFrame, source_col: str = "source",
                id_col: str = "doc_id", alpha: float = 0.5,
                target_fraction: float = 1.0,
                seed: str = "term") -> DataFrame:
    """Apply temperature mixing: compute per-source keep rates
    (source_mixing_rates) and deterministically thin each source to its
    rate (weighted_sample). Broadcast-joins the |sources|-row rate table
    — the corpus pass stays map-only."""
    rates = source_mixing_rates(df, source_col, alpha, target_fraction)
    rate_col = rates.select(F.col("source").alias("__src"),
                            F.col("keep_rate").alias("__rate"))
    joined = df.join(F.broadcast(rate_col),
                     df[source_col].eqNullSafe(F.col("__src")))
    return (weighted_sample(joined, F.col("__rate"), id_col, seed)
            .drop("__src", "__rate"))


def token_budget_sample(df: DataFrame, budget_tokens: int,
                        by: str = "source", text_col: str = "text",
                        id_col: str = "doc_id",
                        seed: str = "term") -> DataFrame:
    """Greedy token-budget selection per group: order each group's
    documents by md5(seed‖id) (a deterministic, growth-stable shuffle)
    and keep the prefix whose running token total stays within
    ``budget_tokens`` — how a training mix is actually capped ("200 B
    tokens of web, 50 B of code"), where doc-count caps miss because
    document lengths vary by orders of magnitude.

    Greedy-prefix semantics: a doc is kept iff its INCLUSIVE running
    total <= budget, so the budget is never exceeded; the first
    over-budget doc and everything after it in hash order are dropped
    (no best-fit backfill — determinism and one-pass beat the few
    percent of budget a knapsack would recover).

    Adds __n_tokens and __cum_tokens columns (callers drop them or
    feed them to accounting). One window partitioned by ``by`` — at
    100 TB shard a huge group further (e.g. (source, md5(id) % N)
    with budget/N per shard; the hash order makes shard budgets
    compose) the same way pack_sequences documents.
    """
    if budget_tokens <= 0:
        raise ValueError(f"budget_tokens must be > 0, got {budget_tokens}")
    from pyspark.sql import Window

    from .text import token_count
    rank_key = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    w = (Window.partitionBy(by).orderBy(rank_key, id_col)
               .rowsBetween(Window.unboundedPreceding, 0))
    return (df.withColumn("__n_tokens", token_count(text_col))
              .withColumn("__cum_tokens", F.sum("__n_tokens").over(w))
              .filter(F.col("__cum_tokens") <= int(budget_tokens)))


def dsir_log_weights(raw_df: DataFrame, target_df: DataFrame,
                     text_col: str = "text", id_col: str = "doc_id",
                     buckets: int = 4096,
                     smoothing: float = 1.0) -> DataFrame:
    """Hashed-n-gram importance weights for data selection (the DSIR
    recipe — Xie et al. 2023, "Data Selection for Language Models via
    Importance Resampling": score raw documents by how much more
    likely their hashed token features are under a TARGET domain than
    under the raw corpus, then sample proportionally).

    Per raw document: log w(doc) = Σ_tokens [log p_target(b(tok)) −
    log p_raw(b(tok))] where b() hashes tokens into ``buckets``
    add-``smoothing``-smoothed bins. Positive = looks like the target
    domain, negative = looks like generic raw text. Returns
    (id, n_tokens, log_weight rounded 6).

    Scale shape: each corpus explodes once into a bucket-count
    hash-agg (B rows — partial-aggregated map-side, so corpus size
    never crosses the wire, only ≤B rows per map partition); the two
    B-row tables full-outer-join into ONE broadcast weight table; the
    raw corpus explodes a second time and hash-joins the broadcast
    per token. Two map-only explodes + one broadcast join — the same
    model-as-data shape as quality_model_scores; no plan-literal
    bloat, no UDF, no driver-side feature vectors.
    """
    if buckets <= 0:
        raise ValueError(f"buckets must be > 0, got {buckets}")
    if smoothing <= 0:
        raise ValueError(f"smoothing must be > 0, got {smoothing}")
    B = int(buckets)
    # spread: a small corpus often arrives as ONE parquet split, and
    # the explode+regex pipeline would run single-threaded (measured
    # 2.2 s -> sub-second at sf0.1); at real scale the input already
    # has thousands of splits and the repartition is a no-op-cheap
    # reshuffle of doc rows, never of exploded tokens
    raw_df = D.spread(raw_df, id_col)
    target_df = D.spread(target_df, id_col)

    def bucketize(df):
        toks = T.norm_tokens(text_col)
        ex = (df.filter(F.col(text_col).isNotNull())
                .select(F.explode(toks).alias("tok")))
        b = (F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10)
             .cast("bigint") % B).cast("int")
        return ex.select(b.alias("b")).groupBy("b").agg(
            F.count(F.lit(1)).alias("n"))

    tgt = bucketize(target_df).localCheckpoint(eager=True)   # ≤B rows
    raw = bucketize(raw_df).localCheckpoint(eager=True)      # ≤B rows
    lam = float(smoothing)
    # totals stay IN the plan as broadcast 1-row aggs over the
    # checkpointed B-row tables (two driver collect()s here would add
    # two serial jobs per call for scalars Spark can join in)
    t_tot = tgt.agg(F.coalesce(F.sum("n"), F.lit(0)).alias("__tt"))
    r_tot = raw.agg(F.coalesce(F.sum("n"), F.lit(0)).alias("__rt"))
    weights = (tgt.withColumnRenamed("n", "nt")
               .join(raw.withColumnRenamed("n", "nr"), "b", "full_outer")
               .crossJoin(F.broadcast(t_tot))
               .crossJoin(F.broadcast(r_tot))
               .select(
                   "b",
                   (F.log((F.coalesce("nt", F.lit(0)) + lam) /
                          (F.col("__tt") + lam * B)) -
                    F.log((F.coalesce("nr", F.lit(0)) + lam) /
                          (F.col("__rt") + lam * B))).alias("w")))

    toks = T.norm_tokens(text_col)
    ex = (raw_df.filter(F.col(text_col).isNotNull())
                .select(F.col(id_col), F.explode(toks).alias("tok")))
    b = (F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10)
         .cast("bigint") % B).cast("int")
    return (ex.select(id_col, b.alias("b"))
              .join(F.broadcast(weights), "b")
              .groupBy(id_col)
              .agg(F.count(F.lit(1)).alias("n_tokens"),
                   F.round(F.sum("w"), 6).alias("log_weight")))


def dsir_sample(raw_df: DataFrame, target_df: DataFrame, k: int,
                text_col: str = "text", id_col: str = "doc_id",
                buckets: int = 4096, smoothing: float = 1.0,
                temperature: float = 1.0,
                seed: str = "dsir") -> DataFrame:
    """Select ``k`` raw documents toward the target domain via
    Gumbel-top-k over the DSIR log-weights — equivalent to sampling k
    docs WITHOUT replacement with probability ∝ w^(1/temperature),
    but deterministic (the Gumbel noise comes from md5(seed‖id), not
    an RNG) and engine-portable.

    temperature 1.0 = faithful importance resampling; → 0 approaches
    hard top-k by weight; larger flattens toward uniform. One bounded
    global top-k (TakeOrdered, never a full sort) on |raw| rows.
    """
    if k <= 0:
        raise ValueError(f"k must be > 0, got {k}")
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    lw = dsir_log_weights(raw_df, target_df, text_col, id_col,
                          buckets, smoothing)
    u = ((F.conv(F.substring(
            F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))),
            1, 15), 16, 10).cast("double") + 0.5) / F.lit(float(16 ** 15)))
    gumbel = -F.log(-F.log(u))
    scored = lw.withColumn(
        "__score", F.col("log_weight") / float(temperature) + gumbel)
    picked = scored.orderBy(F.desc("__score"), id_col).limit(int(k))
    return (raw_df.join(picked.select(id_col, "log_weight"), id_col)
                  .drop("__score"))


def decontamination_report(df: DataFrame, eval_df: DataFrame,
                           text_col: str = "text", id_col: str = "doc_id",
                           eval_text_col: str = "text",
                           k: int = 8) -> DataFrame:
    """Per-document contamination accounting — the threshold-tuning
    companion to ``decontaminate_ngram``'s hard drop: for every
    training doc, how many of its distinct ``k``-gram shingles appear
    anywhere in the eval set, and what fraction of the doc that is.
    Returns (id, n_shingles, n_hits, overlap_fraction rounded 6); run
    it before committing to a ``max_overlap`` cutoff, the same way
    line_dedup_summary fronts dedup_lines.

    Scale: one shingle explode (distinct per doc), one per-doc size
    agg, one inverted-index join against the DISTINCT eval shingle set
    (small → AQE broadcasts it), one per-doc hit agg, one left join
    back. Work is O(|doc shingles|); no pairwise comparison.
    """
    from .dedup import _doc_shingles, spread
    doc_sh = _doc_shingles(spread(df, id_col), text_col, id_col, k) \
        .localCheckpoint(eager=True)  # two consumers: sizes + hits
    eval_sh = (_doc_shingles(
        eval_df.select(F.monotonically_increasing_id().alias("__eid"),
                       F.col(eval_text_col)),
        eval_text_col, "__eid", k)
        .select("shingle").distinct())
    sizes = doc_sh.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_shingles"))
    hits = (doc_sh.join(eval_sh, "shingle")
            .groupBy("id").agg(F.count(F.lit(1)).alias("n_hits")))
    return (sizes.join(hits, "id", "left")
            .select(F.col("id").alias(id_col),
                    "n_shingles",
                    F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
                    F.round(F.coalesce("n_hits", F.lit(0)) /
                            F.col("n_shingles"), 6)
                     .alias("overlap_fraction")))


def source_overlap_report(df: DataFrame, source_col: str = "source",
                          text_col: str = "text", k: int = 8) -> DataFrame:
    """Pairwise cross-source content overlap — "how much of source B is
    already in source A?", the question a mix curator answers before
    weighting corpora (CC vs C4, dump N vs dump N-1): per source pair
    (source_a < source_b), distinct ``k``-gram shingle counts n_a/n_b,
    shared count n_common, ``jaccard`` and ``containment``
    (n_common / min(n_a, n_b) — the asymmetric "smaller corpus is X%
    contained" reading).  Pairs sharing nothing are omitted.

    Scale: the corpus explodes ONCE into a distinct (source, shingle)
    table (localCheckpointed — three consumers), and the pair join is
    keyed on the shingle, where a group is at most |sources| rows — so
    the join is bounded by the source count, never by how many
    DOCUMENTS repeat a shingle (a billion-doc boilerplate shingle
    still contributes ≤ |sources|² pair rows).  Per-source totals come
    back as a broadcast |sources|-row dimension.
    """
    from ..functions.security import validate_identifier
    validate_identifier(source_col)
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    sh = (df.select(F.col(source_col).alias("source"),
                    T.norm_tokens(text_col).alias("__toks"))
            .select("source",
                    F.explode(T.word_shingles_from(F.col("__toks"), k))
                     .alias("shingle"))
            .distinct()
            .localCheckpoint(eager=True))  # counts + both join sides
    counts = sh.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    pairs = (a.join(b, "shingle")
              .filter(F.col("a.source") < F.col("b.source"))
              .groupBy(F.col("a.source").alias("source_a"),
                       F.col("b.source").alias("source_b"))
              .agg(F.count(F.lit(1)).alias("n_common")))
    ca = F.broadcast(counts.select(F.col("source").alias("source_a"),
                                   F.col("n").alias("n_a")))
    cb = F.broadcast(counts.select(F.col("source").alias("source_b"),
                                   F.col("n").alias("n_b")))
    return (pairs.join(ca, "source_a").join(cb, "source_b")
                 .select("source_a", "source_b",
                         F.col("n_a").cast("bigint").alias("n_a"),
                         F.col("n_b").cast("bigint").alias("n_b"),
                         F.col("n_common").cast("bigint").alias("n_common"),
                         F.round(F.col("n_common") /
                                 (F.col("n_a") + F.col("n_b")
                                  - F.col("n_common")), 6).alias("jaccard"),
                         F.round(F.col("n_common") /
                                 F.least("n_a", "n_b"), 6)
                          .alias("containment"))
                 .orderBy(F.desc("n_common"), "source_a", "source_b"))


def source_overlap_kmv(df: DataFrame, source_col: str = "source",
                       text_col: str = "text", k: int = 8,
                       sketch_k: int = 1024) -> DataFrame:
    """The SCALE PATH of ``source_overlap_report``: estimated pairwise
    overlap from per-source KMV sketches instead of a shingle pair
    join.  With many sources the exact join touches every co-occurring
    shingle; here each source compresses to ``sketch_k`` hashes (one
    bounded window top-k job), and ALL pairwise jaccard/containment
    estimates come from driver-side sketch algebra — |sources|² work
    over k-row summaries, zero additional Spark jobs.  Distinct counts
    carry ~1/√(sketch_k−2) relative error; every pair is reported
    (including zero-overlap ones, unlike the exact report).
    """
    from ..analyzers.kmv import (kmv_distinct, kmv_merge, kmv_sketch_by,
                                 sketch_from_row)
    from ..functions.security import validate_identifier
    validate_identifier(source_col)
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    sh = (df.select(F.col(source_col).alias("source"),
                    T.norm_tokens(text_col).alias("__toks"))
            .select("source",
                    F.explode(T.word_shingles_from(F.col("__toks"), k))
                     .alias("shingle")))
    sketches = {r["grp"]: sketch_from_row(r, sketch_k) for r in
                kmv_sketch_by(sh, "source", "shingle", sketch_k).collect()}
    rows = []
    for sa in sorted(sketches):
        for sb in sorted(sketches):
            if sa >= sb:
                continue
            A, B = sketches[sa], sketches[sb]
            na, nb = kmv_distinct(A), kmv_distinct(B)
            # one union-sketch merge per pair; jaccard, union and
            # intersection all derive from it (round-8 review — the
            # estimator helpers each re-merged internally)
            u = kmv_merge([A, B])
            set_a, set_b = set(A.hashes), set(B.hashes)
            both = sum(1 for h in u.hashes if h in set_a and h in set_b)
            jac = both / len(u.hashes) if u.hashes else 0.0
            inter = jac * kmv_distinct(u)
            # containment is a ratio <= 1 by definition; the sketch
            # estimate can only exceed it through noise — clamp
            cont = min(1.0, inter / min(na, nb)) if min(na, nb) > 0 else 0.0
            rows.append((sa, sb, round(na, 1), round(nb, 1),
                         round(inter, 1), round(jac, 6), round(cont, 6)))
    return local_df(
        df.sparkSession, rows,
        "source_a string, source_b string, est_n_a double, "
              "est_n_b double, est_common double, est_jaccard double, "
              "est_containment double")


class ContaminationConstraint(Constraint):
    """``has_low_contamination``: the fraction of documents whose
    eval-set k-gram overlap exceeds ``per_doc_threshold`` must stay
    within ``max_doc_ratio`` (default 0 — a release gate: NO document
    may be contaminated). The check-level form of
    ``decontamination_report``: validate-then-ship in one suite run
    instead of a separate decontamination audit.

    Self-executing (needs the eval DataFrame) like the drift
    constraints; the job is the report's explode + two hash aggs +
    eval-index join — O(|doc shingles|), no pairwise work.
    """

    name = "low_contamination"

    def __init__(self, eval_df, text_col: str = "text",
                 id_col: str = "doc_id", k: int = 8,
                 per_doc_threshold: float = 0.1,
                 max_doc_ratio: float = 0.0):
        if not 0.0 <= per_doc_threshold <= 1.0:
            raise ValueError(
                f"per_doc_threshold must be in [0,1], got {per_doc_threshold}")
        if not 0.0 <= max_doc_ratio <= 1.0:
            raise ValueError(
                f"max_doc_ratio must be in [0,1], got {max_doc_ratio}")
        from ..functions.security import validate_identifier
        self.eval_df = eval_df
        self.text_col = validate_identifier(text_col)
        self.id_col = validate_identifier(id_col)
        self.k = int(k)
        self.per_doc_threshold = float(per_doc_threshold)
        self.max_doc_ratio = float(max_doc_ratio)

    def evaluate(self, ctx):
        from ..core.result import ConstraintResult
        cur = ctx.df(self.table)
        rep = decontamination_report(cur, self.eval_df, self.text_col,
                                     self.id_col, self.text_col, self.k)
        row = rep.agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("overlap_fraction") >
                           self.per_doc_threshold, 1)).alias("bad")).collect()[0]
        n, bad = int(row["n"]), int(row["bad"])
        if n == 0:
            return self._finish(ConstraintResult.skipped(
                "low_contamination: no documents with text"))
        ratio = bad / n
        if ratio <= self.max_doc_ratio:
            return self._finish(ConstraintResult.success(ratio))
        return self._finish(ConstraintResult.failure(
            ratio, f"low_contamination: {bad}/{n} docs exceed "
                   f"{self.per_doc_threshold:.0%} eval-set {self.k}-gram "
                   f"overlap (ratio {ratio:.4f} > max {self.max_doc_ratio})"))


def curation_pipeline(df: DataFrame, eval_df: Optional[DataFrame] = None,
                      text_col: str = "text", id_col: str = "doc_id",
                      min_words: int = 8, line_min_count: int = 5,
                      jaccard_threshold: float = 0.6,
                      decontaminate_k: int = 8,
                      budget_tokens: int = 1000,
                      budget_by: str = "source",
                      train_filter=None):
    """The composed end-to-end curation chain (round 14 — the brief's
    training-data pipeline, wired from the individually-audited
    operators):

        raw → clean_text → Gopher gate → line dedup (strip
        ``line_min_count``+-occurrence corpus lines) → exact dedup →
        near dedup (MinHash-LSH → Jaccard verify → components) →
        decontaminate vs ``eval_df`` (skipped when None) →
        token-budget sample (greedy ``budget_tokens``/``budget_by``)

    A GENERATOR of (stage_name, DataFrame), in pipeline order.  Every
    stage after raw is lazily ``localCheckpoint``-pinned, so a
    consumer that acts on each stage (per-stage accounting, per-stage
    bench timing) executes each stage's work exactly once — stage N's
    action never re-runs stages 1..N-1.  Generator rather than list
    on purpose: the near-dup stage's connected-components step runs
    driver-side convergence ACTIONS while the stage is being BUILT, so
    a pre-built list would charge that work to construction where no
    per-stage timer can see it; yielding lazily keeps each stage's
    build+execute cost inside its consumer's measurement window.

    Scale shape: each stage is its operator's already-audited plan —
    at most one wide shuffle each (line/exact/near dedup key shuffles,
    the LSH band join); clean/Gopher are map-only codegen; eval-side
    decontamination shingles broadcast.  The driver-proven composition
    row is queries_llm.q_curation_pipeline_docs; per-stage costs are
    split in bench.py."""
    yield "raw", df
    cur = (df.withColumn(text_col, T.clean_text(text_col))
           .localCheckpoint(eager=False))
    yield "clean", cur
    flags = T.gopher_quality_flags(cur, text_col=text_col, id_col=id_col,
                                   min_words=min_words)
    cur = (cur.join(flags.filter(F.col("passes"))
                    .select(F.col("id").alias(id_col)), id_col)
           .localCheckpoint(eager=False))
    yield "gopher", cur
    kept_lines, _lines = T.dedup_lines(cur, text_col, id_col,
                                       min_count=line_min_count)
    cur = (cur.drop(text_col).join(kept_lines, id_col)
           .localCheckpoint(eager=False))
    yield "line_dedup", cur
    cur = D.dedup_exact(cur, text_col, id_col).localCheckpoint(eager=False)
    yield "exact_dedup", cur
    cur = (near_dedup(cur, text_col, id_col,
                      jaccard_threshold=jaccard_threshold)
           .localCheckpoint(eager=False))
    yield "near_dedup", cur
    if eval_df is not None:
        # train_filter drops the holdout's own rows from the training
        # side (an eval doc trivially shares every shingle with
        # itself) — e.g. F.col("source") != "src0" when the holdout is
        # a source slice of the same corpus
        train = cur.filter(train_filter) if train_filter is not None else cur
        cur = (decontaminate_ngram(train, eval_df, text_col, id_col,
                                   k=decontaminate_k)
               .localCheckpoint(eager=False))
        yield "decontaminate", cur
    cur = (token_budget_sample(cur, budget_tokens, by=budget_by,
                               text_col=text_col, id_col=id_col)
           .drop("__n_tokens", "__cum_tokens")
           .localCheckpoint(eager=False))
    yield "token_budget", cur
