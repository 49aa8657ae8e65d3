"""Hybrid retrieval — reciprocal-rank fusion of lexical (BM25) and
vector (cosine ANN) rankings.

Production retrieval over a 100 TB corpus is hybrid: BM25 catches the
exact-term matches embeddings blur (codes, names, rare jargon) and the
vector side catches the paraphrases lexical match misses.  Reciprocal
Rank Fusion (Cormack, Clarke & Buettcher, SIGIR 2009) combines any
number of rankings with no score calibration — scores from different
systems are incommensurable (BM25 is unbounded, cosine lives in
[-1, 1]), so fusion uses RANKS only:

    rrf(d) = Σ_systems  w_s / (k + rank_s(d))

with the conventional k = 60; a document missing from one system's
top-N simply contributes nothing from it (the standard convention —
no imputed rank, so adding a system can only add evidence).

Scale shape: fusion is the CHEAP stage by construction — each input
ranking is already a bounded top-N per query (|queries| × N rows, the
output of index-backed retrievers: the persisted BM25 postings index
probe and the IVF/LSH ANN probes), so the union + grouped sum +
per-query bounded top-k here never touches the corpus.  The heavy
lifting stays in the upstream probes, which are the ones with
persisted incremental indexes.

Determinism contract (the driver-oracle standard): contributions are
1/(k + rank) doubles; a document appears in ≤ |systems| rankings, so
the grouped SUM adds a handful of terms — rounded to 6 decimals BEFORE
ranking, ties broken by ascending document id.

Reference relationship: beyond-reference extension — the reference
(term-guard) ships no retrieval or fusion surface.  This is part of
the LLM-data-pipeline extension layer (alongside the BM25 postings
index in operators/text.py and the ANN probes in
operators/similarity.py), composed as one union + one aggregation +
one bounded window.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

#: Cormack et al.'s constant — dampens the head so a single system's
#: #1 cannot outvote broad agreement at ranks 2-5.
DEFAULT_RRF_K = 60


def rrf_fuse(rankings: Dict[str, DataFrame], k: int = 10,
             rrf_k: int = DEFAULT_RRF_K,
             weights: Optional[Dict[str, float]] = None,
             query_col: str = "query_id", id_col: str = "doc_id",
             rank_col: str = "rank") -> DataFrame:
    """Fuse named rankings — each ``(query_col, id_col, rank_col)``
    with rank starting at 1 — into one top-``k`` per query by RRF
    score.  Returns (query_id, doc_id, rrf_score, n_systems, rank).

    ``n_systems`` is the per-document vote count — a fused hit found
    by both systems is stronger evidence than a high solo rank, and
    the column lets callers filter on agreement.

    One union of bounded inputs, one grouped sum, one per-query
    bounded window — no corpus access, no unbounded state.
    """
    if not rankings:
        raise ValueError("rrf_fuse: no rankings given")
    weights = weights or {}
    unknown = set(weights) - set(rankings)
    if unknown:
        # A typo'd system name would otherwise silently degrade to
        # unweighted fusion — fail loudly instead.
        raise ValueError(
            f"rrf_fuse: weights for unknown rankings {sorted(unknown)}; "
            f"known: {sorted(rankings)}")
    parts = []
    for name, df in rankings.items():
        w = float(weights.get(name, 1.0))
        parts.append(df.select(
            F.col(query_col).alias("query_id"),
            F.col(id_col).alias("doc_id"),
            (F.lit(w) / (F.lit(int(rrf_k))
                         + F.col(rank_col).cast("double")))
            .alias("__c")))
    unioned = parts[0]
    for p in parts[1:]:
        unioned = unioned.unionByName(p)
    fused = (unioned.groupBy("query_id", "doc_id")
             .agg(F.round(F.sum("__c"), 6).alias("rrf_score"),
                  F.count(F.lit(1)).alias("n_systems")))
    win = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("doc_id").asc())
    return (fused.withColumn("rank", F.row_number().over(win))
            .filter(F.col("rank") <= int(k)))


def hybrid_topk(docs: DataFrame, embeddings: DataFrame,
                queries: DataFrame, k: int = 10, depth: int = 20,
                rrf_k: int = DEFAULT_RRF_K,
                weights: Optional[Dict[str, float]] = None,
                text_col: str = "text", doc_id_col: str = "doc_id",
                vec_id_col: str = "vec_id", vec_col: str = "embedding",
                bm25_k1: float = 1.2, bm25_b: float = 0.75) -> DataFrame:
    """End-to-end hybrid search: BM25 top-``depth`` over ``docs`` text
    + exact-cosine top-``depth`` over ``embeddings``, RRF-fused to
    top-``k`` per query.  ``queries`` carries both forms per probe:
    (query_id, query, query_vec); embedding ids join documents on
    ``vec_id == doc_id`` (the corpus's embedding column, stored
    tall).

    This convenience form uses the brute-force retrievers for
    oracle-exact results; at corpus scale callers swap either side for
    its index-backed probe (``bm25_topk_from_index``,
    ``ivf_topk_from_index`` / ``lsh_bucket_topk``) and fuse the
    bounded outputs with :func:`rrf_fuse` — fusion is retriever
    -agnostic by design.
    """
    from .similarity import cosine_topk
    from .text import bm25_topk

    lex = bm25_topk(docs, queries.select("query_id", "query"),
                    text_col=text_col, id_col=doc_id_col, k=depth,
                    k1=bm25_k1, b=bm25_b)
    vec = cosine_topk(embeddings,
                      queries.select("query_id", "query_vec"),
                      k=depth, id_col=vec_id_col, vec_col=vec_col)
    return rrf_fuse(
        {"bm25": lex.select("query_id",
                            F.col(doc_id_col).alias("doc_id"), "rank"),
         "cosine": vec.select("query_id",
                              F.col("nbr_id").alias("doc_id"), "rank")},
        k=k, rrf_k=rrf_k, weights=weights)
