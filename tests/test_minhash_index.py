"""Persisted MinHash-LSH index: build/probe lifecycle, equivalence
with the in-memory LSH pass on the cross pairs, append-shard
soundness, and the signature Jaccard estimate's behavior on exact
copies vs novel text. md5 hashing — deterministic, no RNG."""

import pytest

from term_spark.operators.dedup import (build_minhash_index,
                                        minhash_lsh_candidates,
                                        minhash_signatures,
                                        neardup_against_index)

_CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "completely unrelated text about spark aggregation plans and shuffles"),
    (3, "another distinct document discussing parquet column pruning at scale"),
]
_BATCH = [
    # exact copy of doc 1 -> every minhash agrees
    (100, "the quick brown fox jumps over the lazy dog near the river bank"),
    # near-dup of doc 1 (one word changed)
    (101, "the quick brown fox jumps over the lazy cat near the river bank"),
    # novel
    (102, "nothing in common with anything stored in the index at all today"),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_index_lifecycle_and_estimates(spark, tmp_path):
    idx = str(tmp_path / "mhidx")
    build_minhash_index(_df(spark, _CORPUS), idx)
    out = {(r["new_id"], r["index_id"]): r for r in
           neardup_against_index(spark, idx, _df(spark, _BATCH)).collect()}

    assert (100, 1) in out
    exact = out[(100, 1)]
    assert exact["est_jaccard"] == pytest.approx(1.0)
    assert exact["n_bands_matched"] == 4
    # the near-dup must be estimated strictly below the exact copy
    if (101, 1) in out:
        assert out[(101, 1)]["est_jaccard"] < 1.0
    # the novel doc shares no bucket with anything
    assert not any(nid == 102 for nid, _ in out)


def test_probe_matches_in_memory_lsh_on_cross_pairs(spark, tmp_path):
    """Index-probe candidates == the in-memory self-join's candidates
    restricted to (batch, corpus) pairs, band count for band count —
    persisting the index changes WHERE the corpus half lives, never
    the math."""
    idx = str(tmp_path / "mhidx2")
    corpus, batch = _df(spark, _CORPUS), _df(spark, _BATCH)
    build_minhash_index(corpus, idx)
    served = {(r["new_id"], r["index_id"]): r["n_bands_matched"]
              for r in neardup_against_index(spark, idx, batch).collect()}

    both = corpus.unionByName(batch)
    corpus_ids = {i for i, _ in _CORPUS}
    batch_ids = {i for i, _ in _BATCH}
    mem = {}
    for r in minhash_lsh_candidates(both).collect():
        pair = {r["id_a"], r["id_b"]}
        b = pair & batch_ids
        c = pair & corpus_ids
        if b and c:
            mem[(b.pop(), c.pop())] = r["n_bands_matched"]
    assert served == mem


def test_append_shard(spark, tmp_path):
    """mode='append' with the same params folds a second corpus shard
    in; probes then hit documents from both shards."""
    idx = str(tmp_path / "mhidx3")
    build_minhash_index(_df(spark, _CORPUS[:1]), idx)
    build_minhash_index(_df(spark, [
        (50, "nothing in common with anything stored in the index at all today"),
    ]), idx, mode="append")
    out = {(r["new_id"], r["index_id"])
           for r in neardup_against_index(spark, idx, _df(spark, _BATCH))
           .collect()}
    assert (100, 1) in out      # shard 1
    assert (102, 50) in out     # shard 2


def test_append_is_linear_not_quadratic(spark, tmp_path):
    """Each append adds exactly bands rows per NEW document to the
    buckets table — earlier shards' bucket rows are never re-appended
    (the quadratic-growth bug: deriving the band stack from the whole
    persisted signatures table duplicates every prior shard on every
    append, inflating n_bands_matched past `bands`)."""
    idx = str(tmp_path / "mhidx_lin")
    bands = 4
    build_minhash_index(_df(spark, _CORPUS[:1]), idx)
    build_minhash_index(_df(spark, _CORPUS[1:2]), idx, mode="append")
    build_minhash_index(_df(spark, _CORPUS[2:3]), idx, mode="append")

    buckets = spark.read.parquet(f"{idx}/buckets")
    # 3 docs x 4 bands, no duplicated rows from repeated appends
    assert buckets.count() == 3 * bands
    per_doc = {r["id"]: r["n"] for r in
               buckets.groupBy("id").count().withColumnRenamed("count", "n")
               .collect()}
    assert per_doc == {1: bands, 2: bands, 3: bands}

    # probe of an exact copy: n_bands_matched == bands exactly, and the
    # three-append index behaves identically to a one-shot batch build
    out = {(r["new_id"], r["index_id"]): r["n_bands_matched"] for r in
           neardup_against_index(spark, idx, _df(spark, _BATCH)).collect()}
    assert out[(100, 1)] == bands

    batch_idx = str(tmp_path / "mhidx_batch")
    build_minhash_index(_df(spark, _CORPUS), batch_idx)
    batch_out = {(r["new_id"], r["index_id"]): r["n_bands_matched"] for r in
                 neardup_against_index(spark, batch_idx,
                                       _df(spark, _BATCH)).collect()}
    assert out == batch_out


def test_min_est_jaccard_filter(spark, tmp_path):
    idx = str(tmp_path / "mhidx4")
    build_minhash_index(_df(spark, _CORPUS), idx)
    out = neardup_against_index(spark, idx, _df(spark, _BATCH),
                                min_est_jaccard=1.0).collect()
    assert {(r["new_id"], r["index_id"]) for r in out} == {(100, 1)}


def test_signatures_shape(spark):
    sig = minhash_signatures(_df(spark, _CORPUS))
    assert sig.columns == ["id"] + [f"mh_{i}" for i in range(16)]
    assert sig.count() == 3


def test_append_param_mismatch_fails_loudly(spark, tmp_path):
    idx = str(tmp_path / "mhidx_pm")
    build_minhash_index(_df(spark, _CORPUS), idx)
    with pytest.raises(ValueError, match="pinned at build time"):
        build_minhash_index(_df(spark, _BATCH), idx, num_hashes=32,
                            bands=4, mode="append")
