"""Persisted CDC chunk index: build/probe lifecycle, equivalence with
the in-memory first-occurrence rewrite over history ∪ batch, append
soundness, pinned-param guard, and byte-for-byte no-op on novel
batches. md5 cut decisions — deterministic, no RNG."""

import pytest

from term_spark.operators.dedup import (build_cdc_index, cdc_chunks,
                                        remove_duplicate_chunks,
                                        remove_duplicate_chunks_against_index)

_BASE = ("the quick brown fox jumps over the lazy dog while the "
         "content defined chunker looks for gram boundaries in the "
         "stream and cuts wherever the rolling content hash lands on "
         "zero modulo the divisor which happens about once per "
         "divisor characters on natural text")
_NOVEL = ("completely novel material with no chunk in common with the "
          "historical corpus stream at all, discussing parquet column "
          "pruning and adaptive query execution at petabyte scale")

# history ids sort BEFORE batch ids, so the batch-build equivalence the
# operator documents holds exactly
_HISTORY = [("a1", _BASE), ("a2", _NOVEL[:80])]
_BATCH = [
    ("b1", _BASE),                                       # full re-chunk
    ("b2", _BASE[:120] + " INSERTED SPAN " + _BASE[120:]),  # partial
    ("b3", _NOVEL),                                      # mostly novel
]
DIV = 16


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def _clean_map(cleaned):
    return {r["doc_id"]: r["text"] for r in cleaned.collect()}


def test_probe_equals_batch_rewrite(spark, tmp_path):
    idx = str(tmp_path / "cdcidx")
    build_cdc_index(_df(spark, _HISTORY), idx, divisor=DIV)
    got, dropped = remove_duplicate_chunks_against_index(
        spark, idx, _df(spark, _BATCH))
    ref, _ = remove_duplicate_chunks(_df(spark, _HISTORY + _BATCH),
                                     divisor=DIV)
    ref_map = {k: v for k, v in _clean_map(ref).items()
               if k.startswith("b")}
    assert _clean_map(got) == ref_map
    # b1 is a byte-for-byte re-chunk of history -> disappears entirely
    assert "b1" not in _clean_map(got)
    assert dropped.filter("id = 'b1'").count() == \
        cdc_chunks(_df(spark, _HISTORY[:1]), divisor=DIV).count()


def test_novel_batch_is_untouched(spark, tmp_path):
    """A batch sharing nothing with history (and with no internal
    repeats) rebuilds to its exact original bytes — the cuts partition
    the text, so reassembly is the identity."""
    idx = str(tmp_path / "cdcidx_n")
    build_cdc_index(_df(spark, _HISTORY[:1]), idx, divisor=DIV)
    batch = [("b9", _NOVEL)]
    got, dropped = remove_duplicate_chunks_against_index(
        spark, idx, _df(spark, batch))
    assert _clean_map(got) == {"b9": _NOVEL}
    assert dropped.count() == 0


def test_append_equals_batch_build(spark, tmp_path):
    idx_inc = str(tmp_path / "cdcidx_i")
    build_cdc_index(_df(spark, _HISTORY[:1]), idx_inc, divisor=DIV)
    build_cdc_index(_df(spark, _HISTORY[1:]), idx_inc, divisor=DIV,
                    mode="append")
    idx_batch = str(tmp_path / "cdcidx_b")
    build_cdc_index(_df(spark, _HISTORY), idx_batch, divisor=DIV)
    batch = _df(spark, _BATCH)
    a, _ = remove_duplicate_chunks_against_index(spark, idx_inc, batch)
    b, _ = remove_duplicate_chunks_against_index(spark, idx_batch, batch)
    assert _clean_map(a) == _clean_map(b)


def test_append_param_mismatch_fails_loudly(spark, tmp_path):
    idx = str(tmp_path / "cdcidx_pm")
    build_cdc_index(_df(spark, _HISTORY), idx, divisor=DIV)
    with pytest.raises(ValueError, match="pinned at build time"):
        build_cdc_index(_df(spark, _BATCH), idx, divisor=DIV * 2,
                        mode="append")


def test_probe_reads_params_from_meta(spark, tmp_path):
    """The probe chunks with the PINNED (k, divisor) — an index built
    at divisor=16 probes at divisor=16 whatever the caller assumes."""
    idx = str(tmp_path / "cdcidx_m")
    build_cdc_index(_df(spark, _HISTORY), idx, divisor=DIV)
    got, _ = remove_duplicate_chunks_against_index(
        spark, idx, _df(spark, [("b1", _BASE)]))
    assert got.count() == 0  # exact re-chunk vanished => params matched
