"""Content-defined chunking: reassembly exactness, the insertion-
resilience property fixed-size chunking lacks (the reason CDC exists),
duplicate-chunk accounting, and the registry query's oracle shape.
All chunk boundaries come from md5 — deterministic, no RNG."""

import hashlib

import pytest

from term_spark.operators.dedup import cdc_chunks, cdc_dedup_summary

# long enough that divisor=16 yields several content cuts
_BASE = ("the quick brown fox jumps over the lazy dog while the "
         "content defined chunker looks for gram boundaries in the "
         "stream and cuts wherever the rolling content hash lands on "
         "zero modulo the divisor which happens about once per "
         "divisor characters on natural text")


def _df(spark, docs):
    return spark.createDataFrame(docs, "doc_id string, text string")


def test_chunks_reassemble_exactly(spark):
    rows = (cdc_chunks(_df(spark, [("a", _BASE)]), divisor=16)
            .orderBy("chunk_idx").collect())
    assert [r["chunk_idx"] for r in rows] == list(range(len(rows)))
    assert rows[0]["start"] == 0
    # contiguous, covering, non-overlapping
    for prev, cur in zip(rows, rows[1:]):
        assert cur["start"] == prev["start"] + prev["length"]
    assert rows[-1]["start"] + rows[-1]["length"] == len(_BASE)
    # chunk_hash really is md5 of the chunk text
    for r in rows:
        piece = _BASE[r["start"]:r["start"] + r["length"]]
        assert r["chunk_hash"] == hashlib.md5(piece.encode()).hexdigest()
    assert len(rows) > 2, "divisor=16 should cut this text several times"


def test_insertion_resilience(spark):
    """THE property: inserting text mid-document must leave every
    chunk outside the edited region identical — with fixed-size
    chunking zero chunks after the edit would survive."""
    edited = _BASE[:120] + " INSERTED NOVELTY SPAN " + _BASE[120:]
    rows = (cdc_chunks(_df(spark, [("orig", _BASE), ("edit", edited)]),
                       divisor=16)
            .collect())
    orig = {r["chunk_hash"] for r in rows if r["id"] == "orig"}
    edit = {r["chunk_hash"] for r in rows if r["id"] == "edit"}
    shared = orig & edit
    # everything before the edit and past the next boundary realigns
    assert len(shared) >= len(orig) - 3, (
        f"only {len(shared)}/{len(orig)} chunks survived an insertion")


def test_short_and_empty_docs(spark):
    df = _df(spark, [("tiny", "abc"), ("empty", ""), ("gone", None)])
    rows = cdc_chunks(df).collect()
    assert len(rows) == 1  # whole-doc chunk for the short one only
    assert rows[0]["id"] == "tiny" and rows[0]["length"] == 3


def test_validates_args(spark):
    df = _df(spark, [("a", "x")])
    with pytest.raises(ValueError):
        cdc_chunks(df, k=1)
    with pytest.raises(ValueError):
        cdc_chunks(df, divisor=1)


def test_dedup_summary_counts_duplicates(spark):
    """Two identical docs: every chunk duplicated once — dedup factor
    2x; one unique doc pulls it back under 2."""
    df = _df(spark, [("a", _BASE), ("b", _BASE)])
    row = cdc_dedup_summary(df, divisor=16).collect()[0]
    assert row["n_chunks"] == 2 * row["n_distinct_chunks"]
    assert row["chars_total"] == 2 * row["chars_distinct"]
    assert row["dedup_factor"] == pytest.approx(2.0)
    assert row["dup_chunk_ratio"] == pytest.approx(0.5)

    row = cdc_dedup_summary(
        _df(spark, [("a", _BASE), ("b", _BASE),
                    ("c", "completely different content here")]),
        divisor=16).collect()[0]
    assert 1.0 < row["dedup_factor"] < 2.0


def test_registry_query_shape(spark):
    from term_spark.queries import ORACLES, QUERIES
    import tests.conftest as C

    assert "cdc_dedup_docs" in ORACLES
    row = QUERIES["cdc_dedup_docs"](spark, C.SF_DIR).collect()[0]
    assert row["n_chunks"] >= row["n_distinct_chunks"] > 0
    assert row["chars_total"] >= row["chars_distinct"] > 0
    assert row["dedup_factor"] >= 1.0


def test_remove_duplicate_chunks_rewrite(spark):
    """The rewrite tier: first occurrence (by (id, chunk_idx)) keeps
    the canonical copy; later occurrences drop; untouched documents
    rebuild byte-for-byte; a document that is entirely a re-chunk of
    earlier content disappears."""
    from term_spark.operators.dedup import remove_duplicate_chunks

    docs = [("a", _BASE),
            ("b", _BASE),                       # exact re-chunk of a
            ("c", "totally novel content that shares no chunk with "
                  "the base document stream at all")]
    cleaned, dropped = remove_duplicate_chunks(_df(spark, docs),
                                               divisor=16)
    out = {r["doc_id"]: r["text"] for r in cleaned.collect()}
    # a keeps its exact original bytes; c is untouched; b vanishes
    assert out["a"] == _BASE
    assert out["c"] == docs[2][1]
    assert "b" not in out
    # every dropped instance belongs to b and mirrors a's chunk set
    d = dropped.collect()
    assert d and all(r["id"] == "b" for r in d)
    n_chunks_a = cdc_chunks(_df(spark, docs[:1]), divisor=16).count()
    assert len(d) == n_chunks_a


def test_remove_duplicate_chunks_partial_overlap(spark):
    """A document sharing SOME chunks keeps its novel ones: the
    rebuilt text is exactly the concatenation of its kept chunks in
    order (verified against a pure-Python replay of the election)."""
    from term_spark.operators.dedup import remove_duplicate_chunks

    edited = _BASE[:120] + " INSERTED NOVELTY SPAN " + _BASE[120:]
    docs = [("a_orig", _BASE), ("b_edit", edited)]
    cleaned, dropped = remove_duplicate_chunks(_df(spark, docs),
                                               divisor=16)
    out = {r["doc_id"]: r["text"] for r in cleaned.collect()}
    assert out["a_orig"] == _BASE

    # python replay: chunk both docs, elect first occurrence in
    # (id, chunk_idx) order ("a_orig" < "b_edit", so the original
    # wins all shared chunks), rebuild the edit from kept chunks
    rows = sorted(
        cdc_chunks(_df(spark, docs), divisor=16).collect(),
        key=lambda r: (r["id"], r["chunk_idx"]))
    seen, keep = set(), []
    for r in rows:
        if r["chunk_hash"] not in seen:
            seen.add(r["chunk_hash"])
            keep.append(r)
    texts = {"a_orig": _BASE, "b_edit": edited}
    expect_edit = "".join(
        texts[r["id"]][r["start"]:r["start"] + r["length"]]
        for r in keep if r["id"] == "b_edit")
    assert out.get("b_edit", "") == expect_edit
    assert dropped.filter("id = 'b_edit'").count() > 0
