"""Registry-ordering invariants for the driver's correctness gate.

The driver checks only the FIRST 50 entries of ``queries()`` against the
DuckDB oracles.  Round 8 replaced the hand-picked window with a
DATA-DRIVEN rotation (term_spark/queries.py, generated block maintained
by scripts/update_rotation.py):

* ``LAST_GREEN`` records, per query, the newest round whose
  CORRECTNESS_r{N}.json holds a green rows+schema+hash driver row;
* the window is the 50 STALEST oracle-backed queries (never-proven
  first, then oldest green, alphabetical tie-break) — so with ~2x as
  many eligible queries as slots every query re-proves at least every
  ~2 rounds and no
  operator family's newest driver-green row can age past 3 rounds;
* ``NO_ORACLE`` queries (rows-only by design) never take a window slot.

These tests pin (a) the window really is the computed one, (b) the
recorded history matches the committed artifacts, and (c) the freshness
bound holds for every family.
"""

import glob
import json
import os
import re

from term_spark.queries import (CURRENT_ROUND, DRIVER_WINDOW_SIZE, FAMILY,
                                LAST_GREEN, NO_ORACLE, ORACLES, QUERIES,
                                driver_window)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_window_is_the_computed_rotation():
    assert list(QUERIES)[:DRIVER_WINDOW_SIZE] == driver_window()


def test_rotation_data_covers_registry():
    assert set(LAST_GREEN) == set(QUERIES)
    assert set(FAMILY) == set(QUERIES)


def test_last_green_matches_committed_artifacts():
    """LAST_GREEN must equal what the CORRECTNESS artifacts of rounds
    BEFORE CURRENT_ROUND actually recorded — the r{N} rotation is a
    mechanical regeneration, not an editorial choice.  Artifacts from
    CURRENT_ROUND onward (the driver writes this round's mid-round) are
    ignored; skipped entirely outside the build checkout."""
    paths = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    if not paths:
        import pytest
        pytest.skip("no CORRECTNESS artifacts in this checkout")
    expected = {}
    newest = 0
    for path in paths:
        rnd = int(re.search(r"CORRECTNESS_r(\d+)\.json$", path).group(1))
        if rnd >= CURRENT_ROUND:
            continue
        newest = max(newest, rnd)
        with open(path) as fh:
            data = json.load(fh)
        for name, row in data.items():
            if not isinstance(row, dict) or name not in QUERIES:
                continue
            hm = row.get("hash_match")
            if (row.get("rows_match") and row.get("schema_match")
                    and (hm is True or (hm is None and name in NO_ORACLE))):
                expected[name] = max(rnd, expected.get(name) or 0)
    assert CURRENT_ROUND == newest + 1, (
        f"CURRENT_ROUND={CURRENT_ROUND} but newest prior artifact is "
        f"r{newest:02d} — run scripts/update_rotation.py --apply")
    mismatch = {q: (LAST_GREEN[q], expected.get(q)) for q in QUERIES
                if LAST_GREEN[q] != expected.get(q)}
    assert not mismatch, (
        f"LAST_GREEN stale — run scripts/update_rotation.py --apply: {mismatch}")


def test_never_proven_queries_get_priority():
    window = set(list(QUERIES)[:DRIVER_WINDOW_SIZE])
    never = {q for q in QUERIES
             if LAST_GREEN[q] is None and q not in NO_ORACLE}
    outside = never - window
    assert len(never) > DRIVER_WINDOW_SIZE or not outside, (
        f"never-driver-proven queries left outside the window: {sorted(outside)}")


def test_no_family_older_than_three_rounds():
    """After this round's driver run, every family's newest green row is
    at most 3 rounds old: either a member is in-window (proven this
    round) or a member went green within the last two rounds."""
    window = set(list(QUERIES)[:DRIVER_WINDOW_SIZE])
    stale = {}
    for fam in set(FAMILY.values()):
        members = [q for q in QUERIES if FAMILY[q] == fam]
        if all(q in NO_ORACLE for q in members):
            continue  # rows-only by design — driver-ineligible
        newest = max((LAST_GREEN[q] or 0) for q in members)
        if members and any(q in window for q in members):
            newest = CURRENT_ROUND
        if newest < CURRENT_ROUND - 2:
            stale[fam] = newest
    assert not stale, f"families aging out of the driver record: {stale}"


def test_window_is_fully_oracle_backed():
    # Every in-window query must have a DuckDB oracle so the driver records
    # a full rows+schema+hash row (not a weaker rows-only check).
    window = list(QUERIES)[:DRIVER_WINDOW_SIZE]
    unbacked = [k for k in window if k not in ORACLES]
    assert not unbacked, f"in-window queries without oracles: {unbacked}"


def test_tail_queries_still_registered():
    # Demoted ≠ dropped: tail variants stay runnable and oracle-backed
    # (except the NO_ORACLE set, rows-only by design).
    tail = list(QUERIES)[DRIVER_WINDOW_SIZE:]
    assert len(QUERIES) >= 90
    for k in tail:
        assert callable(QUERIES[k])
        if k not in NO_ORACLE:
            assert k in ORACLES, k


def test_update_rotation_script_parses_artifacts_and_advances_round(tmp_path):
    """The round-9 forcing function end-to-end in miniature: given a
    directory of CORRECTNESS artifacts, load_green_history keeps the
    NEWEST green per query (a later red does not revoke an earlier
    green, but also does not advance it), treats hash_match: null as
    green ONLY for NO_ORACLE queries (the rows-only contract — an
    oracle-backed query missing its hash must not be promoted), and
    reports the newest artifact round — so CURRENT_ROUND advances to
    newest+1."""
    import importlib.util
    import json as _json

    spec = importlib.util.spec_from_file_location(
        "update_rotation", os.path.join(REPO, "scripts", "update_rotation.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    def art(n, data):
        (tmp_path / f"CORRECTNESS_r{n:02d}.json").write_text(
            _json.dumps(data))

    g = {"rows_match": True, "schema_match": True, "hash_match": True}
    red = {"rows_match": True, "schema_match": True, "hash_match": False}
    rows_only = {"rows_match": True, "schema_match": True,
                 "hash_match": None}
    art(7, {"a": g, "b": g, "c": rows_only, "e": rows_only})
    art(8, {"a": g, "b": red, "d": g})

    greens, newest = mod.load_green_history(str(tmp_path),
                                            no_oracle=frozenset({"c"}))
    assert newest == 8
    assert greens["a"] == 8          # advanced by the new green
    assert greens["b"] == 7          # r8 red does NOT revoke the r7 green
    assert greens["c"] == 7          # rows-only counts for NO_ORACLE
    assert greens["d"] == 8
    assert "e" not in greens         # rows-only on an oracle-backed query
    #                                  is warned about, never promoted
