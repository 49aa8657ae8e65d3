"""Docs-vs-code drift pins (round 12): numbers README quotes about the
registry must be generated from the registry, not hand-maintained."""

import re
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_readme_registry_count_matches_len_queries():
    from term_spark.queries import QUERIES
    readme = open(os.path.join(REPO, "README.md")).read()
    m = re.search(r"every `queries\(\)` entry \((\d+) as of", readme)
    assert m, "README must state the registry count in the pinned phrase"
    assert int(m.group(1)) == len(QUERIES), (
        f"README says {m.group(1)} queries; registry has {len(QUERIES)} — "
        "update README.md's count")


def test_every_query_has_an_oracle_or_is_declared_no_oracle():
    from term_spark.queries import NO_ORACLE, ORACLES, QUERIES
    missing = set(QUERIES) - set(ORACLES) - set(NO_ORACLE)
    assert not missing, f"queries without oracle or NO_ORACLE entry: {missing}"
